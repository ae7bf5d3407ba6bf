package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear-model text classification via the hashing trick (the
  * Vowpal-Wabbit / fastText-style quality classifier of web-corpus
  * pipelines): each token hashes into one of `dim` weight buckets and
  * the document score is the sum of its tokens' bucket weights.
  *
  * Inference is a PURE Column fold — `transform` + `aggregate` over
  * the word array with an `element_at` into a literal weight vector —
  * so scoring shuffles nothing, joins nothing, and stays inside
  * whole-stage codegen: the classic shape for running a quality gate
  * over 100 TB as part of the scan. The weight vector ships as a plan
  * literal (a real hashed model is `dim` ~ 2^18-2^22 longs — megabytes,
  * fine in a task binary; beyond that, broadcast-join the bucket table
  * instead).
  *
  * Portability contract (same as [[Sampling]]): the feature hash is the
  * md5-prefix hex — any engine can recompute buckets, so scores are
  * engine-exact INTEGERS, never IEEE sums.
  */
object Classifier {

  /** Deterministic synthetic weight vector (fixture stand-in for a
    * trained model): splitmix-style mix of the bucket index → small
    * ints in [-8, 8). Reproducible anywhere from (dim, seed).
    */
  def syntheticWeights(dim: Int, seed: Long = 42L): Seq[Long] =
    (0 until dim).map { i =>
      var x = seed + i.toLong * 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      Math.floorMod((x ^ (x >>> 31)) >>> 11, 16L) - 8L
    }

  /** Token → weight bucket in [0, dim): first 8 md5 hex chars of
    * "salt|token" as a 32-bit int, mod dim.
    */
  def featureBucket(term: Column, dim: Int, salt: String): Column =
    conv(substring(md5(concat_ws("|", lit(salt), term)), 1, 8), 16, 10)
      .cast("bigint") % dim

  /** Σ weights[bucket(token)] over a word array — zero-shuffle scoring. */
  def hashedLinearScore(words: Column, weights: Seq[Long], salt: String): Column = {
    val warr = typedlit(weights)
    aggregate(
      transform(words,
        w => element_at(warr, (featureBucket(w, weights.size, salt) + 1).cast("int"))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Score + thresholded label per document. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                weights: Seq[Long], salt: String, threshold: Long = 0L): DataFrame = {
    val ws = TextAnalysis.words(coalesce(col(textCol), lit("")))
    docs.select(col(idCol),
      size(ws).cast("long").as("n_tokens"),
      hashedLinearScore(ws, weights, salt).as("score"))
      .withColumn("keep", col("score") > threshold)
  }

  /** DuckDB twin of [[scoreDocs]] (fixture generator renders the same
    * weight vector into a list literal): exact integer replay of the
    * bucket hash and the fold.
    */
  def scoreDocsSql(weights: Seq[Long], salt: String, threshold: Long): String = {
    val warr = weights.mkString("[", ", ", "]")
    val d = weights.size
    s"""WITH w AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), x -> x <> '') AS words
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(words) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(list_sum(list_apply(words,
       |    t -> $warr[CAST(('0x' || substr(md5('$salt' || '|' || t), 1, 8)) AS BIGINT) % $d + 1])), 0) AS BIGINT) AS score,
       |  CAST(coalesce(list_sum(list_apply(words,
       |    t -> $warr[CAST(('0x' || substr(md5('$salt' || '|' || t), 1, 8)) AS BIGINT) % $d + 1])), 0) > $threshold AS BOOLEAN) AS keep
       |FROM w
       |ORDER BY doc_id""".stripMargin
  }
}
