package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

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

  /** TRAINING the weight vector in-engine: hashed-feature logistic
    * regression with an integer-quantized hard sigmoid and a fixed
    * iteration count — the [[GraphRank]] discipline applied to SGD, so
    * any engine and any partitioning computes the identical weight
    * vector and a value-level oracle can replay every iteration.
    * (The reference's quality gate trains/validates a predictions
    * model over labeled visits — `src/predictions.py:79-127`,
    * `Notebooks/test_for_samy.ipynb`; this is that loop re-expressed
    * as a deterministic distributed trainer for the corpus-quality
    * classifier above.)
    *
    * The model: p(y=1|d) ≈ σ̂(margin/S) with margin = Σ_tokens
    * w[bucket(t)] and σ̂ the HARD sigmoid (Courbariaux 2015's
    * quantized-training nonlinearity): σ̂(x) = clamp(x/4 + 1/2, 0, 1),
    * held on an integer grid of `q` levels:
    *   sq(m)  = clamp(q/2 + floor(m·q / (4·S)), 0, q)
    *   err_d  = sq(margin_d) − y_d·q                 ∈ [−q, q]
    *   grad_b = Σ_d err_d · count_d(b)               (exact long)
    *   w'_b   = w_b − floorDiv(grad_b, n·gDiv)       (batch step)
    * Every quantity is a long on an exact grid — no IEEE anywhere, so
    * iteration T is bit-reproducible and the oracle unrolls the SAME
    * T iterations as chained CTEs (the [[Bpe.oracleSql]] pattern).
    *
    * Shape at scale: the token→bucket arrays materialize ONCE; each
    * iteration is one scan of that table — a codegen'd fold for the
    * margin (weights ride along as a plan literal), then
    * explode→groupBy(bucket) for the gradient, whose map-side partial
    * aggregation means each task ships ≤ dim rows — the classic
    * treeAggregate shape of distributed SGD. Driver traffic per
    * iteration is the dim-row gradient, nothing else. Literal-array
    * weights are fine to ~2^16 buckets; a 2^20+ model should
    * broadcast-join a bucket table instead.
    */
  def train(docs: DataFrame, textCol: String, label: Column, dim: Int, salt: String,
            iters: Int, q: Long = 4096L, marginScale: Long = 4096L,
            gDiv: Long = 8L): Seq[Long] =
    trainWithFeatures(docs, textCol, label, dim, salt, iters, q, marginScale, gDiv)._1

  /** [[train]] plus the materialized per-doc feature frame
    * (y LONG, bks ARRAY<INT> — one bucket entry per token occurrence)
    * it trained on. For callers that re-SCORE the same corpus with the
    * learned weights (the resubstitution eval), scoring as a margin
    * fold over `bks` reads the already-materialized blocks — the
    * separate re-scan, re-tokenize and per-token md5 re-hash of the
    * corpus that `hashedLinearScore` over the raw text pays is gone
    * (r13 OPT, guide §1.2/§2.4: don't recompute what a pass already
    * produced). The fold `Σ weights[bks[j]]` is definitionally the
    * same sum as `hashedLinearScore(words(text))` — `bks` IS
    * `bucket(token)+1` per token, in token order.
    */
  def trainWithFeatures(docs: DataFrame, textCol: String, label: Column, dim: Int,
                        salt: String, iters: Int, q: Long = 4096L,
                        marginScale: Long = 4096L,
                        gDiv: Long = 8L): (Seq[Long], DataFrame) = {
    validateHyper(dim, iters, q, marginScale, gDiv)
    val ws = TextAnalysis.words(coalesce(col(textCol), lit("")))
    // One materialized pass: per-doc label + token bucket array (one
    // entry per token occurrence — counts stay implicit in the explode).
    val feat = graft.util.Materialize.once(docs.select(
      label.cast("long").as("y"),
      transform(ws, w => (featureBucket(w, dim, salt) + 1).cast("int")).as("bks")))
    val n = feat.count().max(1L)
    val lrDen = n * gDiv
    // floor(m·q / 4S) as an arithmetic shift: q and 4S are powers of
    // two, and >> IS floor division by 2^k on longs — no IEEE, no
    // trunc-toward-zero drift on negative margins.
    val shift = java.lang.Long.numberOfTrailingZeros(4 * marginScale) -
      java.lang.Long.numberOfTrailingZeros(q)
    val w = Array.fill(dim)(0L)
    for (_ <- 1 to iters) {
      val wlit = typedlit(w.toSeq)
      val margin = aggregate(col("bks"), lit(0L), (acc, b) => acc + element_at(wlit, b))
      val sq =
        if (shift >= 0) greatest(lit(0L), least(lit(q), lit(q / 2) + shiftright(margin, shift)))
        else greatest(lit(0L), least(lit(q), lit(q / 2) + shiftleft(margin, -shift)))
      val grads = feat
        .select((sq - col("y") * lit(q)).as("err"), col("bks"))
        .select(col("err"), explode(col("bks")).as("b1"))
        .groupBy(col("b1")).agg(sum(col("err")).as("g"))
        .collect()
      grads.foreach { r =>
        // A bucket whose every contributing doc has a NULL label sums
        // to a NULL gradient: no update — the same coalesce-to-0 the
        // oracle SQL applies to g.g, instead of a driver NPE.
        if (!r.isNullAt(1)) {
          val b = r.getInt(0) - 1
          w(b) = w(b) - Math.floorDiv(r.getLong(1), lrDen)
        }
      }
    }
    (w.toSeq, feat)
  }

  /** The learned-weight margin fold over a [[trainWithFeatures]]
    * feature row: `Σ weights[b]` over the `bks` bucket array —
    * token-for-token the score `hashedLinearScore` computes from the
    * raw text, without re-tokenizing or re-hashing it.
    */
  def scoreFromBuckets(bks: Column, weights: Seq[Long]): Column = {
    val wlit = typedlit(weights)
    aggregate(bks, lit(0L), (acc, b) => acc + element_at(wlit, b))
  }

  /** The trained vector as a (bucket, weight) table (driver-side `dim`
    * rows — the model IS small; the data pass was the distributed part).
    */
  def weightsDf(spark: SparkSession, weights: Seq[Long]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        weights.zipWithIndex.map { case (w, b) => Row(b, w) }, 1),
      StructType(Seq(
        StructField("bucket", IntegerType, nullable = false),
        StructField("weight", LongType, nullable = false))))

  /** DuckDB oracle for [[train]]: the SAME `iters` iterations unrolled
    * as chained CTEs — per step a margin aggregate over the token
    * table, the identical integer hard sigmoid (floor division spelled
    * as the explicit floor formula, since engine-side it is an
    * arithmetic shift), a bucket-grouped gradient, and the identical
    * floorDiv weight step. `docsSql` must yield (doc_id, text, y).
    */
  def trainOracleSql(docsSql: String, dim: Int, salt: String, iters: Int,
                     q: Long = 4096L, marginScale: Long = 4096L,
                     gDiv: Long = 8L): String =
    s"""WITH ${trainCtes(docsSql, dim, salt, iters, q, marginScale, gDiv)}
       |SELECT CAST(b AS INT) AS bucket, w AS weight FROM w$iters ORDER BY bucket""".stripMargin

  /** Train-then-gate oracle: the [[trainOracleSql]] chain, then the
    * [[scoreDocs]] replay of the CORPUS (un-marked `documents`) joined
    * against the LEARNED weight table w{iters} instead of a rendered
    * literal — the full quality-gate loop in one SQL statement.
    */
  def trainGateOracleSql(docsSql: String, dim: Int, salt: String, iters: Int,
                         q: Long = 4096L, marginScale: Long = 4096L,
                         gDiv: Long = 8L, threshold: Long = 0L): String =
    s"""WITH ${trainCtes(docsSql, dim, salt, iters, q, marginScale, gDiv)},
       |sdocs AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), x -> x <> '') AS words
       |  FROM documents),
       |sb AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(md5('$salt' || '|' || t), 1, 8)) AS BIGINT) % $dim AS b
       |  FROM sdocs, unnest(words) AS u(t)),
       |ssum AS MATERIALIZED (
       |  SELECT sb.doc_id, CAST(sum(w.w) AS BIGINT) AS score
       |  FROM sb JOIN w$iters w USING (b) GROUP BY sb.doc_id)
       |SELECT d.doc_id,
       |  CAST(len(d.words) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(s.score, 0) AS BIGINT) AS score,
       |  coalesce(s.score, 0) > $threshold AS keep
       |FROM sdocs d LEFT JOIN ssum s USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Shared hyperparameter domain for [[train]] and the oracle
    * renderers. The 2^60 caps keep `4 * marginScale` (engine shift
    * base AND an interpolated oracle divisor) inside a positive long:
    * above them the product wraps, the engine's shift path and the
    * oracle's floor-mod division silently disagree, and at 2^62 the
    * rendered divisor is literally 0.
    */
  private def validateHyper(dim: Int, iters: Int, q: Long, marginScale: Long,
                            gDiv: Long): Unit = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    require(q >= 2 && q <= (1L << 60) && (q & (q - 1)) == 0,
      s"q must be a power of two in [2, 2^60], got $q")
    require(marginScale >= 1 && marginScale <= (1L << 60) &&
      (marginScale & (marginScale - 1)) == 0,
      s"marginScale must be a power of two in [1, 2^60], got $marginScale")
    require(gDiv >= 1, s"gDiv must be positive, got $gDiv")
  }

  private def trainCtes(docsSql: String, dim: Int, salt: String, iters: Int,
                        q: Long, marginScale: Long, gDiv: Long): String = {
    validateHyper(dim, iters, q, marginScale, gDiv)
    def fdiv(a: String, b: String): String =
      s"((($a) - (((($a) % ($b)) + ($b)) % ($b))) // ($b))"
    val stage = (1 to iters).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT f.doc, f.y, CAST(coalesce(sum(w.w), 0) AS BIGINT) AS margin
         |  FROM feat f JOIN w${i - 1} w USING (b) GROUP BY f.doc, f.y),
         |e$i AS MATERIALIZED (
         |  SELECT doc,
         |    GREATEST(0, LEAST($q, ${q / 2} + ${fdiv(s"margin * $q", s"${4 * marginScale}")})) - y * $q AS err
         |  FROM m$i),
         |g$i AS MATERIALIZED (
         |  SELECT f.b, CAST(sum(e.err) AS BIGINT) AS g
         |  FROM feat f JOIN e$i e USING (doc) GROUP BY f.b),
         |w$i AS MATERIALIZED (
         |  SELECT w.b, CAST(w.w - ${fdiv("coalesce(g.g, 0)", s"(SELECT n FROM nn) * $gDiv")} AS BIGINT) AS w
         |  FROM w${i - 1} w LEFT JOIN g$i g USING (b))""".stripMargin
    }
    s"""tdocs AS MATERIALIZED (
       |  $docsSql),
       |feat AS MATERIALIZED (
       |  SELECT doc_id AS doc, y,
       |    CAST(('0x' || substr(md5('$salt' || '|' || t), 1, 8)) AS BIGINT) % $dim AS b
       |  FROM tdocs, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS u(t)),
       |nn AS (SELECT greatest(count(*), 1) AS n FROM tdocs),
       |w0 AS (SELECT CAST(unnest(range(0, $dim)) AS BIGINT) AS b, CAST(0 AS BIGINT) AS w),
       |${stage.mkString(",\n")}""".stripMargin
  }

  /** The [[hashedLinearScore]] replay as one DuckDB expression over a
    * word-list column — shared by [[scoreDocsSql]] and the eval
    * oracles so the scoring replay exists in exactly one rendering.
    */
  def scoreExprSql(weights: Seq[Long], salt: String, wordsExpr: String = "words"): String = {
    val warr = weights.mkString("[", ", ", "]")
    val d = weights.size
    s"CAST(coalesce(list_sum(list_apply($wordsExpr, " +
      s"t -> $warr[CAST(('0x' || substr(md5('$salt' || '|' || t), 1, 8)) AS BIGINT) % $d + 1])), 0) AS BIGINT)"
  }

  /** DuckDB twin of [[scoreDocs]] (fixture generator renders the same
    * weight vector into a list literal): exact integer replay of the
    * bucket hash and the fold.
    */
  def scoreDocsSql(weights: Seq[Long], salt: String, threshold: Long): String = {
    val score = scoreExprSql(weights, salt)
    s"""WITH w AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), x -> x <> '') AS words
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(words) AS BIGINT) AS n_tokens,
       |  $score AS score,
       |  CAST($score > $threshold AS BOOLEAN) AS keep
       |FROM w
       |ORDER BY doc_id""".stripMargin
  }

  /** Train-then-EVALUATE oracle: the [[trainOracleSql]] chain, the
    * learned-weight scoring of the SAME labeled corpus (tdocs — the
    * resubstitution check the reference notebook runs), then
    * [[graft.ops.Eval.binaryEvalTailSql]]'s confusion + exact-rational
    * AUC verdict — the whole train→score→evaluate loop as one
    * hash-compared statement.
    */
  def trainEvalOracleSql(docsSql: String, dim: Int, salt: String, iters: Int,
                         q: Long = 4096L, marginScale: Long = 4096L,
                         gDiv: Long = 8L, threshold: Long = 0L): String =
    trainEvalHoldoutOracleSql(docsSql, "SELECT doc_id, y, text FROM tdocs",
      dim, salt, iters, q, marginScale, gDiv, threshold)

  /** [[trainEvalOracleSql]] with a SEPARATE evaluation corpus — the
    * leakage-safe form: train on `trainDocsSql`, score and judge
    * `evalDocsSql` (both must yield (doc_id, text, y); the eval side
    * may reference `tdocs` to reuse the training chain's input).
    */
  def trainEvalHoldoutOracleSql(trainDocsSql: String, evalDocsSql: String,
                                dim: Int, salt: String, iters: Int,
                                q: Long = 4096L, marginScale: Long = 4096L,
                                gDiv: Long = 8L, threshold: Long = 0L): String =
    s"""WITH ${trainCtes(trainDocsSql, dim, salt, iters, q, marginScale, gDiv)},
       |edocs AS MATERIALIZED (
       |  $evalDocsSql),
       |sw AS MATERIALIZED (
       |  SELECT doc_id, y,
       |    list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), x -> x <> '') AS words
       |  FROM edocs),
       |sb AS MATERIALIZED (
       |  SELECT sw.doc_id,
       |    CAST(('0x' || substr(md5('$salt' || '|' || t), 1, 8)) AS BIGINT) % $dim AS b
       |  FROM sw, unnest(words) AS u(t)),
       |ssum AS MATERIALIZED (
       |  SELECT sb.doc_id, CAST(sum(w.w) AS BIGINT) AS score
       |  FROM sb JOIN w$iters w USING (b) GROUP BY sb.doc_id),
       |evald AS (
       |  SELECT CAST(coalesce(s.score, 0) AS BIGINT) AS score, d.y
       |  FROM sw d LEFT JOIN ssum s USING (doc_id))${graft.ops.Eval.binaryEvalTailSql("evald", threshold)}""".stripMargin
}
