package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR) — pick raw-corpus
  * documents that LOOK LIKE a trusted target corpus (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling").
  * Beyond-reference training-data op: where [[Sampling]] selects by
  * intrinsic quality or caller-fixed quotas, DSIR selects by
  * DISTRIBUTIONAL similarity to a target — the standard move for
  * "find the Wikipedia-like 1% of the crawl".
  *
  * Model, following the paper: a document is a bag of hashed n-gram
  * features (word unigrams + bigrams hashed into `buckets` buckets);
  * target and raw corpora each induce an add-one-smoothed categorical
  * distribution over buckets; a document's importance weight compares
  * its features under the two distributions; selection keeps the
  * highest-weight documents (or accepts proportionally to weight).
  *
  * Log-free surrogate, same move as [[LmScore]]: the paper's weight is
  * log w = Σ_b c_b·(log p_b − log q_b), but `ln` differs in the last
  * ulp across libm implementations and would break value-level
  * oracles. Each bucket instead gets the QUANTIZED LIKELIHOOD RATIO
  *
  *   s_b = ⌊Q · (tc_b + 1)(R + B) / ((rc_b + 1)(T + B))⌋
  *
  * (tc/rc per-bucket target/raw counts, T/R their totals, B the
  * bucket count — i.e. Q · p̂_b / q̂_b under add-one smoothing), and a
  * document scores the SUM of its features' ratios — an arithmetic-
  * mean-of-ratios importance weight instead of the product. ALL-
  * INTEGER arithmetic: the per-document sum is order-independent
  * across engines and partitionings, so every output hash-checks.
  * Products route through DECIMAL(38,0): Q·(tc+1)·(R+B) ≤ 1e6 · 1e12
  * · 1e13 = 1e31 at a trillion-feature corpus, far inside 38 digits,
  * where a Long would wrap at 9.2e18.
  *
  * Shape at 100 TB: the feature space is B buckets BY CONSTRUCTION,
  * so the two count aggregations are map-side-combined shuffles of at
  * most tasks×B rows (the corpus never travels), the score table is
  * exactly B rows (broadcastable regardless of corpus size), and
  * scoring is one broadcast join plus a per-document aggregation. No
  * collect, no cartesian, no corpus-sized state.
  */
object Dsir {

  /** Strict word bigrams of an already-tokenized word array (empty
    * for <2 words — no whole-document collapse: a feature must never
    * double-count a unigram).
    */
  def bigrams(ws: Column): Column =
    when(size(ws) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ws) - 1),
        i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1))))

  /** Hashed feature buckets over a BOUND word-array column: unigrams
    * ++ bigrams, each hashed by codegen'd `xxhash64` (seed 42) into
    * [0, buckets) via pmod. `ws` MUST be a projected attribute, not
    * an inline `words(text)` expression: Catalyst does not CSE
    * subtrees inside lambda bodies, so an inline word-split would be
    * re-evaluated by EVERY `element_at` of every bigram — O(words²)
    * per document, measured 6.6 s vs 0.45 s on the sf0.1 corpus for
    * the identical logical result. the private `explodedBuckets` helper
    * does the binding for every consumer in this object.
    *
    * xxhash64, not the md5-prefix scheme: DSIR hashes EVERY gram of
    * EVERY document on both the count pass and the scoring pass, and
    * md5's digest + hex + base-conversion chain costs several seconds
    * per sf0.1 pass where the long-native hash is noise. The oracle
    * replays xxhash64 value-exactly over DISTINCT grams via
    * [[graft.oracle.PortableHashSql.wordHashCtes]] (seed 42), the
    * same machinery the production minhash oracles use. Hashing twice
    * (count pass + scoring pass) is DELIBERATE: the alternative —
    * materializing per-doc bucket counts between the passes — is
    * ~docs×min(features,B) rows, LARGER than the corpus text itself
    * at B ≥ 64, so stateless recompute with a cheap hash beats
    * materialize at any scale.
    */
  def featuresOfWords(ws: Column, buckets: Int): Column = {
    require(buckets >= 2 && buckets <= (1 << 20), s"buckets must be in [2, 2^20], got $buckets")
    transform(concat(ws, bigrams(ws)), g => pmod(xxhash64(g), lit(buckets.toLong)))
  }

  /** `df` + an exploded feature-bucket column `__b`, with the word
    * array bound to an attribute between the split and the gram
    * lambdas (see [[featuresOfWords]] for why that binding is
    * load-bearing). `keep` columns survive alongside `__b`.
    */
  private def explodedBuckets(df: DataFrame, textCol: String, buckets: Int,
                              keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+ TextAnalysis.words(col(textCol)).as("__ws"): _*)
      .select(keep.map(col) :+ explode(featuresOfWords(col("__ws"), buckets)).as("__b"): _*)

  /** Convenience form over raw text — fine for one-off row-level use;
    * hot paths bind the word array first and use
    * [[featuresOfWords]] (see the scaladoc there).
    */
  def featureBuckets(text: Column, buckets: Int): Column =
    featuresOfWords(TextAnalysis.words(text), buckets)

  /** The B-row bucket score table: (bucket, tc, rc, s) with s the
    * quantized smoothed target/raw likelihood ratio. Two corpus scans
    * (target is small by definition; raw is the big one), each
    * collapsing map-side to ≤ B partial rows before its shuffle; the
    * spine join and total sums run over the bounded B-row table (the
    * unpartitioned window is safe there, same as
    * [[Sampling.temperatureMixture]]'s quota derivation).
    */
  def bucketScores(target: DataFrame, targetText: String,
                   raw: DataFrame, rawText: String,
                   buckets: Int, quantScale: Long = 1000000L): DataFrame = {
    require(quantScale >= 1L, "quantScale must be positive")
    def counts(df: DataFrame, textCol: String, as: String): DataFrame =
      explodedBuckets(df, textCol, buckets, keep = Seq.empty)
        .groupBy(col("__b")).agg(count(lit(1)).as(as))
    val tc = counts(target, targetText, "tc")
    val rc = counts(raw, rawText, "rc")
    val spine = target.sparkSession.range(buckets).select(col("id").as("bucket"))
    val joined = spine
      .join(tc, col("bucket") === tc("__b"), "left").drop("__b")
      .join(rc, col("bucket") === rc("__b"), "left").drop("__b")
      .select(col("bucket"),
        coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("rc"), lit(0L)).as("rc"))
    val w = Window.partitionBy()
    joined
      .withColumn("__t", sum(col("tc")).over(w))
      .withColumn("__r", sum(col("rc")).over(w))
      .withColumn("s", expr(
        s"CAST((CAST(${quantScale}L AS DECIMAL(38,0)) * (tc + 1L) * (__r + ${buckets}L)) " +
          s"div (CAST(rc + 1L AS DECIMAL(38,0)) * (__t + ${buckets}L)) AS BIGINT)"))
      .select(col("bucket"), col("tc"), col("rc"), col("s"))
  }

  /** Score `docs(idCol, textCol)` against a [[bucketScores]] table:
    * (id, n_feat, dsir_q, dsir_mean) — `dsir_q` the integer sum of
    * feature ratios, `dsir_mean` = dsir_q / n_feat / Q as one fixed-
    * parenthesization double chain (mean likelihood ratio; > 1.0 ⇒
    * more target-like than raw-like). Documents with no words produce
    * no rows (zero feature evidence — route them to a length gate).
    * The score join broadcasts: `scores` is B rows by construction.
    * `buckets` must equal the count the score table was built with —
    * a larger modulus would hash features past the spine and the
    * inner join would silently drop them (DsirSpec locks n_feat to
    * the exact word+bigram count to catch exactly that).
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                scores: DataFrame, buckets: Int,
                quantScale: Long = 1000000L): DataFrame = {
    explodedBuckets(docs, textCol, buckets, keep = Seq(idCol))
      .join(broadcast(scores.select(col("bucket"), col("s"))), col("__b") === col("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feat"), sum(col("s")).as("dsir_q"))
      .withColumn("dsir_mean",
        col("dsir_q").cast("double") / col("n_feat").cast("double") / lit(quantScale.toDouble))
  }

  /** Deterministic resampling: the k most target-like documents by
    * mean ratio, ties broken by id. Plans as TakeOrderedAndProject —
    * a per-partition top-k merge, never a global sort.
    */
  def resampleTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("dsir_mean").desc, col(idCol)).limit(k)

  /** Acceptance resampling: keep a document with probability
    * proportional to its weight (u < w_i / w_max — rejection sampling
    * of the importance distribution), with `u` the deterministic
    * [[Sampling.uniform01]] hash so reruns keep the same set. One
    * 1-row max aggregate broadcast into a narrow filter.
    */
  def acceptByImportance(scored: DataFrame, idCol: String, salt: String = "dsir"): DataFrame = {
    val wmax = scored.agg(max(col("dsir_mean")).as("__wmax"))
    scored.join(broadcast(wmax))
      .filter(Sampling.uniform01(col(idCol), salt) < col("dsir_mean") / col("__wmax"))
      .drop("__wmax")
  }
}
