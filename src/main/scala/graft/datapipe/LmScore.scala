package graft.datapipe

import graft.ops.Joins
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-trigram language-model quality scoring — the CCNet-style
  * "perplexity filter" (Wenzek et al. 2020, "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data"): train n-gram
  * statistics on a reference corpus, score every candidate document by
  * how well the model predicts it, and keep the well-predicted (i.e.
  * natural-language-like) tail. Beyond-reference training-data op —
  * the reference's quality gates are length/ratio heuristics only.
  *
  * Model: add-one-smoothed trigram conditionals over lowercased
  * characters, P(c₃ | c₁c₂) = (cnt₃(c₁c₂c₃) + 1) / (cnt₂(c₁c₂) + A)
  * with A = reference alphabet size. The document score is the MEAN
  * conditional probability (arithmetic, not geometric): a log-free
  * likelihood surrogate in the same spirit as the idf surrogate in
  * [[Keywords]] — `ln` differs in the last ulp across libm
  * implementations and would break value-level oracles, while the
  * mean-probability ranking separates natural text from noise just as
  * the perplexity ranking does (both are monotone aggregates of the
  * same per-trigram conditionals).
  *
  * Bit-reproducibility: each trigram's conditional is quantized to the
  * integer `(Q · (cnt₃ + 1)) div (cnt₂ + A)` — ALL-INTEGER arithmetic,
  * so the per-document SUM is order-independent across engines and
  * partitionings and the result is exactly hashable. `cnt₃ ≤ cnt₂`
  * always (every trigram occurrence contains its prefix-bigram
  * occurrence), so the quotient is ≤ Q; the product `Q · (cnt₃ + 1)`
  * must stay under 2⁶³ — Q = 10⁹ supports reference corpora up to
  * ~9·10⁹ trigram occurrences, and CCNet-style usage trains on a
  * bounded curated reference (Wikipedia-sized), not the full crawl, so
  * the bound is structural, not a scale ceiling.
  *
  * Shape at 100 TB: the model tables are provably bounded by the
  * alphabet — at most A³ trigram and A² bigram rows regardless of
  * corpus size — so both sides broadcast (evidence-gated) and scoring
  * is ONE map-side join pass plus the per-doc aggregation. The
  * reference corpus is scanned once (materialized before fanning into
  * the three count aggregations). No collect, no cartesian.
  */
object LmScore {

  /** Sliding character n-grams of the lowercased text, as an array
    * Column (empty for docs shorter than `n`). Pure codegen'd
    * transform — no explode here; the consumer explodes once.
    */
  def charNgrams(text: Column, n: Int): Column =
    charNgramsOfLower(lower(text), n)

  /** [[charNgrams]] over an ALREADY-LOWERCASED, BOUND text column.
    * The n-gram lambda substrings `t` per element, and Catalyst does
    * not CSE inside lambda bodies — an inline `lower(text)` here
    * re-lowercases the whole document once per n-gram, O(len²) per
    * doc (the q_dsir_score lesson; see the verify notes). Hot paths
    * project the lowered text to an attribute and call this form;
    * substring-of-attribute per element is the cheap O(n) it reads as.
    */
  def charNgramsOfLower(t: Column, n: Int): Column = {
    require(n >= 1, "n must be positive")
    val cnt = length(t) - (n - 1)
    when(cnt <= 0 || t.isNull, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), cnt), i => t.substr(i, lit(n))))
  }

  /** Train on `ref(refTextCol)`, score `docs(idCol, textCol)`.
    * Output: (doc, n_tri, lm_q, lm_mean) — `lm_q` the quantized
    * integer sum, `lm_mean` = lm_q / n_tri / Q as one fixed-
    * parenthesization double chain (mean trigram conditional in
    * [0, 1]; higher = more reference-like). Documents with fewer than
    * 3 characters produce no rows (no trigram evidence either way —
    * route them to a length gate, not a likelihood gate).
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                ref: DataFrame, refTextCol: String,
                quantScale: Long = 1000000000L): DataFrame = {
    require(quantScale >= 1L, "quantScale must be positive")
    // One scan of the reference feeds trigram, bigram, and alphabet
    // counts; the count tables are alphabet-bounded (see scaladoc).
    val refT = graft.util.Materialize.once(
      ref.select(lower(col(refTextCol)).as("t")).filter(col("t").isNotNull))
    // `t` is a bound, already-lowered attribute — charNgramsOfLower,
    // not charNgrams, or every n-gram re-lowercases the document
    // (O(len²); see charNgramsOfLower's scaladoc).
    val c3 = refT.select(explode(charNgramsOfLower(col("t"), 3)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c3"))
    val c2 = refT.select(explode(charNgramsOfLower(col("t"), 2)).as("g2"))
      .groupBy(col("g2")).agg(count(lit(1)).as("c2"))
    val alpha = refT.select(explode(charNgramsOfLower(col("t"), 1)).as("ch"))
      .agg(countDistinct(col("ch")).as("alpha"))
    val tris = docs
      .select(col(idCol).as("doc"), lower(col(textCol)).as("__lt"))
      .select(col("doc"), explode(charNgramsOfLower(col("__lt"), 3)).as("g"))
      .withColumn("g2", substring(col("g"), 1, 2))
    tris
      .join(Joins.broadcastIfSmall(c3), Seq("g"), "left")
      .join(Joins.broadcastIfSmall(c2), Seq("g2"), "left")
      .join(broadcast(alpha))
      // Unseen trigram → cnt₃ = 0 (numerator 1: the add-one mass);
      // unseen prefix → cnt₂ = 0 (denominator A alone).
      .withColumn("q",
        expr(s"(${quantScale}L * (coalesce(c3, 0L) + 1L)) DIV (coalesce(c2, 0L) + alpha)"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_tri"), sum(col("q")).as("lm_q"))
      .withColumn("lm_mean",
        col("lm_q").cast("double") / col("n_tri").cast("double")
          / lit(quantScale.toDouble))
      .select(col("doc"), col("n_tri"), col("lm_q"), col("lm_mean"))
  }

  /** CCNet-style keep gate: documents whose mean trigram conditional
    * meets `minMean` (scored against `ref`). Returns the kept rows of
    * `docs` with the score columns appended — compose into a cleaning
    * pipeline exactly like the heuristic gates in [[CorpusClean]].
    */
  def filterByScore(docs: DataFrame, idCol: String, textCol: String,
                    ref: DataFrame, refTextCol: String,
                    minMean: Double,
                    quantScale: Long = 1000000000L): DataFrame = {
    val scores = scoreDocs(docs, idCol, textCol, ref, refTextCol, quantScale)
      .filter(col("lm_mean") >= minMean)
    docs.join(scores, docs(idCol) === scores("doc")).drop("doc")
  }
}
