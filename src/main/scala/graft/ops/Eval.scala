package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation in exact integer arithmetic — the
  * missing third leg of the quality-gate loop (train
  * [[graft.datapipe.Classifier.train]] → score
  * [[graft.datapipe.Classifier.scoreDocs]] → EVALUATE). The reference
  * validates its predictions model against labeled visits
  * (`Notebooks/test_for_samy.ipynb`, `src/predictions.py:79-127`);
  * this is that validation re-expressed as one deterministic
  * distributed statement.
  *
  * Two verdicts from one pass:
  *  - the confusion quadrant at an integer threshold (tp/fp/fn/tn,
  *    from which precision/recall/F1 are exact rationals the caller
  *    forms by division — counts ship, IEEE never accumulates);
  *  - ROC AUC as the exact rational `auc2_num / auc2_den`, the
  *    Mann–Whitney rank statistic with average-rank tie handling:
  *    doubling both sides keeps tie contributions (half-counts) on
  *    the integer grid:
  *      auc2_num = Σ_s n⁺_s · (2·cumNeg(<s) + n⁻_s)
  *      auc2_den = 2 · n⁺ · n⁻
  *    where the sum runs over DISTINCT scores ascending.
  *
  * Shape at scale: one shuffle collapses the corpus to score
  * granularity (map-side partial aggregation — each task ships at
  * most |distinct scores| rows); the prefix count over that table
  * rides [[GlobalIndex.withRunningTotal]]'s range-partitioned
  * two-pass scan, never a single-partition global window, so a
  * billion-row eval with a million distinct scores plans exactly
  * like this fixture. Long domain: exact while n⁺·n⁻ ≤ 2⁶²
  * (each class below ~2·10⁹ rows — beyond that, evaluate on a
  * [[graft.datapipe.Sampling]] slice); the per-score terms and their
  * sum are bounded by auc2_den, so the final fold cannot overflow
  * before the denominator does.
  */
object Eval {

  /** Scores order both statistics, and NULL orders differently across
    * engines (Spark nulls-first vs DuckDB nulls-last) — so a NULL
    * score is rejected loudly rather than silently skewing the rank
    * statistic in an engine-specific way.
    */
  private def checkedScore(scoreCol: String, op: String) = {
    val s = col(scoreCol).cast("long")
    when(s.isNotNull, s).otherwise(raise_error(
      lit(s"$op: NULL $scoreCol — every row needs a score")))
  }

  /** Evaluate integer `scoreCol` against 0/1 `labelCol`.
    *
    * Returns ONE row:
    * (n_pos, n_neg, tp, fp, fn, tn, auc2_num, auc2_den) — all longs.
    * Positive prediction is `score > threshold` (matching
    * `Classifier.scoreDocs`' `keep`). A label outside {0, 1} (NULL
    * included) fails loud rather than silently skewing the counts.
    */
  def binaryEval(scored: DataFrame, scoreCol: String, labelCol: String,
                 threshold: Long = 0L): DataFrame = {
    val yRaw = col(labelCol).cast("long")
    val y = when(yRaw === 0L || yRaw === 1L, yRaw).otherwise(raise_error(concat(
      lit(s"binaryEval: $labelCol must be 0 or 1, got "),
      coalesce(col(labelCol).cast("string"), lit("NULL")))))
    val byScore = scored
      .select(checkedScore(scoreCol, "binaryEval").as("score"), y.as("y"))
      .groupBy(col("score"))
      .agg(sum(col("y")).as("n_pos"), sum(lit(1L) - col("y")).as("n_neg"))
    val withCum = GlobalIndex.withRunningTotal(
      byScore, Seq(col("score")), "n_neg", "cum_neg")
    withCum.agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        sum(when(col("score") > threshold, col("n_pos")).otherwise(0L)).as("tp"),
        sum(when(col("score") > threshold, col("n_neg")).otherwise(0L)).as("fp"),
        sum(when(col("score") <= threshold, col("n_pos")).otherwise(0L)).as("fn"),
        sum(when(col("score") <= threshold, col("n_neg")).otherwise(0L)).as("tn"),
        // cum_neg is INCLUSIVE of the current score's negatives, so
        // 2·cumNeg(<s) + n⁻_s = 2·cum_neg − n⁻_s.
        sum(col("n_pos") * (lit(2L) * col("cum_neg") - col("n_neg"))).as("auc2_num"))
      .withColumn("auc2_den", lit(2L) * col("n_pos") * col("n_neg"))
      .select(col("n_pos"), col("n_neg"), col("tp"), col("fp"), col("fn"),
        col("tn"), col("auc2_num"), col("auc2_den"))
  }

  /** Reliability (calibration) table: equal-frequency score bins with
    * exact per-bin label counts — the "is a higher score actually more
    * positive" diagnostic that accompanies AUC. Bins are rank deciles
    * over the TOTAL order (score, y): including the label in the order
    * makes tied scores interchangeable within a (score, y) class, so
    * per-bin counts are deterministic even when a tie group spans a
    * bin boundary — without it, which tied row lands in which bin
    * would depend on partition order and the bin sums would flap.
    * Ranks ride [[GlobalIndex.withGlobalIndex]]'s range-partitioned
    * zipWithIndex, never a single-partition window; bin = rank·bins/n
    * by integer division (the q_score_ranks cut rule).
    *
    * Returns `bins` rows: (bin, n, n_pos, min_score, max_score).
    */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val yRaw = col(labelCol).cast("long")
    val y = when(yRaw === 0L || yRaw === 1L, yRaw).otherwise(raise_error(concat(
      lit(s"calibrationBins: $labelCol must be 0 or 1, got "),
      coalesce(col(labelCol).cast("string"), lit("NULL")))))
    val base = scored.select(checkedScore(scoreCol, "calibrationBins").as("score"), y.as("y"))
    val ranked = GlobalIndex.withGlobalIndex(
      base, Seq(col("score"), col("y")), "__rank")
    val n = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .select(expr(s"(__rank * $bins) div __n").as("bin"),
        col("score"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
  }

  /** DuckDB twin of [[binaryEval]]: `scoredSql` must yield
    * (score BIGINT, y BIGINT with y ∈ {0,1}); the eval tail replays
    * the score-level aggregation, the inclusive prefix count, and the
    * doubled rank statistic token for token.
    */
  def binaryEvalSql(scoredSql: String, threshold: Long = 0L): String =
    s"""WITH scored AS MATERIALIZED (
       |  $scoredSql)${binaryEvalTailSql("scored", threshold)}""".stripMargin

  /** The eval tail alone, to APPEND to an existing WITH chain (leads
    * with the separating comma): `rel` must yield (score, y). Lets
    * composite oracles — e.g. a training replay whose learned weights
    * feed the scoring — end in the same hash-compared eval verdict.
    */
  def binaryEvalTailSql(rel: String, threshold: Long = 0L): String =
    s""",
       |byscore AS (
       |  SELECT score,
       |    CAST(sum(y) AS BIGINT) AS n_pos,
       |    CAST(sum(1 - y) AS BIGINT) AS n_neg
       |  FROM $rel GROUP BY score),
       |cum AS (
       |  SELECT score, n_pos, n_neg,
       |    CAST(sum(n_neg) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_neg
       |  FROM byscore)
       |SELECT
       |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
       |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
       |  CAST(sum(CASE WHEN score > $threshold THEN n_pos ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(sum(CASE WHEN score > $threshold THEN n_neg ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(sum(CASE WHEN score <= $threshold THEN n_pos ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(sum(CASE WHEN score <= $threshold THEN n_neg ELSE 0 END) AS BIGINT) AS tn,
       |  CAST(sum(n_pos * (2 * cum_neg - n_neg)) AS BIGINT) AS auc2_num,
       |  CAST(2 * sum(n_pos) * sum(n_neg) AS BIGINT) AS auc2_den
       |FROM cum""".stripMargin
}
