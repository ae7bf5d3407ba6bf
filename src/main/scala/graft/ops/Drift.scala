package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two dataset snapshots — the
  * scheduled check a production pipeline runs before trusting a new
  * batch (input mix shifted? a source died? a category exploded?).
  *
  * The metric is total variation distance, TVD = ½·Σ|p_A − p_B|,
  * carried as the exact INTEGER numerator `|c_A·n_B − c_B·n_A|` over
  * the fixed denominator `n_A·n_B` (never an IEEE ratio — the same
  * portability rule as the engine's other verdicts: a drift alarm must
  * not fire differently on different hardware). The common published
  * alternative, PSI, needs `ln` — deliberately avoided: TVD bounds PSI
  * decisions for monitoring purposes and stays engine-exact.
  *
  * Scale shape: one aggregation per snapshot (map-side partials over
  * a bounded category set), a full-outer join of two category-sized
  * results, and two broadcast 1-row totals. Nothing corpus-sized
  * crosses the wire.
  */
object Drift {

  /** Per-category drift table: (category, c_a, c_b, tvd_num, drifted)
    * where `tvd_num = |c_A·n_B − c_B·n_A|` and `drifted` flags
    * categories whose TVD contribution `tvd_num / (2·n_A·n_B)` exceeds
    * `threshNum/threshDen`, tested by exact cross-multiplication.
    * Totals ride along as n_a / n_b for downstream aggregation.
    */
  def tvd(a: DataFrame, b: DataFrame, cat: String,
          threshNum: Long, threshDen: Long): DataFrame = {
    require(threshDen >= 1 && threshNum >= 0 && threshNum <= Long.MaxValue / 2,
      s"threshold must be a ratio with threshDen >= 1, got $threshNum/$threshDen")
    // Exact-long domain guard (same discipline as TimeSeries.ewmaScaled):
    // every product this metric forms is bounded by n_a·n_b·k with
    // k = max(threshDen, 2·threshNum), since c ≤ n and tvd_num ≤
    // n_a·n_b. A snapshot pair past that bound must fail with a
    // READABLE error — under ANSI the raw multiply dies as a cryptic
    // mid-job ArithmeticException, and non-ANSI silently wraps into a
    // garbage drift verdict. The check is division-based so the guard
    // itself can't overflow.
    val k = math.max(threshDen, 2 * threshNum).max(1L)
    val limit = Long.MaxValue / k
    val ca = a.groupBy(col(cat)).agg(count(lit(1)).as("c_a"))
    val cb = b.groupBy(col(cat)).agg(count(lit(1)).as("c_b"))
    val na = a.agg(count(lit(1)).as("n_a"))
    val nb = b.agg(count(lit(1)).as("n_b"))
    val guarded = when(col("n_a") > lit(limit) / greatest(col("n_b"), lit(1L)),
      raise_error(concat(lit(s"Drift.tvd domain: n_a*n_b*$k exceeds Long range (n_a="),
        col("n_a").cast("string"), lit(", n_b="), col("n_b").cast("string"),
        lit(") — aggregate to coarser categories or pre-sample the snapshots"))))
    ca.join(cb, Seq(cat), "full_outer")
      .na.fill(0L, Seq("c_a", "c_b"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .withColumn("tvd_num",
        guarded.otherwise(abs(col("c_a") * col("n_b") - col("c_b") * col("n_a"))))
      .withColumn("drifted",
        col("tvd_num") * lit(threshDen) > lit(2L * threshNum) * col("n_a") * col("n_b"))
      .select(col(cat), col("c_a"), col("c_b"), col("n_a"), col("n_b"),
        col("tvd_num"), col("drifted"))
  }
}
