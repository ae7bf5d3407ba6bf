package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier detection — the monitoring-side twin of
  * the reference's data-quality gate (SURVEY §2.E1): instead of a fixed
  * null-ratio threshold, flag values that sit more than k MADs from
  * their group's median. Median/MAD are used instead of mean/stddev
  * because a telemetry column's outliers are exactly what corrupts the
  * mean — the robust pair is unmoved by them.
  *
  * Everything is computed on an integer-quantized grid supplied by the
  * caller (e.g. `floor(value * 100)` = cents): medians of longs
  * interpolate at exact binary fractions (x.0 / x.5 / x.25), so every
  * engine reproduces the statistics bit-for-bit — the same trick the
  * group-quantiles and LM-score oracles use.
  *
  * Scale shape: the corpus collapses to a (group, value, count)
  * HISTOGRAM in the first aggregation — one shuffle over the raw rows —
  * and every downstream step (median, deviations, MAD, flag counts)
  * runs over that bounded table via `percentile(col, p, frequency)`.
  * The quantized grid is what bounds the histogram (and the exact
  * percentile's value->count buffers) at 100 TB; for genuinely
  * unbounded measures swap in the GK sketch
  * (Sampling.percentileGateApprox).
  */
object Anomaly {

  /** Per-group robust stats + outlier counts over a pre-quantized long
    * column: (group_key, n, med, mad, n_outliers) where an outlier is
    * |vq - median| > k * MAD. Groups whose MAD is 0 (over half the
    * values identical) flag every value off the median — the standard
    * MAD caveat, kept deliberately (a constant column with one stray
    * value SHOULD flag the stray).
    */
  def madOutlierStats(df: DataFrame, group: Column, vq: Column, k: Int = 3): DataFrame = {
    // One corpus-sized shuffle; everything after runs on the histogram.
    // MATERIALIZED: the histogram feeds four consumers (median agg,
    // deviation join, MAD agg, final agg) and broadcastIfSmall's eager
    // counts execute two of them immediately — without the cut each
    // consumer re-scans and re-shuffles the raw corpus, turning the
    // documented one shuffle into ~four.
    val hist = graft.util.Materialize.once(
      df.select(group.as("group_key"), vq.cast("long").as("__vq"))
        .groupBy(col("group_key"), col("__vq")).agg(count(lit(1)).as("__cnt")))
    val med = hist.groupBy(col("group_key"))
      .agg(expr("percentile(__vq, 0.5D, __cnt)").as("med"))
    val dev = graft.util.Materialize.once(
      hist.join(Joins.broadcastIfSmall(med), "group_key")
        .withColumn("__dev", abs(col("__vq") - col("med"))))
    val mad = dev.groupBy(col("group_key"))
      .agg(expr("percentile(__dev, 0.5D, __cnt)").as("mad"))
    dev.join(Joins.broadcastIfSmall(mad), "group_key")
      .groupBy(col("group_key"))
      .agg(
        sum(col("__cnt")).as("n"),
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(k) * col("mad"), col("__cnt")).otherwise(0L)).as("n_outliers"))
  }

  /** One-sided CUSUM drift detector (Page 1954) — the cumulative
    * companion of [[madOutlierStats]]' spot outliers and
    * q_spike_detect's trailing-mean spikes: a SMALL persistent uplift
    * no single day's test notices accumulates here until it alarms.
    * The textbook recursion s_t = max(0, s_{t-1} + (x_t − k)) is
    * sequential; the distributed form uses the reflection identity
    * (Lindley's recursion):
    *
    *   s_t = S_t − min(0, min_{j≤t} S_j),   S = prefix sum of (x − k)
    *
    * i.e. one running SUM plus one running MIN — both ride
    * [[GlobalIndex]]'s range-partitioned two-pass scans (the min as a
    * running max of −S), so every value is an exact long and the whole
    * trajectory is engine-reproducible. NULL values fail loud; the sum
    * scan's addExact makes overflow loud too.
    *
    * Returns one row per input row: (orderCol, valueCol, cusum,
    * alarm = cusum > h). `orderCol` must be a total order.
    */
  def cusum(df: DataFrame, orderCol: String, valueCol: String,
            k: Long, h: Long): DataFrame = {
    val v = col(valueCol).cast("long")
    val checked = when(v.isNotNull, v).otherwise(raise_error(
      lit(s"cusum: NULL $valueCol — the drift statistic needs every point")))
    val pre = df.select(col(orderCol), checked.as(valueCol),
      (checked - lit(k)).as("__dev"))
    val withS = GlobalIndex.withRunningTotal(pre, Seq(col(orderCol)), "__dev", "__S")
      .withColumn("__negS", -col("__S"))
    val withMin = GlobalIndex.withRunningMax(withS, Seq(col(orderCol)), "__negS", "__negMin")
    withMin.select(col(orderCol), col(valueCol),
        (col("__S") - least(-col("__negMin"), lit(0L))).as("cusum"))
      .withColumn("alarm", col("cusum") > lit(h))
  }

  /** Per-group [[cusum]] — drift monitored independently per segment
    * (service, clinic, language). Here plain PARTITIONED windows are
    * the right tool: partitioning by the group key distributes the
    * scan (only an unpartitioned global window funnels), and both
    * reflection scans (prefix sum, prefix min) share ONE (partition,
    * order) spec — a single exchange + sort. Same exact-integer
    * reflection identity, same loud NULL contract, and the same loud
    * OVERFLOW contract as [[cusum]]'s addExact scan: a plain long
    * window sum would wrap silently, so the prefix sum runs in
    * decimal(38,0) (never overflows for long inputs at any plausible
    * row count) and the final cusum is range-checked before the cast
    * back to long — out-of-range raises instead of wrapping.
    */
  def cusumByGroup(df: DataFrame, groupCol: String, orderCol: String,
                   valueCol: String, k: Long, h: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("long")
    val checked = when(v.isNotNull, v).otherwise(raise_error(
      lit(s"cusumByGroup: NULL $valueCol — the drift statistic needs every point")))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withS = df.select(col(groupCol), col(orderCol), checked.as(valueCol))
      .withColumn("__S",
        sum(col(valueCol).cast("decimal(38,0)") - lit(k)).over(w))
    val cusumWide = col("__S") - least(col("__minS"), lit(0L).cast("decimal(38,0)"))
    withS
      .withColumn("__minS", min(col("__S")).over(w))
      .withColumn("__cw", cusumWide)
      .select(col(groupCol), col(orderCol), col(valueCol),
        when(col("__cw").between(lit(Long.MinValue), lit(Long.MaxValue)),
            col("__cw").cast("long"))
          .otherwise(raise_error(lit(
            "cusumByGroup: cusum overflowed Long — loud, matching cusum's addExact contract")))
          .as("cusum"))
      .withColumn("alarm", col("cusum") > lit(h))
  }
}
