package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar gap-fill for per-entity daily series — the dashboard/
  * feature-pipeline staple: a fact table only has rows for days with
  * activity, but downstream consumers (charts, trailing features,
  * join keys) need one row per entity per day.
  *
  * Two pieces, composable:
  *  - [[dateSpine]]: the dense (entity, day) scaffold between each
  *    entity's own first and last active day — `sequence()` +
  *    `explode`, a narrow per-row expansion, NO cross join of
  *    entities × global calendar (the global scaffold at 100 TB
  *    manufactures rows for entities long dead; per-entity bounds
  *    keep the blow-up proportional to actual lifetimes).
  *  - [[locf]]: last-observation-carried-forward over the spine via
  *    `last(col, ignoreNulls)` in one per-entity ordered window —
  *    the same single-exchange shape as every other window op here.
  */
object TimeSeries {

  /** Dense daily scaffold per entity, bounded by that entity's own
    * [min(day), max(day)] — columns (`entityCol`, `dayCol`).
    */
  def dateSpine(df: DataFrame, entityCol: String, dayCol: String): DataFrame =
    df.groupBy(col(entityCol))
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
      .select(col(entityCol),
        explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day"))).as(dayCol))

  /** Left-join `df` onto its own spine and carry `valueCols` forward
    * through the manufactured gap days. Gap rows keep NULL until the
    * first real observation (nothing to carry). `df` must be unique
    * per (entity, day) — pre-aggregate if not.
    */
  def locf(df: DataFrame, entityCol: String, dayCol: String,
           valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = dateSpine(df, entityCol, dayCol)
      .join(df, Seq(entityCol, dayCol), "left")
    valueCols.foldLeft(filled) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Exponentially-weighted moving sum with half-life ONE STEP,
    * truncated at `k` terms — the trend feature behind "recent
    * activity, recency-discounted": out = Σ_{j=0..k-1}
    * floor(value_{t−j} · scale / 2^j), over each entity's ordered
    * series.
    *
    * Every term is a long lag, a power-of-two division, and a floor —
    * no IEEE accumulation anywhere, so any engine (and any
    * partitioning) produces the identical feature and a value-level
    * oracle can hash it. The alpha=1/2 restriction is the same
    * trade the integer PageRank makes: the one decay whose weights
    * are exact in ANY binary arithmetic. Truncation error after k
    * terms is < 2·max(value)·scale/2^k — pick k ≈ 20 for full long
    * precision.
    *
    * Plan shape: all `k` lags share ONE window (same partition and
    * order ⇒ one exchange + one sort); the output is a single
    * projection over the lag columns — no self-joins, no per-step
    * shuffles. Missing steps are the caller's contract: run [[locf]]
    * (or gap-fill with zeros) first if the series has holes, since a
    * ROW lag is only a TIME lag on a dense series.
    */
  def ewmaScaled(df: DataFrame, entityCol: String, orderCol: String,
                 valueCol: String, k: Int, scale: Long = 1000000L): DataFrame = {
    require(k >= 1 && k <= 62, s"k must be in [1, 62], got $k")
    require(scale >= 1L && scale <= Long.MaxValue / 4,
      s"scale must be in [1, 2^61], got $scale")
    // ENFORCED domain (the addExact discipline): value · scale must fit
    // a long AND the k-term sum (< 2 · value · scale) must too, so the
    // admissible range is [0, Long.MaxValue / (2 · scale)] — 4.6e12 at
    // the default scale. Out-of-domain rows RAISE instead of silently
    // wrapping: a feature column that overflows into negative territory
    // is a corrupt model input, not a value.
    val bound = Long.MaxValue / (2L * scale)
    val v = col(valueCol).cast("long")
    val guarded = when(v.isNull || (v >= 0L && v <= bound), v)
      .otherwise(raise_error(concat(
        lit(s"ewmaScaled: $valueCol out of domain [0, $bound] for scale=$scale: "),
        v.cast("string"))))
    val w = Window.partitionBy(col(entityCol)).orderBy(col(orderCol))
    val terms = (0 until k).map { j =>
      // shiftright, NOT `/`: Spark routes long/long through double
      // (the floor-of-a-near-integer-quotient trap); an arithmetic
      // right shift IS floor division by 2^j, exactly, in pure longs.
      // Missing lags (series head) contribute 0 like an all-zero
      // prehistory.
      coalesce(
        shiftright(lag(guarded, j).over(w) * lit(scale), j),
        lit(0L))
    }
    df.withColumn("ewma_scaled", terms.reduce(_ + _))
  }
}
