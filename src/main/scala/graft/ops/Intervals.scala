package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sweep-line concurrency over half-open `[start, end)` intervals —
  * "how many are active at once" (concurrent visits in a ward,
  * sessions on a service, shipments in transit): the question every
  * capacity dashboard asks of interval data. The textbook sweep is a
  * sort plus a running counter; the distributed form here never
  * funnels through one task:
  *
  *   1. each interval explodes to (+1 at start, −1 at end) boundary
  *      deltas — one narrow pass;
  *   2. one aggregation collapses them to NET delta per DISTINCT
  *      boundary instant (map-side partials; output bounded by the
  *      boundary cardinality, not the interval count);
  *   3. the running count over boundary order rides
  *      [[GlobalIndex.withRunningTotal]]'s range-partitioned two-pass
  *      prefix scan.
  *
  * Half-open semantics make the boundary algebra exact: an interval
  * ending at t and another starting at t never overlap, and the count
  * at instant t (covering `[t, next boundary)`) is simply the prefix
  * sum of net deltas through t. Empty intervals `[t, t)` contribute
  * +1 −1 = 0 (they may surface t as a boundary row with an unchanged
  * count — harmless and deterministic). NULL endpoints and end < start
  * fail loud.
  */
object Intervals {

  /** One row per distinct boundary instant: (`outTime`, `outCount`) =
    * the number of intervals covering [t, next boundary). Endpoint
    * columns must cast to long (µs, epoch days — any integer axis).
    */
  def concurrency(df: DataFrame, startCol: String, endCol: String,
                  outTime: String = "t", outCount: String = "n_active"): DataFrame = {
    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    val sChecked = when(s.isNotNull && e.isNotNull && e >= s, s).otherwise(
      raise_error(concat(
        lit(s"Intervals: need non-NULL $startCol <= $endCol, got ["),
        coalesce(s.cast("string"), lit("NULL")), lit(", "),
        coalesce(e.cast("string"), lit("NULL")), lit(")"))))
    val deltas = df
      .select(explode(array(
        struct(sChecked.as("t"), lit(1L).as("d")),
        struct(e.as("t"), lit(-1L).as("d")))).as("ev"))
      .select(col("ev.t").as("t"), col("ev.d").as("d"))
      .groupBy(col("t")).agg(sum(col("d")).as("__net"))
    GlobalIndex.withRunningTotal(deltas, Seq(col("t")), "__net", outCount)
      .select(col("t").as(outTime), col(outCount))
  }
}
