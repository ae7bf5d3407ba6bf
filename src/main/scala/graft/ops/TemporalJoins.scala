package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no native form of: point-in-time
  * (as-of) join and interval-containment (range) join. Both avoid the
  * naive range-join blowup — the plans are one equi-shuffle each, so
  * they scale like ordinary joins.
  */
object TemporalJoins {

  /** As-of join: for each left row, attach the LATEST right payload
    * with `right.tsCol <= left.tsCol`, per `key` (the point-in-time
    * lookup of feature stores and slowly-changing enrichment).
    *
    * Not a range join: both sides union on (key, ts) and a single
    * `last(payload, ignoreNulls)` window sweep carries the most recent
    * right payload forward into each left row. ONE shuffle on the key,
    * linear in rows, no candidate explosion; per-key skew is bounded by
    * that key's own history, and the window is a running frame — Spark
    * evaluates it in one pass without buffering the partition.
    *
    * The right side must be unique per (key, ts) for deterministic
    * results (pre-aggregate if not). At equal timestamps the right row
    * is visible to the left row (inclusive, DuckDB ASOF semantics).
    *
    * Output: all left columns, plus each right payload column as
    * `asof_<name>` (null when no right row precedes the left row).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           payload: Seq[String]): DataFrame =
    asOfDirected(left, right, key, tsCol, payload, "backward")

  /** [[asOf]] with a direction: `backward` (latest right ≤ left, the
    * default), `forward` (earliest right ≥ left — the lookahead join
    * of label attachment: "next outcome after this event"), `nearest`
    * (closer of the two, ties to backward; requires a NUMERIC ts).
    *
    * Same single-shuffle shape for all three: the directional sweeps
    * are windows over the SAME key partitioning (forward is the
    * backward sweep over a descending sort — the running `last` then
    * carries the SMALLEST right ts ≥ each left row), so `nearest`
    * costs one exchange and two sorts, never a range-join explosion.
    */
  def asOfDirected(left: DataFrame, right: DataFrame, key: String, tsCol: String,
                   payload: Seq[String], direction: String): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asOf direction must be backward|forward|nearest, got $direction")
    val l = left.withColumn("__side", lit(1))
    // Null-key/null-ts right rows can never be a match under SQL join
    // semantics (NULL matches nothing, and "closest in time" is
    // undefined for a missing time), so drop them before the union —
    // same contract as the native AsOfJoinExec. Left rows keep their
    // nulls and surface with a null asof_* payload.
    val r = right
      .filter(col(key).isNotNull && col(tsCol).isNotNull)
      .select(
        col(key), col(tsCol), lit(0).as("__side"),
        struct((payload.map(col) :+ col(tsCol).as("__rts")): _*).as("__payload"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    def sweep(ts: Column) = last(col("__payload"), ignoreNulls = true).over(
      Window.partitionBy(col(key)).orderBy(ts, col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // Both sweeps must put null-ts LEFT rows before every right row so
    // the running last() has seen no payload when it reaches them:
    // asc defaults to nulls-first, but desc defaults to nulls-LAST —
    // without desc_nulls_first a null-ts left row would sort after all
    // right rows in the forward sweep and steal the earliest payload.
    val picked = direction match {
      case "backward" => unioned.withColumn("__pick", sweep(col(tsCol).asc))
      case "forward" => unioned.withColumn("__pick", sweep(col(tsCol).desc_nulls_first))
      case "nearest" => unioned
        .withColumn("__b", sweep(col(tsCol).asc))
        .withColumn("__f", sweep(col(tsCol).desc_nulls_first))
        .withColumn("__pick",
          when(col("__f").isNull, col("__b"))
            .when(col("__b").isNull, col("__f"))
            .when(col(tsCol) - col("__b.__rts") <= col("__f.__rts") - col(tsCol), col("__b"))
            .otherwise(col("__f")))
    }
    val keep = left.columns.map(col) ++
      payload.map(p => col(s"__pick.$p").as(s"asof_$p"))
    picked.filter(col("__side") === 1).select(keep: _*)
  }

  /** Interval-containment join: `rows` whose `tsCol` falls inside
    * [startCol, endCol] of an interval with matching `keys`.
    *
    * Intervals explode into the fixed-width time bands they cover;
    * each row computes its single band; the join is an ordinary
    * equi-join on (keys, band) with the true containment predicate
    * verifying candidates. A row meets an interval in exactly one band
    * (its own), so no post-join dedup is needed even for band-spanning
    * intervals. Cost is |intervals| x span/bandWidth index rows — pick
    * `bandWidth` near the typical interval span so most intervals
    * explode into O(1) bands.
    *
    * The band id divides as DOUBLE then floors, rather than integer
    * division, because both engines make identical IEEE choices on the
    * boundary — keeping the oracle SQL a literal transcription.
    */
  def bandJoin(rows: DataFrame, intervals: DataFrame, keys: Seq[String],
               tsCol: String, startCol: String, endCol: String,
               bandWidth: Long): DataFrame = {
    def band(c: Column): Column = floor(c / lit(bandWidth.toDouble))
    val ivl = intervals.withColumn("__band",
      explode(sequence(band(col(startCol)), band(col(endCol)))))
    val evs = rows.withColumn("__band", band(col(tsCol)))
    evs.join(ivl, keys :+ "__band")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__band")
  }

  /** Global incident windows: maximal runs of `bucketUs`-wide time
    * buckets containing at least one row, bridging gaps of up to
    * `maxGapBuckets` empty buckets — "error burst" detection over an
    * event stream, producing the interval source for `bandJoin`.
    *
    * The raw rows first collapse to DISTINCT buckets (an ordinary
    * shuffle reduction), so the unavoidable single-partition global
    * window runs over at most time-range/bucketUs rows (~526k for a
    * year of minutes) no matter how many billions of events feed it.
    * All arithmetic is integer (`div`), so the oracle transcribes
    * exactly.
    */
  def incidentWindows(rows: DataFrame, tsCol: String, bucketUs: Long,
                      maxGapBuckets: Int): DataFrame = {
    // partitionBy(lit(0)): semantically the same single global
    // partition, but the explicit constant key states the documented
    // boundedness (distinct buckets, not events) in the plan itself and
    // keeps WindowExec's "No Partition Defined" warning — meant for
    // unbounded inputs — out of every bench/verify log.
    val w = Window.partitionBy(lit(0)).orderBy(col("bkt"))
    // `div`, not `/`: long / long goes through double in Spark, and a
    // truncating cast of a near-integer quotient can disagree with
    // DuckDB's `//` floor division at bucket boundaries.
    rows.select(expr(s"$tsCol div ${bucketUs}L").as("bkt")).distinct()
      .withColumn("__new",
        when(lag(col("bkt"), 1).over(w).isNull, 1)
          .when(col("bkt") - lag(col("bkt"), 1).over(w) > maxGapBuckets + 1, 1)
          .otherwise(0))
      .withColumn("__run", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__run"))
      .agg((min(col("bkt")) * bucketUs).as("start_us"),
        ((max(col("bkt")) + 1) * bucketUs - 1).as("end_us"),
        count(lit(1)).as("n_buckets"))
      .drop("__run")
  }
}
