package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-side planning helpers. */
object Joins {

  /** Broadcast-hint `df` only when its MEASURED row count is provably
    * small; otherwise return it unhinted and let AQE decide at runtime.
    *
    * For gate sets (failed visits, no-diagnosis visits, duplicate ids)
    * that are usually tiny but are fractions of the data and so grow
    * without bound: a static `broadcast()` hint OOMs at large scale,
    * while no hint costs the fact side a full shuffle write before AQE
    * can convert the join back to broadcast. Counting the (already
    * materialized, cheap) gate set lifts AQE's own size test to plan
    * time: small → static broadcast, big → planner's choice.
    *
    * `maxRows` defaults to ~the rows of a narrow key column that fit
    * the 10 MB spirit of autoBroadcastJoinThreshold on large executors.
    */
  def broadcastIfSmall(df: DataFrame, maxRows: Long = 1000000L): DataFrame =
    if (df.limit((maxRows + 1).toInt).count() <= maxRows) broadcast(df) else df
}
