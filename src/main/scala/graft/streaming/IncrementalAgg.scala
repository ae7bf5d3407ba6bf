package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-rollup maintenance — the aggregation half of the
  * incremental polling model (the scan half is
  * [[graft.streaming.Incremental]]'s watermark cut).
  *
  * At 100 TB you never recompute a corpus-wide rollup because a day of
  * data arrived: you aggregate ONLY the new slice and fold it into the
  * stored rollup. That fold is exact when every measure is mergeable —
  * `sum` (and counts, which are sums of 1), `min`, `max` merge by
  * re-applying themselves over partial results. Non-mergeable measures
  * (exact distinct counts, exact medians) are rejected by construction
  * here: they need sketch state (HLL, GK) or the raw data, and
  * pretending `count(distinct)` merges additively is the classic
  * silent-wrong-rollup bug.
  *
  * Plan shape: `merge` unions rollup-sized tables (days × types, not
  * events) and re-aggregates — the only data-scaled work in the whole
  * maintenance cycle is the delta's own aggregation, which is bounded
  * by the poll window, never the corpus.
  */
object IncrementalAgg {

  /** Aggregate one batch into a rollup: `keys` → the given measures.
    * `measures` maps output column → ("sum" | "min" | "max", input
    * expression). `count(*)` is `("sum", lit(1L))`.
    */
  def rollup(batch: DataFrame, keys: Seq[String],
             measures: Seq[(String, (String, Column))]): DataFrame = {
    require(measures.nonEmpty, "need at least one measure")
    val aggs = measures.map { case (name, (fn, e)) => mergeFn(fn)(e).as(name) }
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold any number of same-schema rollups into one — exact, because
    * sum/min/max are associative over partials. Keys absent from one
    * side pass through (a new day simply appears).
    */
  def merge(rollups: Seq[DataFrame], keys: Seq[String],
            measures: Seq[(String, String)]): DataFrame = {
    require(rollups.nonEmpty, "need at least one rollup")
    require(measures.nonEmpty, "need at least one measure")
    val aggs = measures.map { case (name, fn) => mergeFn(fn)(col(name)).as(name) }
    rollups.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Streaming maintenance: each micro-batch's rollup lands as its own
    * `__batch=<id>` partition of a rollup LOG (dynamic partition
    * overwrite — a replayed batch overwrites exactly its own partition,
    * so recovery re-delivery is idempotent, the same exactly-once
    * discipline as the upsert/ingest sinks). Readers fold the log with
    * [[merge]]; a compaction is the same fold written back. The log
    * stays rollup-sized per batch — the stream never holds corpus
    * state, and a crash loses nothing but the in-flight batch.
    */
  def maintainSink(stream: DataFrame, outDir: String, checkpointDir: String,
                   keys: Seq[String],
                   measures: Seq[(String, (String, Column))]): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        rollup(batch, keys, measures)
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch")
          .parquet(outDir)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The maintained rollup: fold the batch log on read. */
  def readMerged(spark: org.apache.spark.sql.SparkSession, outDir: String,
                 keys: Seq[String], measures: Seq[(String, String)]): DataFrame =
    merge(Seq(spark.read.parquet(outDir).drop("__batch")), keys, measures)

  private def mergeFn(name: String): Column => Column = name match {
    case "sum" => sum
    case "min" => min
    case "max" => max
    case other => throw new IllegalArgumentException(
      s"'$other' is not a mergeable measure: only sum/min/max fold exactly over partial rollups " +
        "(distinct counts and quantiles need sketch state or the raw data)")
  }
}
