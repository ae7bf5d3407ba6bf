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
  * re-applying themselves over partial results, and `hll` carries a
  * distinct count as a DataSketches HLL sketch whose union is
  * register-identical to the single-stream sketch. EXACT distinct
  * counts and quantiles are rejected by construction: they need the
  * raw data, and pretending `count(distinct)` merges additively is
  * the classic silent-wrong-rollup bug.
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
    val aggs = measures.map { case (name, (fn, e)) => rollupFn(fn)(e).as(name) }
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

  /** Replace HLL sketch columns with their cardinality estimates —
    * the read-side final step for `hll` measures.
    */
  def estimates(rollup: DataFrame, hllCols: Seq[String]): DataFrame =
    hllCols.foldLeft(rollup)((df, c) => df.withColumn(c, hll_sketch_estimate(col(c))))

  /** Batch-side aggregate for a measure. `hll` produces a DataSketches
    * HLL sketch — the MERGEABLE form of a distinct count. The merge of
    * partial sketches is register-identical to the single-stream
    * sketch (each register is a max, and max is associative), so
    * maintenance never drifts from a recompute; the estimate itself is
    * approximate (and exact while the sketch is in sparse mode), which
    * is the honest trade for a distinct count that folds.
    */
  private def rollupFn(name: String): Column => Column = name match {
    case "hll" => hll_sketch_agg(_)
    case other => mergeFn(other)
  }

  private def mergeFn(name: String): Column => Column = name match {
    case "sum" => sum
    case "min" => min
    case "max" => max
    case "hll" => hll_union_agg(_)
    case other => throw new IllegalArgumentException(
      s"'$other' is not a mergeable measure: only sum/min/max/hll fold exactly over partial rollups " +
        "(EXACT distinct counts and quantiles need the raw data — use 'hll' for a mergeable distinct)")
  }
}
