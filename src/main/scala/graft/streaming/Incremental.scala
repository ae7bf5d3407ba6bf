package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** High-water-mark incremental extraction — the proper fix for the
  * reference's overlap-window polling (SURVEY.md §2.A2: a 270-min
  * lookback re-reads 30 min of rows every run and relies on downstream
  * dedup). Here the last processed watermark is durable state; each
  * batch reads strictly-newer rows exactly once, no overlap and no
  * dedup debt. At cluster scale the predicate prunes date partitions
  * before I/O.
  */
final class Incremental(spark: SparkSession, stateDir: String, tsCol: String) {

  private val statePath = s"$stateDir/hwm.parquet"

  def currentWatermark(): Option[java.sql.Timestamp] =
    try {
      val rows = spark.read.parquet(statePath).agg(max(col("hwm"))).collect()
      Option(rows.head.getTimestamp(0))
    } catch { case _: Exception => None }

  /** Rows strictly newer than the stored watermark. */
  def newRows(source: DataFrame): DataFrame =
    currentWatermark() match {
      case Some(hwm) => source.filter(col(tsCol) > lit(hwm))
      case None => source
    }

  /** Advance the watermark to the max timestamp of the processed batch
    * (append-only state: the reader takes the max, so concurrent
    * append is safe and history is an audit log).
    */
  def commit(processed: DataFrame): Unit = {
    val m = processed.agg(max(col(tsCol)).as("hwm")).filter(col("hwm").isNotNull)
    if (!m.isEmpty) m.write.mode("append").parquet(statePath)
  }

  /** One poll cycle: read new rows, hand them to `process`, advance. */
  def runBatch(source: DataFrame)(process: DataFrame => Unit): Long = {
    val batch = newRows(source).persist()
    try {
      val n = batch.count()
      if (n > 0) { process(batch); commit(batch) }
      n
    } finally batch.unpersist()
  }
}
