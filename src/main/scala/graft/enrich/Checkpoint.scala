package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint/resume for enrichment stages (E3, reference
  * src/run_predictions.py:214-231 and src/lch_eligibility.py:58-80):
  * a parquet table of processed keys, anti-joined against the input on
  * restart so calls are idempotent across reruns. At cluster scale the
  * store is partitioned by run date (`run_id`) so old runs prune away.
  */
final class Checkpoint(spark: SparkSession, path: String, keyCol: String) {

  def processedKeys(): DataFrame = {
    // Existence check first: reading a not-yet-created store would log
    // a scary (but benign) FileNotFoundException stack from Hadoop's
    // metadata probe on every first run.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) spark.emptyDataFrame.withColumn(keyCol, lit(null: String))
    else
      try spark.read.parquet(path).select(col(keyCol)).distinct()
      catch { case _: Exception => spark.emptyDataFrame.withColumn(keyCol, lit(null: String)) }
  }

  /** B28: drop rows whose key is already recorded. */
  def filterNew(input: DataFrame): DataFrame = {
    val done = processedKeys()
    if (done.columns.isEmpty) input
    else input.join(done, Seq(keyCol), "left_anti")
  }

  /** Record a batch of processed keys (append, partitioned by run). */
  def record(batch: DataFrame, runId: String): Unit =
    batch.select(col(keyCol)).distinct()
      .withColumn("run_id", lit(runId))
      .write.mode("append").partitionBy("run_id").parquet(path)
}
