package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Load surface (SURVEY.md §2.D) and the reliability gate (E1).
  * Parquet/CSV stand in for the JDBC warehouse locally; the JDBC
  * variants are the same `df.write` call with format("jdbc") +
  * batchsize, so nothing here changes shape on a cluster.
  */
object Sinks {

  /** D1: append load (chunking = JDBC batchsize / file task split). */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** B3: archive CSV copy. */
  def archiveCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** D2: upsert MERGE semantics without Delta — new rows win on `key`,
    * untouched old rows survive: updates ∪ (old ⟕anti updates).
    * The anti join shuffles on the key once; with a Delta/Iceberg table
    * this becomes MERGE INTO and prunes to matching files.
    */
  def upsert(old: DataFrame, updates: DataFrame, key: String): DataFrame =
    updates.unionByName(old.join(updates.select(key).distinct(), Seq(key), "left_anti"))

  /** D2 applied to a parquet table path: read-merge-rewrite via a
    * staging directory then swap (the reference's staging-table MERGE,
    * src/etl_utils.py:87-145).
    */
  def upsertParquet(spark: SparkSession, tablePath: String, updates: DataFrame, key: String): Unit = {
    val merged =
      try upsert(spark.read.parquet(tablePath), updates, key)
      catch { case _: Exception => updates }
    val staging = tablePath + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(tablePath)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
  }
}

/** E1: the pre-load data-quality gate (dags/eligibilty_etl.py:280-321):
  * abort when >= `threshold` of rows have a null `classCol`, excluding
  * rows whose note is the expected TPA message; report the top-10 note
  * distribution and a 10-row sample for diagnosis.
  */
object QualityGate {

  final case class GateReport(totalRows: Long, invalidRows: Long, ratio: Double,
                              topNotes: Seq[(String, Long)], passed: Boolean)

  final class GateFailedException(val report: GateReport)
    extends RuntimeException(f"quality gate failed: ${report.ratio * 100}%.1f%% invalid (${report.invalidRows}/${report.totalRows})")

  def check(df: DataFrame, classCol: String = "class", noteCol: String = "note",
            expectedNotePrefix: String = "1660", threshold: Double = 0.5): GateReport = {
    val invalid = col(classCol).isNull && !coalesce(col(noteCol), lit("")).startsWith(expectedNotePrefix)
    // One aggregation pass for the counts; the top-notes diagnostic only
    // runs over the (small) invalid slice.
    val row = df.agg(
      count(lit(1)).as("total"),
      sum(when(invalid, 1L).otherwise(0L)).as("bad")).head()
    val total = row.getLong(0)
    val bad = Option(row.get(1)).map(_.toString.toLong).getOrElse(0L)
    val ratio = if (total == 0) 0.0 else bad.toDouble / total
    val notes =
      if (bad == 0) Seq.empty
      else df.filter(invalid).groupBy(col(noteCol)).count()
        .orderBy(col("count").desc, col(noteCol)).limit(10)
        .collect().map(r => (Option(r.getString(0)).getOrElse("null"), r.getLong(1))).toSeq
    GateReport(total, bad, ratio, notes, passed = ratio < threshold)
  }

  /** Throwing form used by pipelines before the load step. */
  def assertPasses(df: DataFrame, classCol: String = "class", noteCol: String = "note",
                   expectedNotePrefix: String = "1660", threshold: Double = 0.5): GateReport = {
    val report = check(df, classCol, noteCol, expectedNotePrefix, threshold)
    if (!report.passed) throw new GateFailedException(report)
    report
  }
}
