package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler / plan probe (not part of the driver contract). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Probe 1: does the incremental watermark filter reach the events scan?
    val ev = graft.tables.TestTables.events(spark, dir)
    val hwm = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    println("=== watermark filter plan ===")
    println(ev.filter(col("ts") > lit(hwm)).queryExecution.executedPlan.toString)

    spark.stop()
  }
}
