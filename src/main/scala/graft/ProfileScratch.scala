package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler / plan probe (not part of the driver contract). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.tables.TestTables.nanosAsLongConf._1, graft.tables.TestTables.nanosAsLongConf._2) // NANOS events support; readers never mutate conf
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.datapipe.TextAnalysis
    val docs = graft.tables.TestTables.documents(spark, dir)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }
    for (_ <- 1 to 2) {
      time("corpus words explode+count") {
        docs.select(explode(TextAnalysis.words(col("text"))).as("w")).groupBy("w").count().count()
      }
      time("corpus shingles explode+count") {
        docs.select(explode(TextAnalysis.shingles(col("text"), 3)).as("s")).groupBy("s").count().count()
      }
      time("corpus distinct-shingles explode+count") {
        docs.select(explode(array_distinct(TextAnalysis.shingles(col("text"), 3))).as("s"))
          .groupBy("s").count().count()
      }
      time("decontam full") {
        graft.datapipe.Decontam.overlapReport(
          docs.filter(col("doc_id") % 25 =!= 7), "doc_id", "text",
          docs.filter(col("doc_id") % 25 === 7), "text", n = 3, minOverlap = 0.15).count()
      }
    }
    spark.stop()
  }
}
