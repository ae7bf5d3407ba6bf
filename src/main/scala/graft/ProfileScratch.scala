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

    val docs = graft.tables.TestTables.documents(spark, dir).filter(col("doc_id") % 10 === 0)
    for (sh <- Seq(2, 3); mj <- Seq(0.1, 0.2, 0.3)) {
      val n = graft.datapipe.Dedup.minhashPairs(docs, "doc_id", "text", minJaccard = mj, shingle = sh).count()
      println(s"shingle=$sh minJ=$mj pairs=$n")
    }

    spark.stop()
  }
}
