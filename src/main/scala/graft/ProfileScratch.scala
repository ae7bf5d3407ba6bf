package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val extractNoSort = graft.relational.EligibilityExtract.build(spark, dir)
    time("extract_no_sort")(extractNoSort)
    time("extract_sorted")(extractNoSort.orderBy(col("visit_id")))
    val claims = graft.tables.TestTables.lineitem(spark, dir).select(
      col("l_orderkey").as("visit_id"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("uid"))
    time("claims_scan")(claims)
    time("fanout_only")(graft.enrich.LlmFanout.predict(claims, "visit_id", "uid",
      () => new graft.enrich.MockLlmClient()))
    time("pipeline_predictions")(graft.pipeline.Pipelines.predictions(spark, dir))
    spark.stop()
  }
}
