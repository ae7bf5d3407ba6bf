package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump the predictions pipeline's INTERIOR (join-tail)
  * physical plan. The registered q_pipeline_predictions stages its
  * result before the verify sort, so PlanAudit's dump of it is just
  * `Sort <- Exchange <- Scan ExistingRDD` — the join-back shape that
  * optimization receipts need lives in the unwrapped
  * `Pipelines.predictions` frame (which still reads the materialized
  * annotated blocks; the enrich stages execute eagerly while the
  * frame is being built, exactly as in PlanShapeSpec).
  */
object DevPipelinePlans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config(graft.tables.TestTables.nanosAsLongConf._1, graft.tables.TestTables.nanosAsLongConf._2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("================ predictions_jointail ================")
    graft.pipeline.Pipelines.predictions(spark, dir).explain("formatted")
    spark.stop()
  }
}
