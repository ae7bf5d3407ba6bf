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
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.ui.enabled", "false")
      .config(graft.tables.TestTables.nanosAsLongConf._1, graft.tables.TestTables.nanosAsLongConf._2) // NANOS events support; readers never mutate conf
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }

    // Decompose the predictions pipeline: which stage eats the 100×
    // small-heap gap (windows? LLM fan-out? final join)?
    import org.apache.spark.sql.expressions.Window
    import graft.tables.TestTables
    val claims = TestTables.lineitem(spark, dir).select(
      col("l_orderkey").as("visit_id"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("uid"),
      col("l_partkey").as("svc"),
      col("l_shipdate"), col("l_linenumber"),
      when(col("l_orderkey") % 53 === 0 && col("l_linenumber") === 1, lit(null: String))
        .otherwise(concat(lit("ICD-"), (col("l_partkey") % 500).cast("string"))).as("icd10"))
    val wVisit = Window.partitionBy(col("visit_id"))
      .orderBy(col("svc").asc, col("l_shipdate").asc, col("l_linenumber").asc, col("uid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wGroup = Window.partitionBy(col("visit_id"), col("svc"))
      .orderBy(col("l_shipdate").asc, col("l_linenumber").asc, col("uid").asc)
    val wUid = Window.partitionBy(col("visit_id"), col("uid"))
    def annotated = claims
      .repartition(col("visit_id"))
      .withColumn("__nodx", max(col("icd10").isNull.cast("int")).over(wVisit))
      .withColumn("__rn", row_number().over(wGroup))
      .withColumn("__dup", (min(col("__rn")).over(wUid) > 1).cast("int"))

    for (i <- 1 to 2) {
      println(s"--- pass $i ---")
      time("scan+windows only (noop)") {
        annotated.write.format("noop").mode("overwrite").save(); 0L
      }
      // Materialize ONCE and reuse — a second cached copy of the slim
      // 59M-row table plus the fan-out blocks OOMs the 8 GB heap (the
      // product path holds only one copy and completes fine).
      var llmInput: org.apache.spark.sql.DataFrame = null
      time("llmInput materialize") {
        llmInput = graft.util.Materialize.once(
          annotated.filter(col("__nodx") === 0 && col("__dup") === 0)
            .select(col("visit_id"), col("uid")))
        llmInput.count()
      }
      time("LLM fan-out (predict+dedup, noop)") {
        graft.enrich.LlmFanout.predict(llmInput, "visit_id", "uid",
            () => new graft.enrich.MockLlmClient())
          .select(col("uid"), col("medical_prediction"), col("reason"))
          .dropDuplicates("uid")
          .write.format("noop").mode("overwrite").save(); 0L
      }
      time("full q_pipeline_predictions (noop)") {
        graft.pipeline.Pipelines.predictions(spark, dir)
          .write.format("noop").mode("overwrite").save(); 0L
      }
    }
    spark.stop()
  }
}
