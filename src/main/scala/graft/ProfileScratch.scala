package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import graft.enrich._
    import graft.ops.ColumnOps
    import graft.tables.TestTables

    val claims = TestTables.lineitem(spark, dir).select(
      col("l_orderkey").as("visit_id"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("uid"),
      col("l_partkey").as("svc"),
      col("l_shipdate"), col("l_linenumber"),
      when(col("l_orderkey") % 53 === 0 && col("l_linenumber") === 1, lit(null: String))
        .otherwise(concat(lit("ICD-"), (col("l_partkey") % 500).cast("string"))).as("icd10"))
    time("claims_scan")(claims)
    val noDx = LlmFanout.noDiagnosisVisits(claims, "visit_id", "icd10")
      .withColumnRenamed("visit_id", "__nodx_visit")
    time("noDx")(noDx)
    val kept = ColumnOps.dedupKeepFirst(claims, Seq("visit_id", "svc"),
      Seq(col("l_shipdate"), col("l_linenumber"), col("uid")))
    time("kept_window")(kept)
    val dupUids = claims.select(col("uid")).except(kept.select(col("uid")))
      .withColumnRenamed("uid", "__dup_uid")
    time("dupUids_except")(dupUids)
    val llmInput = claims
      .join(noDx, claims("visit_id") === col("__nodx_visit"), "left_anti")
      .join(dupUids, claims("uid") === col("__dup_uid"), "left_anti")
    time("llmInput")(llmInput)
    var t0 = System.nanoTime()
    val predicted = LlmFanout.predict(llmInput, "visit_id", "uid", () => new MockLlmClient())
      .select(col("uid"), col("medical_prediction"), col("reason"))
      .dropDuplicates("uid")
      .withColumnRenamed("uid", "__p_uid")
    println(f"predict_construct            ${(System.nanoTime() - t0) / 1e9}%.2f s")
    time("predict_materialize")(predicted)
    t0 = System.nanoTime()
    time("full_pipeline")(graft.pipeline.Pipelines.predictions(spark, dir))
    time("full_pipeline_again")(graft.pipeline.Pipelines.predictions(spark, dir))
    spark.stop()
  }
}
