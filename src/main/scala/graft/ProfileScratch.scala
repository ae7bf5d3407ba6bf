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
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base0 = graft.relational.EligibilityExtract.build(spark, dir)
      .select(col("visit_id"), col("patient_id"))
    time("elig_base_extract")(base0)
    val t0 = System.nanoTime()
    val base = graft.util.Materialize.once(base0)
    println(f"elig_base_materialize        ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val iqama = graft.enrich.EnrichOperator.enrichUniqueKeys(base, "patient_id",
      () => new graft.enrich.MockBeneficiaryClient())
    time("iqama_enrich")(iqama)
    println(f"iqama_total                  ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val t2 = System.nanoTime()
    val withPayload = base.withColumn("__payload", col("visit_id").cast("string"))
    val submitted = graft.enrich.EnrichOperator.enrich(withPayload, "__payload",
      () => new graft.enrich.MockEligibilityClient())
    time("submit_enrich_raw")(submitted)
    println(f"submit_total                 ${(System.nanoTime() - t2) / 1e9}%.2f s")
    val b = graft.parse.FhirParser.parsed(col("response"))
    val eligSel = submitted.select(
      col("visit_id").as("__ev"),
      graft.parse.FhirParser.outcome(b).as("outcome"),
      graft.parse.FhirParser.siteEligibility(b).as("class"),
      graft.parse.FhirParser.note(b).as("note"),
      graft.parse.FhirParser.approvalLimit(col("response"), lit("structured")).as("approval_limit"),
      graft.parse.FhirParser.copayMaximum(col("response"), lit("structured")).as("copay_maximum"))
    time("fhir_parse")(eligSel)
    time("pipeline_eligibility_full")(graft.pipeline.Pipelines.eligibility(spark, dir))
    spark.stop()
  }
}
