package graft.scale

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locks Spark's runtime bloom-filter join pruning for the engine's
  * selective-join shape: a fact scan joined to a heavily-filtered
  * build side gets a bloom filter injected on the fact's join key, so
  * at 100 TB the fact scan drops non-matching rows before the shuffle
  * instead of shuffling everything into the join. The thresholds here
  * are shrunk to fire on test data — production leaves the defaults,
  * where the same rule triggers on genuinely large scans.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("selective dimension filter injects a bloom filter on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      // Force the shuffle-join path: broadcast joins don't need (or
      // get) a runtime filter, the build side already prunes the probe.
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.tables.TestTables.lineitem(spark, dir)
      val part = graft.tables.TestTables.part(spark, dir)
        .filter(col("p_brand") === "Brand#11" && lower(col("p_name")).like("%green%"))
      val joined = li.join(part, li("l_partkey") === part("p_partkey"))
        .select(col("l_orderkey"), col("p_name"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"selective join must inject a runtime bloom filter on the fact scan:\n$plan")
      // And it must actually run: same answer as the unfiltered plan.
      assert(joined.count() ==
        li.join(broadcast(part), li("l_partkey") === part("p_partkey")).count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
