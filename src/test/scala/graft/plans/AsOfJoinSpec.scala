package graft.plans

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of operator: semantics locked to the composed
  * union+window form, physical shape locked to merge-join.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("matches the composed asOf on a messy fixture") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (1L, 10L, "a2"), (2L, 5L, "c"),
      (3L, 50L, "d"), (4L, 1L, "e")).toDF("k", "ts_us", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 9L, 300L), (9L, 1L, 400L))
      .toDF("k", "ts_us", "payload")
    val native = NativeAsOf.asOf(left, right, "k", "ts_us", Seq("payload"))
      .select($"tag", $"asof_payload").as[(String, Option[Long])].collect().toMap
    val composed = graft.ops.TemporalJoins.asOf(left, right, "k", "ts_us", Seq("payload"))
      .select($"tag", $"asof_payload").as[(String, Option[Long])].collect().toMap
    assert(native == composed)
    assert(native("a").contains(100L) && native("b").contains(200L))
    assert(native("c").isEmpty && native("d").isEmpty && native("e").isEmpty)
  }

  test("equivalence on the real events table") {
    val e = graft.tables.TestTables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
    val purchases = e.filter(col("event_type") === "purchase").drop("event_type")
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us")).agg(max(col("event_id")).as("click_id"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("asof_click_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val native = key(NativeAsOf.asOf(purchases, clicks, "user_id", "ts_us", Seq("click_id")))
    val composed = key(graft.ops.TemporalJoins.asOf(purchases, clicks, "user_id", "ts_us", Seq("click_id")))
    assert(native == composed, s"native ${native.size} vs composed ${composed.size}")
    assert(native.exists(_._2.isDefined) && native.exists(_._2.isEmpty),
      "fixture must exercise both matched and unmatched rows")
  }

  test("physical plan is the native exec fed by per-side sorts, not a union window") {
    val left = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("ts_us"))
    val right = spark.range(50).select(col("id").as("k"), (col("id") * 7).as("ts_us"),
      col("id").as("payload"))
    val plan = NativeAsOf.asOf(left, right, "k", "ts_us", Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan) // exec node (nodeName strips Exec)
    assert(!plan.contains("Window"), "must not fall back to the window form")
    assert(!plan.contains("Union"), "must not fall back to the union form")
  }

  test("pre-partitioned children with unequal partition counts are re-exchanged, not zipped raw") {
    // A child can satisfy ClusteredDistribution(key) with ANY hash
    // partition count; zipPartitions requires the counts to MATCH.
    // This case feeds the exec children pre-hashed on the join key at
    // deliberately different counts (7 vs 13) and asserts the planner
    // leaves the exec with equal-count children and correct results —
    // the contract the round-6 audit flagged as unlocked.
    val left = spark.range(200)
      .select((col("id") % 20).as("k"), (col("id") * 10).as("ts_us"), col("id").as("tag"))
      .repartition(7, col("k"))
    val right = spark.range(100)
      .select((col("id") % 20).as("k"), (col("id") * 7).as("ts_us"), col("id").as("payload"))
      .repartition(13, col("k"))
    val out = NativeAsOf.asOf(left, right, "k", "ts_us", Seq("payload"))
    out.count() // materialize so the adaptive plan is final
    val finalPlan = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val execs = finalPlan.collect { case e: AsOfJoinExec => e }
    assert(execs.nonEmpty, finalPlan.toString)
    for (e <- execs) {
      val ln = e.left.outputPartitioning.numPartitions
      val rn = e.right.outputPartitioning.numPartitions
      assert(ln == rn, s"zipPartitions would see $ln vs $rn partitions:\n" +
        out.queryExecution.executedPlan.toString)
    }
    // Semantics survive the re-exchange: agree with the composed form.
    val native = out.select($"tag", $"asof_payload")
      .as[(Long, Option[Long])].collect().toMap
    val composed = graft.ops.TemporalJoins
      .asOf(left, right, "k", "ts_us", Seq("payload"))
      .select($"tag", $"asof_payload").as[(Long, Option[Long])].collect().toMap
    assert(native == composed)

    // Nastier: RANGE-partitioned left at the SAME count as the hashed
    // right also satisfies ClusteredDistribution(k) — equal counts, so
    // zipPartitions would NOT throw; it would silently pair keys from
    // different partition layouts. The planner must detect the
    // incompatible shuffle specs and re-exchange.
    val rangedLeft = left.repartitionByRange(13, col("k"), col("ts_us"))
    val out2 = NativeAsOf.asOf(rangedLeft, right, "k", "ts_us", Seq("payload"))
    val native2 = out2.select($"tag", $"asof_payload")
      .as[(Long, Option[Long])].collect().toMap
    assert(native2 == composed,
      "range-vs-hash co-partitioning must be re-exchanged, not zipped by position")
  }

  test("null right timestamps and keys never match") {
    val left = Seq((1L, 10L)).toDF("k", "ts_us")
    val right = Seq((Some(1L), Some(5L), 100L), (Some(1L), None, 200L), (None, Some(5L), 300L))
      .toDF("k", "ts_us", "payload")
    val out = NativeAsOf.asOf(left, right, "k", "ts_us", Seq("payload"))
      .select($"asof_payload").as[Option[Long]].head()
    assert(out.contains(100L))
  }

  test("non-long key is rejected with a readable error") {
    val df = Seq(("x", 1L)).toDF("k", "ts_us")
    val err = intercept[IllegalArgumentException] {
      NativeAsOf.asOf(df, df, "k", "ts_us", Seq.empty)
    }
    assert(err.getMessage.contains("LongType"))
  }
}
