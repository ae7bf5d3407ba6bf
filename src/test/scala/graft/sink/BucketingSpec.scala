package graft.sink

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val facts = (1 to 2000).map(i => (i % 97, i, i * 2)).toDF("k", "a", "b")
  private lazy val dims = (0 until 97).map(i => (i, s"dim_$i")).toDF("k", "name")

  private def scratch(name: String) = graft.util.TempDirs.scratch(name)

  /** Run `body` with broadcast joins disabled so the co-location claim
    * is tested against the shuffle-based join path it exists for.
    */
  private def noBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-bucket-count join and bucket-key agg plan with zero exchanges") {
    val base = scratch("graft_bkt_spec")
    Bucketing.writeBucketed(facts, "bkt_facts", base + "/facts", Seq("k"), 8, Seq("k"))
    Bucketing.writeBucketed(dims, "bkt_dims", base + "/dims", Seq("k"), 8, Seq("k"))
    noBroadcast {
      val joined = Bucketing.table(spark, "bkt_facts")
        .join(Bucketing.table(spark, "bkt_dims"), Seq("k"))
        .groupBy($"k", $"name").agg(sum($"a").as("sum_a"), count(lit(1)).as("n"))
      joined.collect() // materialize so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join+agg must be shuffle-free:\n$plan")
      assert(!plan.contains("BroadcastExchange"), "broadcast is disabled in this test")
    }
  }

  test("bucketed layout does not change results vs the plain join") {
    val base = scratch("graft_bkt_eq")
    Bucketing.writeBucketed(facts, "bkt_f2", base + "/f2", Seq("k"), 8)
    Bucketing.writeBucketed(dims, "bkt_d2", base + "/d2", Seq("k"), 8)
    val bucketed = Bucketing.table(spark, "bkt_f2")
      .join(Bucketing.table(spark, "bkt_d2"), Seq("k"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val plain = facts.join(dims, Seq("k"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("unequal bucket counts fall back to a shuffle (the zero-exchange assertion is not vacuous)") {
    val base = scratch("graft_bkt_uneq")
    Bucketing.writeBucketed(facts, "bkt_f3", base + "/f3", Seq("k"), 8)
    Bucketing.writeBucketed(dims, "bkt_d3", base + "/d3", Seq("k"), 4)
    noBroadcast {
      val joined = Bucketing.table(spark, "bkt_f3")
        .join(Bucketing.table(spark, "bkt_d3"), Seq("k"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"),
        s"mismatched bucket counts must re-shuffle a side:\n$plan")
    }
  }
}
