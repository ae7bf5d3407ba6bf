package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GlobalIndexSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("indexes are a dense 0..n-1 sequence following the total order") {
    val df = spark.range(0, 1000).select(
      (col("id") * 37 % 1000).as("k"), col("id").as("orig"))
    val out = GlobalIndex.withGlobalIndex(df, Seq(col("k")))
      .select("k", "global_idx").as[(Long, Long)].collect().sortBy(_._2)
    out.map(_._2).toSeq shouldBe (0L until 1000L)
    out.map(_._1).toSeq shouldBe out.map(_._1).sorted.toSeq
  }

  test("spans multiple partitions — no single-task funnel") {
    val df = spark.range(0, 500).select(col("id").as("k"))
    val indexed = GlobalIndex.withGlobalIndex(df, Seq(col("k")), numPartitions = 8)
    assert(indexed.rdd.getNumPartitions > 1,
      "offsets must span multiple partitions to prove the path")
    val out = indexed.select("k", "global_idx").as[(Long, Long)].collect()
    out.foreach { case (k, i) => assert(k == i) }
  }

  test("running total equals the global-window prefix sum, across partitions") {
    val df = spark.range(0, 500).select(
      (col("id") * 37 % 500).as("k"), (col("id") % 7 + 1).as("v"))
    val got = GlobalIndex.withRunningTotal(df, Seq(col("k")), "v", numPartitions = 8)
      .select("k", "running_total").as[(Long, Long)].collect().sortBy(_._1)
    val expect = df.orderBy("k").select("v").as[Long].collect().scanLeft(0L)(_ + _).tail
    got.map(_._2).toSeq shouldBe expect.toSeq
  }

  test("running total rejects non-long value columns") {
    val df = Seq((1L, 0.5)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      GlobalIndex.withRunningTotal(df, Seq(col("k")), "v")
    }
  }

  test("all original columns survive") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val out = GlobalIndex.withGlobalIndex(df, Seq(col("k")))
      .select("k", "v", "global_idx").as[(Long, String, Long)].collect().sortBy(_._3)
    out.toSeq shouldBe Seq((1L, "a", 0L), (2L, "b", 1L), (3L, "c", 2L))
  }
}
