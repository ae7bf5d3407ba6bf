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

  test("running max equals the global-window prefix max, across partitions") {
    val df = spark.range(0, 500).select(
      (col("id") * 37 % 500).as("k"), (col("id") * 31 % 97).as("v"))
    val got = GlobalIndex.withRunningMax(df, Seq(col("k")), "v", numPartitions = 8)
      .select("k", "running_max").as[(Long, Long)].collect().sortBy(_._1)
    val vs = df.orderBy("k").select("v").as[Long].collect()
    val expect = vs.scanLeft(Long.MinValue)(math.max).tail
    got.map(_._2).toSeq shouldBe expect.toSeq
  }

  test("exclusive running max shifts by one row and is NULL for the first") {
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L), (4L, 1L)).toDF("k", "v")
    val got = GlobalIndex.withRunningMax(df, Seq(col("k")), "v", "pm",
        numPartitions = 2, inclusive = false)
      .select("k", "pm").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    got shouldBe Map(1L -> None, 2L -> Some(5L), 3L -> Some(5L), 4L -> Some(9L))
  }

  test("running max skips NULL values like SQL MAX and descends with the order") {
    val df = spark.sql(
      "SELECT * FROM VALUES (3L, 7L), (2L, CAST(NULL AS BIGINT)), (1L, 4L) AS t(k, v)")
    val got = GlobalIndex.withRunningMax(df, Seq(col("k").desc), "v", "rm", numPartitions = 2)
      .select("k", "rm").as[(Long, Long)].collect().toMap
    got shouldBe Map(3L -> 7L, 2L -> 7L, 1L -> 7L)
  }
}
