package graft.functions

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val W = 256
  private val D = 4

  test("estimates never undercount and match the min-over-rows ground truth exactly") {
    // Zipf-ish counts: value v appears (v % 17) + 1 times.
    val rows = (0L until 300L).flatMap(v => Seq.fill((v % 17).toInt + 1)(v.toString))
    val df = rows.toDF("v").repartition(13)
    val sketch = df.agg(CountMin.agg($"v", W, D).as("sk"))
    val est = df.distinct().crossJoin(sketch)
      .select($"v", CountMin.estimate($"sk", $"v").as("e"))
      .as[(String, Long)].collect().toMap
    // Ground truth: replay the grid on the driver with the same buckets.
    val trueCounts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val grid = Array.fill(D, W)(0L)
    for (v <- rows; i <- 0 until D) grid(i)(CountMin.bucket(v, i, W)) += 1
    for ((v, n) <- trueCounts) {
      val expected = (0 until D).map(i => grid(i)(CountMin.bucket(v, i, W))).min
      assert(est(v) == expected, s"$v: engine ${est(v)} vs replay $expected")
      assert(est(v) >= n, s"$v: estimate ${est(v)} under true count $n")
    }
  }

  test("an unseen probe with empty buckets estimates zero; nulls are skipped") {
    val df = Seq(Some("a"), Some("a"), None).toDF("v")
    val sk = df.agg(CountMin.agg($"v", W, D).as("sk"))
    val out = sk.select(
        CountMin.estimate($"sk", lit("a")).as("ea"),
        CountMin.estimate($"sk", lit("definitely-absent-xyzzy")).as("eu"))
      .as[(Long, Long)].head()
    assert(out._1 == 2L)
    assert(out._2 <= 2L, "unseen probe bounded by collisions only")
  }

  test("cm_merge_agg rollup of per-day grids estimates identically to the flat grid") {
    val rows = (0L until 600L).map(i => (i % 20, (i % 37).toString))
    val df = rows.toDF("day", "v").repartition(9)
    val flat = df.agg(CountMin.agg($"v", W, D).as("sk"))
    val rolled = df.groupBy($"day").agg(CountMin.agg($"v", W, D).as("sk"))
      .agg(CountMin.mergeAgg($"sk").as("sk"))
    val probes = (0 until 37).map(_.toString)
    def est(sk: org.apache.spark.sql.DataFrame) = probes.map { p =>
      p -> sk.select(CountMin.estimate($"sk", lit(p))).as[Long].head()
    }.toMap
    assert(est(flat) == est(rolled), "CM linearity: rollup must equal flat")
  }

  test("cm_merge_agg rejects grids with different dimensions") {
    val a = Seq("x").toDF("v").agg(CountMin.agg($"v", W, D).as("sk"))
    val b = Seq("x").toDF("v").agg(CountMin.agg($"v", W, 2).as("sk"))
    intercept[Exception] {
      a.union(b).agg(CountMin.mergeAgg($"sk")).collect()
    }
  }

  test("a non-sketch binary is rejected readably") {
    val bad = Seq(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)).toDF("sk")
    intercept[Exception] {
      bad.select(CountMin.estimate($"sk", lit("x"))).collect()
    }
  }

  test("cm_estimate over a zero-row cm_merge_agg rollup yields zero, like the bitmap family") {
    val none = spark.emptyDataset[Array[Byte]].toDF("sk")
    val out = none.agg(CountMin.mergeAgg($"sk").as("sk"))
      .select(CountMin.estimate($"sk", lit("anything")))
      .as[Long].head()
    assert(out == 0L, "empty rollup is the zero sketch, not a runtime error")
  }

  test("plan shape: only grids shuffle (partial ObjectHashAggregate stages)") {
    val df = spark.range(0, 2000).repartition(8).select(col("id").cast("string").as("v"))
    val plan = df.groupBy(col("v").substr(1, 1).as("g"))
      .agg(CountMin.agg($"v", W, D).as("sk"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("a throwing or NULL w literal fails ANALYSIS with a named error (DictMatch contract)") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // ANSI overflow inside the foldable literal: must surface as a named
    // TypeCheckFailure, not escape the analyzer as a raw ArithmeticException.
    val e1 = intercept[Exception] { spark.sql("SELECT cm_agg(x, 2147483647 + 1, 4) FROM VALUES ('a') t(x)").collect() }
    assert(msgs(e1).exists(_.contains("failed to evaluate")), msgs(e1).mkString(" | "))
    // A NULL literal silently unboxes to 0 without the check.
    val e2 = intercept[Exception] { spark.sql("SELECT cm_agg(x, CAST(NULL AS INT), 4) FROM VALUES ('a') t(x)").collect() }
    assert(msgs(e2).exists(_.contains("NULL literal")), msgs(e2).mkString(" | "))
  }
}
