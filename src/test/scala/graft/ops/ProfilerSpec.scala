package graft.ops

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("profile counts rows, non-nulls, distincts, and lexicographic bounds per column") {
    val df = Seq(
      (Some("a"), Some(10L)), (Some("a"), Some(9L)),
      (Some("b"), None), (None, Some(100L))
    ).toDF("s", "n")
    val p = Profiler.profile(df, Seq("s", "n"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(p == Seq(
      // lexicographic on stringified values: "10" < "100" < "9"
      ("n", 4L, 3L, 3L, "10", "9"),
      ("s", 4L, 3L, 2L, "a", "b")))
  }

  test("a single unpivot feeds every column profile — one scan, not n") {
    val df = (1 to 50).map(i => (i.toString, i.toLong, s"g${i % 3}")).toDF("a", "b", "c")
    val plan = Profiler.profile(df, Seq("a", "b", "c")).queryExecution.optimizedPlan.toString
    assert(plan.split("LocalRelation|Scan").length <= 3,
      s"profiling must not re-scan per column:\n$plan")
  }
}
