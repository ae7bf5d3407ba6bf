package graft.ops

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** TVD drift monitor semantics. */
class DriftSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def run(a: Seq[String], b: Seq[String], num: Long = 1, den: Long = 100) =
    Drift.tvd(a.toDF("cat"), b.toDF("cat"), "cat", num, den)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getBoolean(6))).toMap

  test("identical distributions have zero numerators and no alarms") {
    val out = run(Seq("x", "x", "y"), Seq("x", "x", "y"))
    out("x") shouldBe ((2L, 2L, 0L, false))
    out("y") shouldBe ((1L, 1L, 0L, false))
  }

  test("proportional scaling is not drift") {
    // B is A duplicated 3x: proportions identical -> numerators 0.
    val a = Seq("x", "x", "y")
    val out = run(a, a ++ a ++ a)
    out.values.foreach(_._3 shouldBe 0L)
  }

  test("categories missing from one side count as zero and can alarm") {
    val out = run(Seq("x", "x", "gone"), Seq("x", "x"))
    out("gone")._2 shouldBe 0L
    out("gone")._4 shouldBe true // contribution 1/3 > 1%
  }

  test("threshold boundary is exact cross-multiplication") {
    // contribution of y: |1*100 - 2*100| / (2*100*100) = 100/20000 = 0.5%.
    val a = Seq.fill(99)("x") :+ "y"
    val b = Seq.fill(98)("x") ++ Seq("y", "y")
    run(a, b, 1, 200)("y")._4 shouldBe false // exactly 0.5% is NOT > 0.5%
    run(a, b, 1, 201)("y")._4 shouldBe true
  }
}
