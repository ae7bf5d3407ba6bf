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

  test("out-of-domain products fail with a readable error, not overflow") {
    // A huge threshDen shrinks the guard's n_a*n_b*k budget to 4, so
    // tiny snapshots exercise the exact raise_error path that a
    // trillion-row pair would hit with the default threshold.
    val ex = intercept[Exception] {
      Drift.tvd(Seq("x", "x", "y").toDF("cat"), Seq("x", "y").toDF("cat"),
        "cat", threshNum = 1, threshDen = Long.MaxValue / 4).collect()
    }
    val msg = Option(ex.getCause).map(_.toString).getOrElse("") + ex.toString
    assert(msg.contains("Drift.tvd domain"), s"want the domain error, got $ex")
    intercept[IllegalArgumentException] {
      Drift.tvd(Seq("x").toDF("cat"), Seq("x").toDF("cat"), "cat", 1, 0)
    }
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
