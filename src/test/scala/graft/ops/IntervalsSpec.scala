package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class IntervalsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def profile(iv: Seq[(Long, Long)]): Map[Long, Long] =
    Intervals.concurrency(iv.toDF("s", "e").repartition(4), "s", "e")
      .as[(Long, Long)].collect().toMap

  test("hand case: overlapping intervals stack; half-open touch does not") {
    // [0,10) [5,15): overlap on [5,10). [15,20) touches [5,15) at 15 — no overlap.
    val got = profile(Seq((0L, 10L), (5L, 15L), (15L, 20L)))
    got shouldBe Map(0L -> 1L, 5L -> 2L, 10L -> 1L, 15L -> 1L, 20L -> 0L)
  }

  test("count returns to zero after the last end; never negative") {
    val got = profile(Seq((1L, 2L), (3L, 4L), (2L, 3L)))
    got(4L) shouldBe 0L
    got.values.foreach(v => assert(v >= 0L))
  }

  test("empty interval [t,t) nets zero at its own boundary") {
    val got = profile(Seq((0L, 10L), (5L, 5L)))
    got(5L) shouldBe 1L // unchanged by the empty interval
  }

  test("matches a brute-force point count on irregular data") {
    val iv = (0 until 200).map(i => ((i * 37 % 100).toLong, (i * 37 % 100 + 1 + i % 9).toLong))
    val got = profile(iv)
    got.foreach { case (t, n) =>
      val brute = iv.count { case (s, e) => s <= t && t < e }
      assert(n == brute, s"at t=$t: got $n, brute $brute")
    }
  }

  test("end before start and NULL endpoints fail loud") {
    val e1 = intercept[Exception] { profile(Seq((5L, 3L))) }
    e1.getMessage should include("need non-NULL")
    val withNull = spark.sql("SELECT 1L AS s, CAST(NULL AS BIGINT) AS e")
    val e2 = intercept[Exception] {
      Intervals.concurrency(withNull, "s", "e").collect()
    }
    e2.getMessage should include("need non-NULL")
  }
}
