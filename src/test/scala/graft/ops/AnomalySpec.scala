package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnomalySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def stats(rows: Seq[(String, Long)], k: Int = 3) =
    Anomaly.madOutlierStats(rows.toDF("g", "v"), col("g"), col("v"), k)
      .select($"group_key", $"n", $"med", $"mad", $"n_outliers")
      .as[(String, Long, Double, Double, Long)].collect().map(r => r._1 -> r).toMap

  test("median/MAD and outlier count match the hand computation") {
    // values 1..9 plus a 1000 stray: med = 5.5, devs of the in-liers
    // 0.5..4.5, stray dev 994.5 -> MAD = median(0.5,1.5,...,4.5,994.5) = 2.5
    // outliers: dev > 7.5 -> only the stray.
    val vals = (1L to 9L).map(("a", _)) :+ ("a", 1000L)
    val s = stats(vals)("a")
    assert(s._2 == 10 && s._3 == 5.5 && s._4 == 2.5 && s._5 == 1)
  }

  test("odd count takes the exact middle; no outliers in a tight cluster") {
    val s = stats(Seq(("b", 10L), ("b", 12L), ("b", 14L)))("b")
    assert(s._3 == 12.0 && s._4 == 2.0 && s._5 == 0)
  }

  test("MAD = 0 (constant majority) flags every off-median value") {
    // five 7s and one 8: med 7, devs (0,0,0,0,0,1) -> MAD 0; 8 deviates.
    val s = stats(Seq.fill(5)(("c", 7L)) :+ ("c", 8L))("c")
    assert(s._4 == 0.0 && s._5 == 1)
  }

  test("groups are independent") {
    val out = stats(Seq(("a", 1L), ("a", 100L), ("b", 5L), ("b", 5L)))
    assert(out("a")._3 == 50.5 && out("b")._3 == 5.0)
  }

  test("duplicate values flow through the histogram with correct weight") {
    // (1,1,1,2,3): med = 1 (middle of 5), devs (0,0,0,1,2) -> MAD 0,
    // outliers = the 2 and the 3.
    val s = stats(Seq(1L, 1L, 1L, 2L, 3L).map(("d", _)))("d")
    assert(s._2 == 5 && s._3 == 1.0 && s._4 == 0.0 && s._5 == 2)
  }

  private def cusumOf(vals: Seq[Long], k: Long, h: Long): Seq[(Long, Long, Boolean)] =
    Anomaly.cusum(
        vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("t", "v").repartition(4),
        "t", "v", k, h)
      .orderBy("t").select("t", "cusum", "alarm")
      .as[(Long, Long, Boolean)].collect().toSeq

  test("cusum matches the sequential max(0, s+d) recursion exactly") {
    val vals = (0 until 200).map(i => (i * 37 % 23).toLong)
    val k = 11L
    val got = cusumOf(vals, k, h = 20L).map(_._2)
    var s = 0L
    val expect = vals.map { x => s = math.max(0L, s + (x - k)); s }
    assert(got == expect)
  }

  test("cusum resets to zero after deficits and re-accumulates; alarm is strict >") {
    // k=5: deltas (+5, -5, -5, +3, +2): s = 5, 0, 0, 3, 5
    val got = cusumOf(Seq(10L, 0L, 0L, 8L, 7L), k = 5L, h = 5L)
    assert(got.map(_._2) == Seq(5L, 0L, 0L, 3L, 5L))
    assert(got.map(_._3) == Seq(false, false, false, false, false),
      "h=5 with cusum exactly 5 must NOT alarm (strict >)")
  }

  test("grouped cusum runs the recursion independently per group") {
    val rows = for (g <- Seq("a", "b", "c"); t <- 0 until 50)
      yield (g, t.toLong, ((t * 37 + g.hashCode.abs) % 19).toLong)
    val got = Anomaly.cusumByGroup(rows.toDF("g", "t", "v").repartition(5),
        "g", "t", "v", k = 9L, h = 10L)
      .select("g", "t", "cusum").as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.sortBy(_._2).map(_._3).toSeq }
    rows.groupBy(_._1).foreach { case (g, xs) =>
      var s = 0L
      val expect = xs.sortBy(_._2).map { case (_, _, v) => s = math.max(0L, s + (v - 9L)); s }
      assert(got(g) == expect, s"group $g diverged")
    }
  }

  test("grouped cusum on one group equals the global-scan cusum") {
    val vals = (0 until 80).map(i => (i.toLong, (i * 41 % 13).toLong))
    val grouped = Anomaly.cusumByGroup(
        vals.map { case (t, v) => ("only", t, v) }.toDF("g", "t", "v"),
        "g", "t", "v", k = 6L, h = 4L)
      .orderBy("t").select("cusum", "alarm").as[(Long, Boolean)].collect().toSeq
    val global = Anomaly.cusum(vals.toDF("t", "v"), "t", "v", k = 6L, h = 4L)
      .orderBy("t").select("cusum", "alarm").as[(Long, Boolean)].collect().toSeq
    assert(grouped == global)
  }

  test("grouped cusum fails loud on Long overflow instead of wrapping") {
    // Two MaxValue points with k=0: a plain long window sum would wrap
    // to negative silently; the decimal prefix sum + range-checked cast
    // must raise instead (parity with cusum's addExact contract).
    val df = Seq(("g", 1L, Long.MaxValue), ("g", 2L, Long.MaxValue)).toDF("g", "t", "v")
    val e = intercept[Exception] {
      Anomaly.cusumByGroup(df, "g", "t", "v", k = 0L, h = 1L).collect()
    }
    assert(e.getMessage.contains("overflowed Long") ||
      Option(e.getCause).exists(_.getMessage.contains("overflowed Long")), e.getMessage)
  }

  test("cusum fails loud on NULL values") {
    val df = spark.sql("SELECT 1L AS t, CAST(NULL AS BIGINT) AS v")
    val e = intercept[Exception] { Anomaly.cusum(df, "t", "v", 0L, 1L).collect() }
    assert(e.getMessage.contains("NULL v") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL v")))
  }
}
