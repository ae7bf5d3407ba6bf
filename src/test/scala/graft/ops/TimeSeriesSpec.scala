package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val facts = Seq(
    (1L, "2024-01-01", 10.0), (1L, "2024-01-04", 40.0),
    (2L, "2024-03-10", 5.0))
    .toDF("ent", "d", "v").withColumn("d", to_date($"d"))

  test("dateSpine densifies per entity within its OWN bounds") {
    val spine = TimeSeries.dateSpine(facts, "ent", "d")
      .as[(Long, java.sql.Date)].collect().toSet
    assert(spine.map(_._1) == Set(1L, 2L))
    assert(spine.count(_._1 == 1L) == 4, "Jan 1..4 inclusive")
    assert(spine.count(_._1 == 2L) == 1, "single-day entity stays one row")
    assert(!spine.exists { case (e, d) => e == 2L && d.toString != "2024-03-10" },
      "no global-calendar leakage across entities")
  }

  test("locf carries the last observation through gap days only") {
    val got = TimeSeries.locf(facts, "ent", "d", Seq("v"))
      .filter($"ent" === 1L).orderBy($"d")
      .select(date_format($"d", "yyyy-MM-dd"), $"v")
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 10.0), ("2024-01-02", 10.0),
      ("2024-01-03", 10.0), ("2024-01-04", 40.0)))
  }

  test("ewmaScaled matches the closed form exactly and is partitioning-invariant") {
    val rows = (0 until 30).map(i => (i % 2).toLong -> ((i * 7 + 3) % 11).toLong)
      .zipWithIndex.map { case ((e, v), i) => (e, i.toLong, v) }
    val df = rows.toDF("ent", "t", "v")
    val got = TimeSeries.ewmaScaled(df, "ent", "t", "v", k = 8)
      .select($"ent", $"t", $"ewma_scaled").as[(Long, Long, Long)].collect()
      .map { case (e, t, s) => ((e, t), s) }.toMap
    // Closed form on the driver: sum of lag*scale >> j over this
    // entity's own ordered history.
    val byEnt = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for (((e, t), s) <- got) {
      val hist = byEnt(e).takeWhile(_._2 <= t).map(_._3).reverse
      val expect = hist.take(8).zipWithIndex.map { case (v, j) => (v * 1000000L) >> j }.sum
      assert(s == expect, s"($e,$t): $s vs $expect")
    }
    // Partitioning-invariant: identical under a different layout.
    val b = df.repartition(7).orderBy($"v")
    val got2 = TimeSeries.ewmaScaled(b, "ent", "t", "v", k = 8)
      .select($"ent", $"t", $"ewma_scaled").as[(Long, Long, Long)].collect()
      .map { case (e, t, s) => ((e, t), s) }.toMap
    assert(got == got2)
  }

  test("ewmaScaled shares one window across all lags (single exchange, single sort)") {
    val df = (0 until 100).map(i => ((i % 3).toLong, i.toLong, (i % 7).toLong))
      .toDF("ent", "t", "v")
    val plan = TimeSeries.ewmaScaled(df, "ent", "t", "v", k = 12)
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).length == 1, s"12 lags must share one Window:\n$plan")
  }

  test("ewmaScaled domain guard: boundary value is exact, one past it raises") {
    // The admissible maximum is Long.MaxValue / (2*scale): value*scale
    // fits a long AND the k-term sum (< 2*value*scale) does too.
    val bound = Long.MaxValue / (2L * 1000000L)
    val ok = Seq((1L, 0L, bound), (1L, 1L, bound))
      .toDF("ent", "t", "v")
    val got = TimeSeries.ewmaScaled(ok, "ent", "t", "v", k = 8)
      .orderBy($"t").select($"ewma_scaled").as[Long].collect()
    // Row 0: bound*scale. Row 1: bound*scale + (bound*scale >> 1) — the
    // worst-case two-term sum, still inside a long, no silent wrap.
    assert(got(0) == bound * 1000000L)
    assert(got(1) == bound * 1000000L + ((bound * 1000000L) >> 1))
    assert(got(1) > 0L, "sum at the boundary must not wrap negative")

    val over = Seq((1L, 0L, bound + 1L)).toDF("ent", "t", "v")
    val e = intercept[Exception] {
      TimeSeries.ewmaScaled(over, "ent", "t", "v", k = 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("out of domain")), s"got: $e")

    val neg = Seq((1L, 0L, -1L)).toDF("ent", "t", "v")
    val e2 = intercept[Exception] {
      TimeSeries.ewmaScaled(neg, "ent", "t", "v", k = 8).collect()
    }
    assert(messages(e2).exists(_.contains("out of domain")), s"got: $e2")
  }

  test("a leading gap before the first observation stays NULL") {
    // entity 3 has null value on its first day — nothing to carry.
    val f = facts.unionByName(Seq((3L, "2024-05-01", null.asInstanceOf[java.lang.Double]),
      (3L, "2024-05-03", java.lang.Double.valueOf(7.0)))
      .toDF("ent", "d", "v").withColumn("d", to_date($"d")))
    val e3 = TimeSeries.locf(f, "ent", "d", Seq("v"))
      .filter($"ent" === 3L).orderBy($"d")
      .select($"v").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(e3.toSeq == Seq(None, None, Some(7.0)))
  }
}
