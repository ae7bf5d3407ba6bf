package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CohortsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("retention matrix counts each user once per day and anchors at the first day") {
    // u1: d0, d0 (dup), d1, d3;  u2: d0, d1;  u3: d1 only (later cohort).
    val ev = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 09:00:00"),
      (1L, "2024-01-02 08:00:00"), (1L, "2024-01-04 08:00:00"),
      (2L, "2024-01-01 23:00:00"), (2L, "2024-01-02 01:00:00"),
      (3L, "2024-01-02 12:00:00")
    ).toDF("user_id", "raw").withColumn("ts", to_timestamp($"raw"))
    val m = Cohorts.retention(ev, "user_id", "ts", maxDays = 30)
      .as[(java.sql.Date, Int, Long)].collect()
      .map { case (d, k, n) => (d.toString, k, n) }.toSet
    assert(m == Set(
      ("2024-01-01", 0, 2L), // u1 + u2, u1's dup day counted once
      ("2024-01-01", 1, 2L), // both active next day
      ("2024-01-01", 3, 1L), // only u1
      ("2024-01-02", 0, 1L)  // u3's own cohort
    ))
  }

  test("funnel stages require strictly-ordered completion, not mere presence") {
    // u1: full ordered funnel. u2: purchase BEFORE view — view stage
    // reached, purchase not. u3: signup only. u4: no signup — never
    // enters, despite view+purchase.
    val ev = Seq(
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "purchase", 30L),
      (2L, "signup", 10L), (2L, "purchase", 15L), (2L, "view", 20L),
      (3L, "signup", 10L),
      (4L, "view", 5L), (4L, "purchase", 9L)
    ).toDF("user_id", "event_type", "ts_us")
    val out = Cohorts.funnel(ev, "user_id", "event_type", "ts_us",
        Seq("signup", "view", "purchase"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "signup", 3L), (2, "view", 2L), (3, "purchase", 1L)))
  }

  test("a same-timestamp follow-up does not complete a stage (strictly after)") {
    val ev = Seq((1L, "signup", 10L), (1L, "view", 10L))
      .toDF("user_id", "event_type", "ts_us")
    val out = Cohorts.funnel(ev, "user_id", "event_type", "ts_us", Seq("signup", "view"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "signup", 1L), (2, "view", 0L)))
  }
}
