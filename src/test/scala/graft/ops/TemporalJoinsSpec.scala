package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("asOf attaches the latest right row at or before each left row, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"), (3L, 50L, "d"))
      .toDF("k", "ts_us", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 9L, 300L))
      .toDF("k", "ts_us", "payload")
    val out = TemporalJoins.asOf(left, right, "k", "ts_us", Seq("payload"))
      .select($"tag", $"asof_payload").as[(String, Option[Long])].collect().toMap
    assert(out("a").contains(100L), "equal timestamp is inclusive")
    assert(out("b").contains(200L), "latest preceding wins")
    assert(out("c").isEmpty, "right row after the left row must not match")
    assert(out("d").isEmpty, "key with no right rows gets null")
  }

  test("asOfDirected forward attaches the earliest right row at or after each left row") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"), (3L, 50L, "d"))
      .toDF("k", "ts_us", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 3L, 300L))
      .toDF("k", "ts_us", "payload")
    val out = TemporalJoins.asOfDirected(left, right, "k", "ts_us", Seq("payload"), "forward")
      .select($"tag", $"asof_payload").as[(String, Option[Long])].collect().toMap
    assert(out("a").contains(100L), "equal timestamp is inclusive going forward")
    assert(out("b").isEmpty, "no right row follows ts 25")
    assert(out("c").isEmpty, "right row before the left row must not match forward")
    assert(out("d").isEmpty, "key with no right rows gets null")
  }

  test("asOfDirected nearest picks the closer side and ties go backward") {
    val left = Seq((1L, 10L, "near_b"), (1L, 19L, "near_f"), (1L, 15L, "tie"))
      .toDF("k", "ts_us", "tag")
    val right = Seq((1L, 9L, 100L), (1L, 21L, 200L)).toDF("k", "ts_us", "payload")
    val out = TemporalJoins.asOfDirected(left, right, "k", "ts_us", Seq("payload"), "nearest")
      .select($"tag", $"asof_payload").as[(String, Option[Long])].collect().toMap
    assert(out("near_b").contains(100L), "1 back beats 11 forward")
    assert(out("near_f").contains(200L), "2 forward beats 10 back")
    assert(out("tie").contains(100L), "equidistant resolves backward")
  }

  test("asOfDirected nearest falls back to the only available side") {
    val left = Seq((1L, 1L, "only_f"), (2L, 99L, "only_b")).toDF("k", "ts_us", "tag")
    val right = Seq((1L, 50L, 500L), (2L, 10L, 600L)).toDF("k", "ts_us", "payload")
    val out = TemporalJoins.asOfDirected(left, right, "k", "ts_us", Seq("payload"), "nearest")
      .select($"tag", $"asof_payload").as[(String, Option[Long])].collect().toMap
    assert(out("only_f").contains(500L) && out("only_b").contains(600L))
  }

  test("null left timestamps yield null payloads in every direction") {
    val left = Seq((1L, Some(10L), "ok"), (1L, None, "null_ts"))
      .toDF("k", "ts_us", "tag")
    val right = Seq((1L, 5L, 100L), (1L, 20L, 200L)).toDF("k", "ts_us", "payload")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = TemporalJoins.asOfDirected(left, right, "k", "ts_us", Seq("payload"), dir)
        .select($"tag", $"asof_payload").as[(String, Option[Long])].collect().toMap
      assert(out("null_ts").isEmpty, s"null-ts left row must not match in $dir")
      assert(out("ok").nonEmpty, s"real left row still matches in $dir")
    }
  }

  test("null-key and null-ts right rows never match any left row") {
    val left = Seq((1L, Some(10L), "a"), (2L, None: Option[Long], "b"))
      .toDF("k", "ts_us", "tag")
      .select($"k", $"ts_us", $"tag")
    val right = Seq(
      (Some(1L), Some(1L), 100L),       // real candidate for "a"
      (Some(1L), None: Option[Long], 666L), // null-ts right: invisible
      (None: Option[Long], Some(1L), 777L)) // null-key right: invisible
      .toDF("k", "ts_us", "payload")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = TemporalJoins.asOfDirected(left, right, "k", "ts_us", Seq("payload"), dir)
        .select($"tag", $"asof_payload").as[(String, Option[Long])].collect().toMap
      assert(!out.values.flatten.exists(v => v == 666L || v == 777L),
        s"null-keyed/null-ts right rows leaked a payload in $dir")
      assert(out("b").isEmpty, s"null-ts left with null-key rights stays null in $dir")
    }
  }

  test("asOf output keeps exactly the left rows") {
    val left = Seq((1L, 10L), (1L, 10L), (9L, 1L)).toDF("k", "ts_us")
    val right = Seq((1L, 3L, 7L)).toDF("k", "ts_us", "payload")
    val out = TemporalJoins.asOf(left, right, "k", "ts_us", Seq("payload"))
    assert(out.count() == 3, "duplicates on the left survive as-is")
    assert(out.columns.toSeq == Seq("k", "ts_us", "asof_payload"))
  }

  test("bandJoin matches containment exactly once even when intervals span bands") {
    val rows = Seq((1L, 150L), (2L, 999L), (3L, 4500L)).toDF("id", "ts_us")
    // Interval [100, 4600] spans many width-1000 bands; each row must
    // match it exactly once. [5000, 6000] catches nothing.
    val intervals = Seq((100L, 4600L, "wide"), (5000L, 6000L, "empty"))
      .toDF("start_us", "end_us", "name")
    val out = TemporalJoins.bandJoin(rows, intervals, Seq.empty, "ts_us",
      "start_us", "end_us", bandWidth = 1000L)
    assert(out.count() == 3)
    assert(out.filter($"name" === "empty").count() == 0)
    assert(out.select($"id").distinct().count() == 3, "no duplicate matches across bands")
  }

  test("bandJoin with keys only matches intervals of the same key") {
    val rows = Seq((1L, 10L, 500L), (2L, 20L, 500L)).toDF("id", "k", "ts_us")
    val intervals = Seq((10L, 0L, 1000L)).toDF("k", "start_us", "end_us")
    val out = TemporalJoins.bandJoin(rows, intervals, Seq("k"), "ts_us",
      "start_us", "end_us", bandWidth = 1000L)
    assert(out.select($"id").as[Long].collect().toSeq == Seq(1L))
  }

  test("incidentWindows bridges small gaps and splits on large ones") {
    // Buckets (width 10): 0,1,2 | gap of 5 | 8,9 with maxGap 2 → two runs.
    val rows = Seq(5L, 12L, 25L, 83L, 97L).toDF("ts_us")
    val out = TemporalJoins.incidentWindows(rows, "ts_us", bucketUs = 10L, maxGapBuckets = 2)
      .select($"start_us", $"end_us", $"n_buckets").as[(Long, Long, Long)].collect().sorted
    assert(out.toSeq == Seq((0L, 29L, 3L), (80L, 99L, 2L)))
  }
}
