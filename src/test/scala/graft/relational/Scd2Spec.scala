package graft.relational

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class Scd2Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def cur(rows: (Long, Int, Option[Int], String)*) =
    rows.toDF("k", "valid_from", "valid_to", "seg")
  private def upd(rows: (Long, Int, String)*) = rows.toDF("k", "ts", "seg")

  private def out(current: org.apache.spark.sql.DataFrame,
                  updates: org.apache.spark.sql.DataFrame): Set[(Long, String, Int, Option[Int])] =
    Scd2.applyChanges(current, updates, "k", "ts", Seq("seg"))
      .as[(Long, String, Int, Option[Int])].collect().toSet

  test("a real change closes the open row and opens a new one") {
    val res = out(cur((1L, 10, None, "A")), upd((1L, 20, "B")))
    assert(res == Set((1L, "A", 10, Some(20)), (1L, "B", 20, None)))
  }

  test("a restated (identical) update collapses — no new version") {
    val res = out(cur((1L, 10, None, "A")), upd((1L, 20, "A")))
    assert(res == Set((1L, "A", 10, None)))
  }

  test("closed history is immutable; multi-update chain closes in ts order") {
    val res = out(
      cur((1L, 1, Some(10), "OLD"), (1L, 10, None, "A")),
      upd((1L, 20, "B"), (1L, 30, "A"), (1L, 40, "A")))
    assert(res == Set(
      (1L, "OLD", 1, Some(10)),
      (1L, "A", 10, Some(20)),
      (1L, "B", 20, Some(30)),
      (1L, "A", 30, None))) // revert is real; the 40 restatement collapses
  }

  test("a brand-new key starts its chain from the first update") {
    val res = out(cur(), upd((7L, 5, "X"), (7L, 9, "Y")))
    assert(res == Set((7L, "X", 5, Some(9)), (7L, "Y", 9, None)))
  }

  test("null payload transitions are null-safe changes") {
    val res = out(
      cur((1L, 10, None, "A")),
      Seq((1L, 20, null.asInstanceOf[String]), (1L, 30, "A")).toDF("k", "ts", "seg"))
    assert(res == Set((1L, "A", 10, Some(20)), (1L, null, 20, Some(30)), (1L, "A", 30, None)))
  }

  test("late updates (ts before the open valid_from) are dropped, never overlap closed history") {
    val res = out(
      cur((1L, 1, Some(10), "OLD"), (1L, 10, None, "A")),
      upd((1L, 5, "LATE"), (1L, 20, "B"))) // 5 < open valid_from 10
    assert(res == Set(
      (1L, "OLD", 1, Some(10)),
      (1L, "A", 10, Some(20)),
      (1L, "B", 20, None)),
      "the ts=5 update would overlap the immutable [1,10) history row and must be discarded")
  }

  test("a fully-closed key rejects updates inside its closed history") {
    // Key 1 has ONLY closed rows (no open row). The old guard keyed on
    // the open valid_from — null here — and admitted ts=5 INSIDE the
    // immutable [1, 10) interval, creating overlapping validity.
    val res = out(
      cur((1L, 1, Some(10), "OLD")),
      upd((1L, 5, "LATE"), (1L, 20, "B")))
    assert(res == Set(
      (1L, "OLD", 1, Some(10)),
      (1L, "B", 20, None)),
      s"ts=5 overlaps the closed [1,10) row and must be discarded: $res")
  }

  test("an update at exactly the open valid_from deterministically supersedes it") {
    // ts == open valid_from: a same-instant restatement. The update
    // must win (ordering by ts alone broke the tie arbitrarily per
    // run), and the superseded zero-width [10,10) version must not
    // pollute the history.
    val res = out(cur((1L, 10, None, "A")), upd((1L, 10, "B")))
    assert(res == Set((1L, "B", 10, None)), s"the same-instant update must win: $res")
    // An identical same-instant restatement collapses to the open row.
    val same = out(cur((1L, 10, None, "A")), upd((1L, 10, "A")))
    assert(same == Set((1L, "A", 10, None)), s"identical restatement collapses: $same")
  }

  test("empty payload list is rejected with a readable message") {
    intercept[IllegalArgumentException] {
      Scd2.applyChanges(cur((1L, 10, None, "A")), upd((1L, 20, "B")), "k", "ts", Seq.empty)
    }
  }

  test("open+updates shuffle once: the three window passes share a single exchange") {
    val plan = Scd2.applyChanges(
        cur((1L, 10, None, "A")), upd((1L, 20, "B")), "k", "ts", Seq("seg"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"rank/change/close windows must share one key exchange:\n$plan")
  }
}
