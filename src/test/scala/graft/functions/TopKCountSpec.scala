package graft.functions

import graft.SharedSpark
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class TopKCountSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  private def summaryOf(stream: Seq[String], capacity: Int): TopKCount.Summary = {
    val s = new TopKCount.Summary(capacity)
    stream.foreach(t => s.add(u(t)))
    s
  }

  private def report(s: TopKCount.Summary, k: Int): Seq[(String, Long, Long)] = {
    val arr = s.topK(k)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2))
    }
  }

  test("counter overflow fails loudly (addExact), never wraps silently") {
    val s = new TopKCount.Summary(4)
    s.add(u("big"), Long.MaxValue)
    intercept[ArithmeticException] { s.add(u("big"), 1L) }
  }

  test("wrong arity on the SQL builders raises a readable signature error, not an index error") {
    val e = intercept[Exception] {
      spark.sql("SELECT topk_count('a') FROM VALUES (1) t(x)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("topk_count expects 3 arguments")),
      s"got: ${messages(e).mkString(" | ")}")
  }

  test("exact regime: counts equal true frequencies, err = 0, deterministic order") {
    val stream = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    val out = report(summaryOf(Random.shuffle(stream), capacity = 10), k = 4)
    assert(out == Seq(("a", 5L, 0L), ("b", 3L, 0L), ("c", 3L, 0L), ("d", 1L, 0L)))
  }

  test("saturated regime: every entry brackets its true count (true <= cnt <= true + err)") {
    for (seed <- 0 until 50) {
      val rnd = new Random(seed)
      // Zipf-ish skew: id n maps to term n/4 — a few heavy, many light.
      val stream = Seq.fill(400)(s"t${rnd.nextInt(31) / 4}")
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val s = summaryOf(stream, capacity = 4)
      report(s, 4).foreach { case (term, cnt, err) =>
        val t = truth.getOrElse(term, 0L)
        assert(cnt >= t, s"seed $seed $term: estimate $cnt below true $t")
        assert(cnt - err <= t, s"seed $seed $term: lower bound ${cnt - err} above true $t")
      }
    }
  }

  test("heavy-hitter guarantee: any term with true count > N/capacity is reported") {
    val heavy = Seq.fill(50)("whale")
    val noise = (1 to 60).map(i => s"n$i") // 60 singletons
    val stream = Random.shuffle(heavy ++ noise)
    val cap = 8 // N = 110, threshold 13.75 < 50
    val out = report(summaryOf(stream, cap), cap)
    assert(out.headOption.exists(_._1 == "whale"))
  }

  test("merge matches the single-stream summary in the exact regime, any split") {
    val stream = Random.shuffle(
      Seq.fill(7)("x") ++ Seq.fill(5)("y") ++ Seq.fill(2)("z") ++ Seq("w"))
    val whole = report(summaryOf(stream, 16), 16)
    for (cut <- Seq(1, 5, 10, 14)) {
      val (a, b) = stream.splitAt(cut)
      val merged = summaryOf(a, 16).mergeWith(summaryOf(b, 16))
      assert(report(merged, 16) == whole, s"split at $cut diverged")
    }
  }

  test("merge of saturated summaries keeps upper-bound invariant") {
    val a = summaryOf((1 to 100).map(i => s"a${i % 6}"), capacity = 3)
    val b = summaryOf((1 to 80).map(i => s"b${i % 5}"), capacity = 3)
    val truth = ((1 to 100).map(i => s"a${i % 6}") ++ (1 to 80).map(i => s"b${i % 5}"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    report(a.mergeWith(b), 3).foreach { case (term, cnt, err) =>
      val t = truth.getOrElse(term, 0L)
      assert(cnt >= t && cnt - err <= t, s"$term: ($cnt, err $err) vs true $t")
    }
  }

  test("serialization round-trips") {
    val s = summaryOf(Seq.fill(9)("p") ++ Seq.fill(4)("q") ++ Seq("r", "s", "t"), capacity = 4)
    val back = TopKCount.Summary.fromBytes(s.toBytes)
    assert(report(back, 4) == report(s, 4))
  }

  test("end-to-end over DataFrames: partial aggregation across partitions stays exact") {
    val rows = (1 to 1000).map { i =>
      val term = if (i % 7 == 0) "seven" else if (i % 3 == 0) "three" else s"rare$i"
      ("g", term)
    }
    val df = rows.toDF("g", "term").repartition(8)
    val out = df.groupBy($"g")
      .agg(TopKCount.of($"term", 2, 2048).as("tk"))
      .selectExpr("inline(tk)")
      .as[(String, Long, Long)].collect().toSeq
    val threes = (1 to 1000).count(_ % 3 == 0) - (1 to 1000).count(i => i % 21 == 0)
    val sevens = (1 to 1000).count(_ % 7 == 0)
    assert(out == Seq(("three", threes.toLong, 0L), ("seven", sevens.toLong, 0L)))
  }

  test("topk_sum: weighted ordering in the exact regime; zero and null weights ignored") {
    val rows = Seq(
      ("g", "heavy", 100L), ("g", "heavy", 50L),
      ("g", "many", 1L), ("g", "many", 2L), ("g", "many", 3L),
      ("g", "zero", 0L)) ++ Seq(("g", null.asInstanceOf[String], 99L))
    val df = rows.toDF("g", "term", "w").repartition(3)
    val out = df.groupBy($"g")
      .agg(TopKSum.of($"term", $"w", 3, 16).as("tk"))
      .selectExpr("inline(tk)")
      .as[(String, Long, Long)].collect().toSeq
    // "zero" never accumulates weight, so it is absent; null terms skipped.
    assert(out == Seq(("heavy", 150L, 0L), ("many", 6L, 0L)))
  }

  test("ObjectHashAggregate with a partial stage carries the sketch (no raw-row shuffle)") {
    val df = (1 to 100).map(i => ("g", s"t${i % 5}")).toDF("g", "term").repartition(4)
    val agg = df.groupBy($"g").agg(TopKCount.of($"term", 3, 16).as("tk"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, "partial + final stages expected")
  }

  test("a throwing or NULL k literal fails ANALYSIS with a named error (DictMatch contract)") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // ANSI overflow inside the foldable literal: must surface as a named
    // TypeCheckFailure, not escape the analyzer as a raw ArithmeticException.
    val e1 = intercept[Exception] { spark.sql("SELECT topk_count(x, 2147483647 + 1, 10) FROM VALUES ('a') t(x)").collect() }
    assert(msgs(e1).exists(_.contains("failed to evaluate")), msgs(e1).mkString(" | "))
    // A NULL literal silently unboxes to 0 without the check.
    val e2 = intercept[Exception] { spark.sql("SELECT topk_count(x, CAST(NULL AS INT), 10) FROM VALUES ('a') t(x)").collect() }
    assert(msgs(e2).exists(_.contains("NULL literal")), msgs(e2).mkString(" | "))
  }
}
