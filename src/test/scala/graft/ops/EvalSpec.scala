package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EvalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def evalRow(rows: Seq[(Long, Long)], threshold: Long = 0L) = {
    val df = rows.toDF("score", "y").repartition(4)
    Eval.binaryEval(df, "score", "y", threshold).collect().head
  }

  test("hand-computed AUC with ties (average-rank handling)") {
    // scores: pos at {3, 1, 1}, neg at {2, 1, 0}.
    // Pairs (pos, neg): 3 beats 2,1,0 (3); 1 beats 0 (1) twice, ties 1
    // (0.5) twice, loses to 2 — AUC = (3 + 2*1 + 2*0.5) / 9 = 6/9.
    val r = evalRow(Seq((3L, 1L), (1L, 1L), (1L, 1L), (2L, 0L), (1L, 0L), (0L, 0L)))
    r.getAs[Long]("n_pos") shouldBe 3L
    r.getAs[Long]("n_neg") shouldBe 3L
    r.getAs[Long]("auc2_num") shouldBe 12L // 2 * 6
    r.getAs[Long]("auc2_den") shouldBe 18L // 2 * 9
  }

  test("perfect separation gives AUC exactly 1; reversed gives exactly 0") {
    val perfect = evalRow(Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L)))
    perfect.getAs[Long]("auc2_num") shouldBe perfect.getAs[Long]("auc2_den")
    val reversed = evalRow(Seq((1L, 1L), (2L, 1L), (9L, 0L), (10L, 0L)))
    reversed.getAs[Long]("auc2_num") shouldBe 0L
    reversed.getAs[Long]("auc2_den") shouldBe 8L
  }

  test("all-tied scores give AUC exactly 1/2") {
    val r = evalRow(Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L), (5L, 0L)))
    // auc2_num = n_pos * n_neg (every pair a half-win) = 6; den = 12.
    r.getAs[Long]("auc2_num") shouldBe 6L
    r.getAs[Long]("auc2_den") shouldBe 12L
  }

  test("confusion quadrant at the threshold; boundary score counts as negative prediction") {
    val r = evalRow(
      Seq((5L, 1L), (0L, 1L), (-1L, 1L), (5L, 0L), (0L, 0L)), threshold = 0L)
    r.getAs[Long]("tp") shouldBe 1L // score 5, y 1
    r.getAs[Long]("fn") shouldBe 2L // scores 0 and -1 (0 is NOT > 0)
    r.getAs[Long]("fp") shouldBe 1L // score 5, y 0
    r.getAs[Long]("tn") shouldBe 1L // score 0, y 0
  }

  test("NULL scores fail loud (cross-engine NULL ordering would skew the rank statistic)") {
    val withNull = spark.sql("SELECT CAST(NULL AS BIGINT) AS score, 1L AS y")
    val e = intercept[Exception] { Eval.binaryEval(withNull, "score", "y").collect() }
    e.getMessage should include("NULL score")
    val e2 = intercept[Exception] {
      Eval.calibrationBins(withNull, "score", "y").collect()
    }
    e2.getMessage should include("NULL score")
  }

  test("labels outside {0,1} and NULL labels fail loud") {
    val bad = Seq((1L, 2L)).toDF("score", "y")
    val e = intercept[Exception] {
      Eval.binaryEval(bad, "score", "y").collect()
    }
    e.getMessage should include("must be 0 or 1")
    val withNull = spark.sql("SELECT 1L AS score, CAST(NULL AS BIGINT) AS y")
    val e2 = intercept[Exception] {
      Eval.binaryEval(withNull, "score", "y").collect()
    }
    e2.getMessage should include("must be 0 or 1")
  }

  test("calibration bins: equal-frequency, deterministic under heavy ties, counts match brute force") {
    val rows = (0 until 403).map { i =>
      ((i * 37 % 11).toLong, (i * 31 % 3 == 0): Boolean)
    }.map { case (s, b) => (s, if (b) 1L else 0L) }
    val df = rows.toDF("score", "y").repartition(6)
    val got = Eval.calibrationBins(df, "score", "y", bins = 10)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long)].collect()
    got.map(_._2).sum shouldBe 403L
    // equal-frequency: sizes differ by at most 1
    (got.map(_._2).max - got.map(_._2).min) should be <= 1L
    // brute force: sort by (score, y), cut at rank*10/n
    val sorted = rows.sortBy(identity)
    val expect = sorted.zipWithIndex
      .groupBy { case (_, r) => r.toLong * 10 / 403 }
      .map { case (bin, xs) =>
        (bin, xs.size.toLong, xs.map(_._1._2).sum,
          xs.map(_._1._1).min, xs.map(_._1._1).max)
      }.toSeq.sortBy(_._1)
    got.toSeq shouldBe expect
  }

  test("matches a brute-force pair count on irregular data across partitions") {
    val rows = (0 until 400).map { i =>
      val score = (i * 37 % 23).toLong // heavy ties
      val y = (i * 31 % 5 < 2): Boolean
      (score, if (y) 1L else 0L)
    }
    val r = evalRow(rows)
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    // brute force: 2 * (wins + 0.5 * ties) over all pos x neg pairs
    var num2 = 0L
    for (p <- pos; n <- neg) {
      if (p > n) num2 += 2L else if (p == n) num2 += 1L
    }
    r.getAs[Long]("auc2_num") shouldBe num2
    r.getAs[Long]("auc2_den") shouldBe 2L * pos.size * neg.size
  }
}
