package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Randomized equivalence for the late-round analysis operators: each
  * distributed formulation must agree with its obvious sequential /
  * quadratic mirror on arbitrary inputs — ties, duplicates, skewed
  * keys, empty-ish inputs.
  */
object OpsProps extends Properties("AnalysisOps") {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // Spark jobs per case: keep the case count moderate.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val scoreGen = Gen.chooseNum(-5L, 5L) // few values -> dense ties
  private val labeled = Gen.nonEmptyListOf(Gen.zip(scoreGen, Gen.oneOf(0L, 1L))).map(_.take(80))

  property("binaryEval AUC == brute-force pair statistic") =
    Prop.forAll(labeled) { rows =>
      val r = Eval.binaryEval(rows.toDF("score", "y").repartition(4), "score", "y")
        .collect().head
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      var num2 = 0L
      for (p <- pos; n <- neg) { if (p > n) num2 += 2L else if (p == n) num2 += 1L }
      Prop(r.getAs[Long]("auc2_num") == num2 &&
        r.getAs[Long]("auc2_den") == 2L * pos.size * neg.size) :|
        s"got (${r.getAs[Long]("auc2_num")}, ${r.getAs[Long]("auc2_den")}) want ($num2, ${2L * pos.size * neg.size})"
    }

  private val ptGen = Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0L, 12L))
  private val points = Gen.nonEmptyListOf(ptGen).map(_.take(60))

  property("skyline == quadratic dominance filter") =
    Prop.forAll(points) { pts =>
      val df = pts.zipWithIndex.map { case ((a, b), i) => (a, b, i.toLong) }
        .toDF("d1", "d2", "id").repartition(3)
      val got = Skyline.frontier2d(df, "d1", "d2").select("id").as[Long].collect().toSet
      val brute = pts.zipWithIndex.filter { case ((x, y), _) =>
        !pts.exists { case (x2, y2) => x2 >= x && y2 >= y && (x2 > x || y2 > y) }
      }.map(_._2.toLong).toSet
      Prop(got == brute) :| s"got=$got brute=$brute"
    }

  private val ivGen = Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 10L))
    .map { case (s, len) => (s, s + len) }
  private val intervals = Gen.nonEmptyListOf(ivGen).map(_.take(50))

  property("interval concurrency == brute-force point cover counts") =
    Prop.forAll(intervals) { iv =>
      val got = Intervals.concurrency(iv.toDF("s", "e").repartition(3), "s", "e")
        .as[(Long, Long)].collect().toMap
      val ok = got.forall { case (t, n) =>
        n == iv.count { case (s, e) => s <= t && t < e }
      }
      // every boundary present
      val boundaries = iv.flatMap { case (s, e) => Seq(s, e) }.toSet
      Prop(ok && got.keySet == boundaries) :| s"got=$got"
    }

  private val series = Gen.nonEmptyListOf(Gen.chooseNum(0L, 20L)).map(_.take(80))

  property("cusum == sequential max(0, s + d) recursion") =
    Prop.forAll(series, Gen.chooseNum(0L, 20L)) { (vals, k) =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("t", "v").repartition(4)
      val got = Anomaly.cusum(df, "t", "v", k, h = 5L)
        .orderBy("t").select("cusum").as[Long].collect().toSeq
      var s = 0L
      val expect = vals.map { x => s = math.max(0L, s + (x - k)); s }
      Prop(got == expect) :| s"got=$got expect=$expect"
    }
}
