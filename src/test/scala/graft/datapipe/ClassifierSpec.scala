package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Hashing-trick linear scoring: exact integer semantics + plan shape. */
class ClassifierSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val dim = 16
  private val weights = Classifier.syntheticWeights(dim)

  /** Reference reimplementation with java's own MessageDigest. */
  private def refScore(text: String): Long =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).map { w =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cls|$w".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      weights((java.lang.Long.parseLong(hex, 16) % dim).toInt)
    }.sum

  test("score equals the driver-side md5 replay") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta delta"), (3L, "x")).toDF("doc_id", "text")
    val got = Classifier.scoreDocs(docs, "doc_id", "text", weights, salt = "cls")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    got shouldBe Map(
      1L -> refScore("alpha beta gamma"),
      2L -> refScore("delta delta"),
      3L -> refScore("x"))
  }

  test("repeated tokens count with multiplicity") {
    val docs = Seq((1L, "dup dup dup"), (2L, "dup")).toDF("doc_id", "text")
    val s = Classifier.scoreDocs(docs, "doc_id", "text", weights, salt = "cls")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    s(1L) shouldBe 3 * s(2L)
  }

  test("empty and null text score 0 and keep=false at threshold 0") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = Classifier.scoreDocs(docs, "doc_id", "text", weights, salt = "cls")
      .select("doc_id", "n_tokens", "score", "keep").as[(Long, Long, Long, Boolean)].collect()
    rows.toSet shouldBe Set((1L, 0L, 0L, false), (2L, 0L, 0L, false))
  }

  test("synthetic weights are stable and bounded") {
    Classifier.syntheticWeights(64) shouldBe Classifier.syntheticWeights(64)
    all(Classifier.syntheticWeights(256)) should (be >= -8L and be <= 7L)
    Classifier.syntheticWeights(256).distinct.size should be > 8
  }

  test("scoring plan has no shuffle and no UDF") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val plan = Classifier.scoreDocs(docs, "doc_id", "text", weights, salt = "cls")
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan.toLowerCase should not include "batchevalpython"
  }

  // ------------------------------------------------------------------
  // train: integer-quantized logistic regression
  // ------------------------------------------------------------------

  /** Planted corpus: shared noise vocabulary in every doc, plus a
    * class marker planted three times — the separable signal the
    * trainer must find. Deterministic from the doc index.
    */
  private def plantedDocs(n: Int) = {
    val noise = Vector("table", "scan", "filter", "join", "sort", "agg", "row", "key")
    (0 until n).map { i =>
      val y = i % 2
      val words = (0 until 12).map(j => noise((i * 7 + j * 5) % noise.size)) ++
        Seq.fill(3)(if (y == 1) "qualgood" else "qualbad")
      (i.toLong, words.mkString(" "), y.toLong)
    }.toDF("doc_id", "text", "y")
  }

  test("train separates planted good/bad docs with a margin") {
    val docs = plantedDocs(40)
    val w = Classifier.train(docs, "text", $"y", dim = 64, salt = "clstr", iters = 6)
    w.size shouldBe 64
    // Score the SAME planted construction under the trained weights:
    // every good doc must outscore every bad doc (perfect separation
    // on a linearly separable fixture is the minimum bar).
    val scored = Classifier.scoreDocs(docs, "doc_id", "text", w, salt = "clstr")
      .join(docs.select($"doc_id", $"y"), "doc_id")
      .select($"y", $"score").as[(Long, Long)].collect()
    val good = scored.filter(_._1 == 1L).map(_._2)
    val bad = scored.filter(_._1 == 0L).map(_._2)
    assert(good.min > bad.max,
      s"trained weights must separate the classes: good=[${good.min},${good.max}] bad=[${bad.min},${bad.max}]")
  }

  test("null-label docs train as no-ops: null gradient buckets skip, no NPE") {
    // An unlabeled row slips into the training set with tokens of its
    // own: its gradient bucket sums to NULL (all contributions null),
    // which must mean "no update" — the oracle's coalesce(g, 0) — not
    // a driver NullPointerException mid-iteration.
    val labeled = plantedDocs(20)
    val withNulls = labeled.unionByName(
      Seq((900L, "zzuniquetoken yyothertoken", null.asInstanceOf[java.lang.Long]))
        .toDF("doc_id", "text", "y"))
    val w = Classifier.train(withNulls, "text", $"y", dim = 32, salt = "clstr", iters = 2)
    assert(w.size == 32)
    // The null-label doc must not have nudged training: weights equal
    // the labeled-only run unless its tokens collide into used buckets
    // (dim 32 makes collisions possible; equality of the planted-token
    // separation is the invariant that matters).
    val scored = Classifier.scoreDocs(labeled, "doc_id", "text", w, salt = "clstr")
      .join(labeled.select($"doc_id", $"y"), "doc_id")
      .select($"y", $"score").as[(Long, Long)].collect()
    val good = scored.filter(_._1 == 1L).map(_._2)
    val bad = scored.filter(_._1 == 0L).map(_._2)
    assert(good.min > bad.max, "separation must survive unlabeled rows")
  }

  test("train and the oracle renderer reject hyperparameters past the 2^60 overflow caps") {
    val docs = plantedDocs(4)
    // 2^61 passes the power-of-two shape but 4*marginScale wraps
    // negative: the engine's shift base and the oracle's interpolated
    // divisor would silently disagree (and at 2^62 render a 0 divisor).
    intercept[IllegalArgumentException] {
      Classifier.train(docs, "text", $"y", dim = 4, salt = "s", iters = 1,
        marginScale = 1L << 61)
    }
    intercept[IllegalArgumentException] {
      Classifier.train(docs, "text", $"y", dim = 4, salt = "s", iters = 1,
        q = 1L << 61)
    }
    intercept[IllegalArgumentException] {
      Classifier.trainOracleSql("SELECT 1", dim = 4, salt = "s", iters = 1,
        marginScale = 1L << 62)
    }
    // The in-range defaults still pass both entry points.
    Classifier.trainOracleSql("SELECT 1", dim = 4, salt = "s", iters = 1)
  }

  test("train is exactly partitioning-invariant (integer grid, no IEEE)") {
    val docs = plantedDocs(30)
    val a = Classifier.train(docs, "text", $"y", dim = 32, salt = "clstr", iters = 4)
    val b = Classifier.train(docs.repartition(7, $"text"), "text", $"y",
      dim = 32, salt = "clstr", iters = 4)
    a shouldBe b
  }

  test("train gradient pass ships only bucket-grouped partials (one exchange)") {
    // The per-iteration gradient is explode -> partial agg -> one
    // exchange of <= dim rows per task -> final agg: assert the plan of
    // that stage has exactly one shuffle, i.e. raw token rows never
    // cross the wire.
    val docs = plantedDocs(20)
    val ws = TextAnalysis.words(coalesce(col("text"), lit("")))
    val feat = docs.select($"y".cast("long").as("y"),
      transform(ws, w => (Classifier.featureBucket(w, 32, "clstr") + 1).cast("int")).as("bks"))
    val wlit = typedlit(Seq.fill(32)(0L))
    val margin = aggregate($"bks", lit(0L), (acc, b) => acc + element_at(wlit, b))
    val plan = feat.select((margin - $"y" * lit(4096L)).as("err"), $"bks")
      .select($"err", explode($"bks").as("b1"))
      .groupBy($"b1").agg(sum($"err")).queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
    plan should include("HashAggregate") // map-side partials present
  }
}
