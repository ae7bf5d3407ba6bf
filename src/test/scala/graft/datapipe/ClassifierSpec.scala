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
}
