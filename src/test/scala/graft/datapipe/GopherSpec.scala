package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Gopher rule semantics on hand-built documents. */
class GopherSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val cfg = Gopher.Config(minWords = 5)

  private def verdicts(text: String): Map[String, Any] = {
    val row = Seq(text).toDF("t")
      .select(Gopher.rules(col("t"), cfg).as("g")).select(col("g.*"))
      .collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("clean prose passes every rule") {
    val v = verdicts("the quick brown foxes jumped over that lazy dog with style and gusto")
    v("keep") shouldBe true
    v("n_words") shouldBe 13L
  }

  test("word-count floor") {
    verdicts("the and of that")("ok_word_count") shouldBe false
  }

  test("mean word length bounds, integer form") {
    // 10 one-char words: total 10 < 3*10 -> fail.
    verdicts("a b c d e f g h i j")("ok_mean_len") shouldBe false
    // exactly mean 3 passes (boundary).
    verdicts("abc abc abc abc abc")("ok_mean_len") shouldBe true
  }

  test("symbol ratio: hashes and ellipses") {
    val v = verdicts("the of # # word word word word word word")
    v("n_symbols") shouldBe 2L
    v("ok_symbols") shouldBe false // 2*10 = 20 > 10 words
  }

  test("bullet-line ratio fails on bullets-only docs") {
    val v = verdicts("- the first point here\n- and the second one\n- also that third")
    v("n_bullets") shouldBe 3L
    v("ok_bullets") shouldBe false // 30 > 9*3
  }

  test("ellipsis line endings, unicode included") {
    val v = verdicts("the first line...\nsecond one…\nthird stays\nfourth stays\nfive of them here now")
    v("n_ellipsis") shouldBe 2L
    v("ok_ellipsis") shouldBe false // 20 > 3*5
  }

  test("alphabetic-word fraction") {
    val v = verdicts("1 2 3 4 5 6 7 8 the of")
    v("n_alpha_words") shouldBe 2L
    v("ok_alpha") shouldBe false
  }

  test("stop-word floor counts distinct stopwords") {
    verdicts("the the the word word")("ok_stopwords") shouldBe false // only 1 distinct
    verdicts("the of word word word")("ok_stopwords") shouldBe true
  }

  test("null text yields zero counts and fails keep") {
    val row = Seq((1, null.asInstanceOf[String])).toDF("i", "t")
      .select(Gopher.rules(col("t"), cfg).as("g")).select(col("g.*")).collect().head
    row.getAs[Long]("n_words") shouldBe 0L
    row.getAs[Boolean]("keep") shouldBe false
  }

  test("gate is a zero-shuffle plan") {
    val plan = Seq("x").toDF("t")
      .select(Gopher.rules(col("t"), cfg)).queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
