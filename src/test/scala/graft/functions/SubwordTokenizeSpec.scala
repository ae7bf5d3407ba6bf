package graft.functions

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Greedy longest-match (WordPiece MaxMatch) semantics of
  * subword_tokenize, with codegen and interpreted paths locked to the
  * same answers.
  */
class SubwordTokenizeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val vocab = Seq(
    "custom", "cust", "cus", "##er", "##omer", "wind", "##ow",
    "a", "b", "c", "d", "e", "r", "s", "t", "u", "w",
    "##a", "##b", "##c", "##d", "##e", "##r", "##s", "##t", "##u", "##w")

  private def tok(words: Seq[String]): Seq[String] =
    Seq(words).toDF("ws")
      .select(SubwordTokenize.of(col("ws"), vocab).as("p"))
      .as[Seq[String]].head()

  test("longest match wins over shorter prefixes") {
    // custom(6) beats cust(4) beats cus(3) beats c(1); then ##er.
    tok(Seq("customer")) shouldBe Seq("custom", "##er")
  }

  test("continuation pieces only match after the word start") {
    // "ercust": no start piece "er..." longer than "e"; ## pieces can't
    // start a word, so it goes char-wise from "e".
    tok(Seq("ercust")) shouldBe Seq("e", "##r", "##c", "##u", "##s", "##t")
  }

  test("dead end rolls back the whole word to UNK") {
    // "cusz": greedy eats "cus", then 'z' has no ##-piece -> the
    // partial pieces must NOT leak into the output.
    tok(Seq("cusz", "cat")) shouldBe Seq("[UNK]", "c", "##a", "##t")
  }

  test("word-initial dead end is UNK too") {
    tok(Seq("zebra")) shouldBe Seq("[UNK]")
  }

  test("empty and null words contribute nothing") {
    Seq(1).toDF("i")
      .select(SubwordTokenize.of(
        array(lit(""), lit(null).cast("string"), lit("cat")), vocab).as("p"))
      .as[Seq[String]].head() shouldBe Seq("c", "##a", "##t")
  }

  test("empty word array tokenizes to an empty piece array") {
    tok(Seq.empty) shouldBe Seq.empty
  }

  test("null word array stays null") {
    Seq(1).toDF("i")
      .select(SubwordTokenize.of(lit(null).cast("array<string>"), vocab).as("p"))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("custom unk token is honored") {
    Seq(Seq("zebra")).toDF("ws")
      .select(SubwordTokenize.of(col("ws"), vocab, unk = "<oov>").as("p"))
      .as[Seq[String]].head() shouldBe Seq("<oov>")
  }

  test("interpreted path matches codegen") {
    val df = Seq(
      Seq("customer", "wind", "window", "cusz", "zebra", "", "cat"),
      Seq("ercust", "custcustomer")).toDF("ws")
    val withCodegen = df.select(SubwordTokenize.of(col("ws"), vocab).as("p")).collect()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.select(SubwordTokenize.of(col("ws"), vocab).as("p")).collect()
      interpreted.map(_.toString) shouldBe withCodegen.map(_.toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("non-foldable vocab is rejected at analysis time") {
    val err = intercept[Exception] {
      Seq((Seq("cat"), Seq("c"))).toDF("ws", "v")
        .select(call_function(SubwordTokenize.fnName, col("ws"), col("v"), lit("[UNK]")))
        .collect()
    }
    err.getMessage should include("foldable")
  }

  test("a throwing / NULL vocab or unk literal fails ANALYSIS with a named error (DictMatch contract)") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // ANSI overflow inside the foldable vocab literal: a named
    // TypeCheckFailure, not a raw ArithmeticException out of the analyzer.
    val e1 = intercept[Exception] {
      spark.sql("SELECT subword_tokenize(array('hi'), array(CAST(2147483647 + 1 AS STRING)), '[UNK]')").collect()
    }
    assert(msgs(e1).exists(_.contains("failed to evaluate")), msgs(e1).mkString(" | "))
    // NULL vocab elements would NPE inside the Matcher builder on an executor.
    val e2 = intercept[Exception] {
      spark.sql("SELECT subword_tokenize(array('hi'), array('h', CAST(NULL AS STRING)), '[UNK]')").collect()
    }
    assert(msgs(e2).exists(_.contains("NULL vocab elements")), msgs(e2).mkString(" | "))
    // And a NULL unk literal would NPE in unk.toString.
    val e3 = intercept[Exception] {
      spark.sql("SELECT subword_tokenize(array('hi'), array('hi'), CAST(NULL AS STRING))").collect()
    }
    assert(msgs(e3).exists(_.contains("NULL literal")), msgs(e3).mkString(" | "))
  }
}
