package graft.functions

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class NfcNormalizeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(NfcNormalize.of(col("t")).as("n")).as[String].head()

  test("combining sequences compose") {
    norm("é") shouldBe "é"
    norm("Å") shouldBe "Å"
    norm("가") shouldBe "가"
  }

  test("already-NFC text is unchanged (fast path)") {
    norm("café plain ascii") shouldBe "café plain ascii"
  }

  test("composition makes denormalized twins hash-identical") {
    val df = Seq(("café", "café")).toDF("a", "b")
    val r = df.select(
      (md5(NfcNormalize.of(col("a"))) === md5(NfcNormalize.of(col("b")))).as("same"),
      (md5(col("a")) === md5(col("b"))).as("raw_same")).as[(Boolean, Boolean)].head()
    r shouldBe ((true, false))
  }

  test("null passes through") {
    Seq(1).toDF("i").select(NfcNormalize.of(lit(null).cast("string")))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("interpreted matches codegen") {
    val df = Seq("é", "café", "가 Å").toDF("t")
    val gen = df.select(NfcNormalize.of(col("t"))).collect().map(_.getString(0))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      df.select(NfcNormalize.of(col("t"))).collect().map(_.getString(0)) shouldBe gen
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
