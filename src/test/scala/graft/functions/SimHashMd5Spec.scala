package graft.functions

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SimHashMd5Spec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("word hash equals the md5 hex-prefix parse") {
    val w = org.apache.spark.unsafe.types.UTF8String.fromString("alpha")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    SimHashMd5.wordHash(w) shouldBe java.lang.Long.parseUnsignedLong(hex, 16)
  }

  test("sketch is non-negative and deterministic") {
    val df = Seq(Seq("the", "quick", "brown", "fox")).toDF("ws")
    val s1 = df.select(SimHashMd5.of(col("ws"))).as[Long].head()
    val s2 = df.select(SimHashMd5.of(col("ws"))).as[Long].head()
    s1 shouldBe s2
    s1 should be >= 0L
  }

  test("near-identical word lists land within a small Hamming distance") {
    val words = (1 to 100).map(i => s"word$i")
    val df = Seq((words, words :+ "extra")).toDF("a", "b")
    val d = df.select(bit_count(SimHashMd5.of(col("a"))
      .bitwiseXOR(SimHashMd5.of(col("b"))))).as[Int].head()
    d should be <= 10
    // And unrelated lists are far.
    val far = Seq((words, (1 to 100).map(i => s"other$i"))).toDF("a", "b")
    far.select(bit_count(SimHashMd5.of(col("a"))
      .bitwiseXOR(SimHashMd5.of(col("b"))))).as[Int].head() should be > 10
  }
}
