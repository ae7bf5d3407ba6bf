package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** BPE merge learning: hand-computed merges on tiny corpora. */
class BpeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("learns the heaviest pair first, weighted by word frequency") {
    // Corpus: "ab ab ab cd" -> freq(ab)=3, freq(cd)=1.
    // Pairs: "a b" weight 3, "c d" weight 1 -> first merge "a b".
    val docs = Seq("ab ab ab cd").toDF("text")
    val (merges, dict) = Bpe.learn(docs, "text", 2)
    merges.map(m => (m.step, m.pair, m.merged, m.weight)) shouldBe
      Seq((1, "a b", "ab", 3L), (2, "c d", "cd", 1L))
    dict.orderBy("word").select("word", "sym").as[(String, String)].collect() shouldBe
      Seq(("ab", "ab"), ("cd", "cd"))
  }

  test("tie-break is pair-ascending") {
    // "xy" and "ab" both appear once: weights tie at 1 -> "a b" wins.
    val docs = Seq("xy ab").toDF("text")
    val (merges, _) = Bpe.learn(docs, "text", 1)
    merges.head.pair shouldBe "a b"
  }

  test("greedy left-to-right application: aaa merges to (aa, a)") {
    // Word "aaa": sliding pairs (a,a) twice -> weight 2 for "a a".
    // Applying "a a" non-overlapping left-to-right: " a a a " -> " aa a ".
    val docs = Seq("aaa").toDF("text")
    val (merges, dict) = Bpe.learn(docs, "text", 1)
    merges.head shouldBe Bpe.Merge(1, "a a", "aa", 2L)
    dict.select("sym").as[String].head() shouldBe "aa a"
  }

  test("merged symbols pair up in later steps") {
    // "abab" x2: step 1 "a b"(4) -> " ab ab ", step 2 "ab ab"(2) -> "abab".
    val docs = Seq("abab abab").toDF("text")
    val (merges, dict) = Bpe.learn(docs, "text", 2)
    merges.map(_.pair) shouldBe Seq("a b", "ab ab")
    dict.select("sym").as[String].head() shouldBe "abab"
  }

  test("stops early when nothing is left to merge") {
    // Single word "ab": one merge exhausts it; further steps no-op.
    val docs = Seq("ab").toDF("text")
    val (merges, dict) = Bpe.learn(docs, "text", 5)
    merges should have size 1
    dict.select("sym").as[String].head() shouldBe "ab"
  }

  test("single-char words contribute no pairs") {
    val docs = Seq("a a a b").toDF("text")
    val (merges, _) = Bpe.learn(docs, "text", 3)
    merges shouldBe empty
  }

  test("case folding matches the words() tokenization") {
    val docs = Seq("AB ab").toDF("text")
    val (merges, _) = Bpe.learn(docs, "text", 1)
    merges.head.weight shouldBe 2L
  }
}
