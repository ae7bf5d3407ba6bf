package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("charNgrams slides over lowercased text, empty under n chars") {
    val out = Seq(("AbCd", 1L), ("xy", 2L), ("", 3L))
      .toDF("text", "id")
      .select($"id", LmScore.charNgrams($"text", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("abc", "bcd"))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
  }

  test("scoreDocs matches a hand-computed add-one trigram model") {
    // Reference "aaab": trigrams aaa, aab; bigrams aa, aa, ab;
    // alphabet {a, b} → A = 2.
    val ref = Seq("aaab").toDF("text")
    val docs = Seq((1L, "aaa"), (2L, "bbb"), (3L, "x")).toDF("doc_id", "text")
    val out = LmScore.scoreDocs(docs, "doc_id", "text", ref, "text")
      .select($"doc", $"n_tri", $"lm_q").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 1 "aaa": one trigram aaa → (1e9·(1+1)) div (cnt2(aa)=2 + 2) = 5e8.
    assert(out(1L) == ((1L, 500000000L)))
    // doc 2 "bbb": trigram bbb unseen, prefix bb unseen → (1e9·1) div 2 = 5e8.
    assert(out(2L) == ((1L, 500000000L)))
    // doc 3 shorter than 3 chars → no row.
    assert(!out.contains(3L))
  }

  test("natural-looking text outscores noise against an english reference") {
    val ref = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a quiet morning walk along the river bank",
      "she reads the paper over coffee every day").toDF("text")
    val docs = Seq(
      (1L, "the lazy dog walks along the river every morning"),
      (2L, "zxqj vvkw qqpz jjxx wwzz kkvv")).toDF("doc_id", "text")
    val out = LmScore.scoreDocs(docs, "doc_id", "text", ref, "text")
      .select($"doc", $"lm_mean").as[(Long, Double)].collect().toMap
    // With a tiny reference the add-one floor (1/A per unseen
    // trigram) compresses the margin; at corpus scale the gap widens.
    assert(out(1L) > out(2L) * 2,
      s"english ${out(1L)} should beat noise ${out(2L)}")
    assert(out.values.forall(m => m >= 0.0 && m <= 1.0))
  }

  test("filterByScore keeps only docs above the gate") {
    val ref = Seq("the cat sat on the mat and the dog sat too").toDF("text")
    val docs = Seq(
      (1L, "the cat and the dog sat on the mat"),
      (2L, "qqqq zzzz xxxx wwww")).toDF("doc_id", "text")
    val means = LmScore.scoreDocs(docs, "doc_id", "text", ref, "text")
      .select($"doc", $"lm_mean").as[(Long, Double)].collect().toMap
    val gate = (means(1L) + means(2L)) / 2
    val kept = LmScore.filterByScore(docs, "doc_id", "text", ref, "text", minMean = gate)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
