package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("bitlen2 is the exact integer floor(2*log2(c)) + 1, with 0 saturating to 1") {
    val out = Seq(0L, 1L, 2L, 3L, 4L, 1000L, 2147483647L, 9999999999L).toDF("c")
      .select($"c", UnigramLm.bitlen2($"c").as("b")).as[(Long, Long)].collect().toMap
    assert(out(0L) == 1L, "bin(0) = '0' — saturated floor")
    assert(out(1L) == 1L)
    assert(out(2L) == 3L, "floor(2*log2 2) + 1 = 3")
    assert(out(3L) == 4L, "floor(2*log2 3) + 1 = floor(3.17) + 1")
    assert(out(4L) == 5L)
    assert(out(1000L) == math.floor(2 * math.log(1000.0) / math.log(2.0)).toLong + 1)
    assert(out(2147483647L) == out(9999999999L), "counts clamp at 2^31-1")
  }

  test("viterbi: cheaper split beats the whole piece; dp replay of the hand-checked fixture") {
    val dict = Seq(("abab", 3L), ("ab", 5L), ("b", 2L)).toDF("word", "freq")
    val vocab = Seq(("a", 4L), ("b", 4L), ("ab", 2L), ("abab", 9L)).toDF("piece", "cost")
    val out = UnigramLm.segmentWords(dict, vocab, maxPieceLen = 4)
      .select($"word", $"seg", $"n_pieces", $"seg_cost")
      .as[(String, String, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("abab") == (("ab ab", 2, 4L)), "2+2 beats the cost-9 whole piece")
    assert(out("ab") == (("ab", 1, 2L)))
    assert(out("b") == (("b", 1, 4L)))
  }

  test("viterbi tie-break: equal cost prefers the smallest split point (longest last piece)") {
    val dict = Seq(("ab", 1L)).toDF("word", "freq")
    val vocab = Seq(("a", 1L), ("b", 1L), ("ab", 2L)).toDF("piece", "cost")
    // Whole 'ab' costs 2; 'a'+'b' also costs 2 — j=0 (whole) is scanned
    // first and later candidates must be STRICTLY better.
    val out = UnigramLm.segmentWords(dict, vocab, maxPieceLen = 4)
      .select($"seg", $"n_pieces").as[(String, Int)].head()
    assert(out == (("ab", 1)))
  }

  test("unknown substrings fall back to the alphabet (INF-priced absences)") {
    val dict = Seq(("xyz", 1L)).toDF("word", "freq")
    val vocab = Seq(("x", 3L), ("y", 3L), ("z", 3L)).toDF("piece", "cost")
    val out = UnigramLm.segmentWords(dict, vocab, maxPieceLen = 4)
      .select($"seg", $"n_pieces").as[(String, Int)].head()
    assert(out == (("x y z", 3)))
  }

  test("learn on a compound corpus rediscovers constituent words") {
    // 'alphabeta' (9 chars) exceeds maxPieceLen 8, so it MUST split;
    // with 'alpha' and 'beta' frequent, hard EM should keep both as
    // pieces and the final segmentation should recover them.
    val docs = (Seq.fill(20)("alpha beta alphabeta") ++
      Seq.fill(5)("gamma alpha") ++ Seq.fill(5)("beta gamma")).toDF("text")
    val (vocab, seg) = UnigramLm.learn(docs, "text",
      seedSize = 80, maxPieceLen = 8, nIters = 2, vocabSize = 40)
    val pieces = vocab.select($"piece").as[String].collect().toSet
    assert(pieces.contains("alpha") && pieces.contains("beta"))
    val segs = seg.select($"word", $"seg").as[(String, String)].collect().toMap
    assert(segs("alphabeta") == "alpha beta",
      s"compound must split into its constituents, got '${segs("alphabeta")}'")
    assert(segs("alpha") == "alpha" && segs("beta") == "beta",
      "frequent whole words segment as single pieces")
  }

  test("tokenCounts: per-doc token totals follow the segmentation") {
    val docs = Seq((1L, "alpha beta"), (2L, "alphabeta")).toDF("doc_id", "text")
    val dict = UnigramLm.wordDict(docs, "text")
    val vocab = Seq(("alpha", 2L), ("beta", 2L)).toDF("piece", "cost")
      .unionByName(Seq("a", "b", "e", "h", "l", "p", "t").map((_, 9L)).toDF("piece", "cost"))
    val seg = UnigramLm.segmentWords(dict, vocab, maxPieceLen = 8)
    val out = UnigramLm.tokenCounts(docs, "doc_id", "text", seg)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 2L, "'alpha beta' = two one-piece words")
    assert(out(2L) == 2L, "'alphabeta' = alpha + beta under the cheap pieces")
  }
}
