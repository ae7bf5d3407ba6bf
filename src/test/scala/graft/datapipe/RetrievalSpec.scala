package graft.datapipe

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "quick brown shoes and a quick brown fox"),
    (3L, "brown quick fox"), // right words, wrong order
    (4L, "the fox")
  ).toDF("doc_id", "text")

  private def search(phrases: (Long, String)*): Map[(Long, Long), Long] =
    Retrieval.phraseSearch(docs, "doc_id", "text",
        phrases.toSeq.toDF("p_id", "phrase"), "p_id", "phrase")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("phrase matches are positional, not bag-of-words") {
    val hits = search(10L -> "quick brown fox")
    assert(hits == Map((10L, 1L) -> 1L, (10L, 2L) -> 1L)) // doc 3 excluded
  }

  test("multiple occurrences in one doc each count") {
    val hits = search(11L -> "quick brown")
    assert(hits((11L, 2L)) == 2L)
  }

  test("overlapping matches of a repeating phrase all count") {
    val d = Seq((9L, "go go go go")).toDF("doc_id", "text")
    val hits = Retrieval.phraseSearch(d, "doc_id", "text",
        Seq((1L, "go go")).toDF("p_id", "phrase"), "p_id", "phrase")
      .collect().map(r => r.getLong(2)).toSeq
    assert(hits == Seq(3L))
  }

  test("repeated-term phrase needs every position filled") {
    // "the ... the" only truly occurs in doc 1 at distance 5 — a doc
    // with a single "the" (doc 4) must not match "the the".
    val hits = search(12L -> "the the")
    assert(hits.isEmpty)
  }

  test("single-word phrase degenerates to term lookup") {
    val hits = search(13L -> "fox")
    assert(hits == Map((13L, 1L) -> 1L, (13L, 2L) -> 1L, (13L, 3L) -> 1L, (13L, 4L) -> 1L))
  }
}
