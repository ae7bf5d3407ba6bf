package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // Docs 1 and 2 share the exact 6-word run "one two three four five
  // six" (two overlapping 5-spans each); doc 3 is all-unique prose;
  // doc 4 is shorter than the span width.
  private lazy val corpus = Seq(
    (1L, "alpha one two three four five six beta gamma"),
    (2L, "delta one two three four five six epsilon"),
    (3L, "entirely unique words that appear nowhere else at all"),
    (4L, "too short")
  ).toDF("doc_id", "text")

  test("report finds the shared run, unions overlapping spans, strips them") {
    val out = DupSpans.report(corpus, "doc_id", "text", w = 5, minCount = 2)
      .collect().map(r => r.getAs[Long]("doc") -> r).toMap

    // Doc 1: 9 words, 5 spans; spans at pos 1 and 2 are duplicated
    // ("one two three four five", "two three four five six") —
    // union covers positions 1..6 = 6 tokens.
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_spans") == 5L)
    assert(d1.getAs[Long]("n_dup_spans") == 2L)
    assert(d1.getAs[Long]("covered_tokens") == 6L)
    assert(d1.getAs[String]("clean_text") == "alpha beta gamma")

    val d2 = out(2L)
    assert(d2.getAs[Long]("n_dup_spans") == 2L)
    assert(d2.getAs[String]("clean_text") == "delta epsilon")

    // Unique doc untouched; short doc has no spans at all.
    val d3 = out(3L)
    assert(d3.getAs[Long]("n_dup_spans") == 0L)
    assert(d3.getAs[Double]("dup_frac") == 0.0)
    assert(d3.getAs[String]("clean_text") == d3.getAs[String]("clean_text").toLowerCase)
    assert(out(4L).getAs[Long]("n_spans") == 0L)
    assert(out(4L).getAs[String]("clean_text") == "too short")
  }

  test("within-doc repetition alone reaches minCount") {
    val doc = Seq((9L, "spam one two three four five and one two three four five again"))
      .toDF("doc_id", "text")
    val out = DupSpans.report(doc, "doc_id", "text", w = 5, minCount = 2)
      .collect().head
    // "one two three four five" occurs twice inside the one doc.
    assert(out.getAs[Long]("n_dup_spans") == 2L)
    assert(out.getAs[String]("clean_text") == "spam and again")
  }

  test("stripDupSpans equals the report's clean_text column") {
    val a = DupSpans.stripDupSpans(corpus, "doc_id", "text").orderBy($"doc")
      .as[(Long, String)].collect().toSeq
    val b = DupSpans.report(corpus, "doc_id", "text").orderBy($"doc")
      .select($"doc", $"clean_text").as[(Long, String)].collect().toSeq
    assert(a == b)
  }
}
