package graft.datapipe

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // 8 docs; "NAV | home" on every doc (df=8), "(c) footer" on 4 (df=0.5),
  // "rare promo" on 1 (df=0.125). Body lines unique per doc.
  private lazy val docs = (1L to 8L).map { i =>
    val lines = Seq("NAV | home") ++
      Seq(s"body first line of doc $i", s"body second line of doc $i") ++
      (if (i % 2 == 0) Seq("(c) footer") else Nil) ++
      (if (i == 5) Seq("rare promo") else Nil)
    (i, lines.mkString("\n"))
  }.toDF("doc_id", "text")

  private def cleanOf(minDocFrac: Double): Map[Long, String] =
    Boilerplate.strip(docs, "doc_id", "text", minDocFrac)
      .as[(Long, String)].collect().toMap

  test("blank lines are never boilerplate candidates — paragraph structure survives") {
    // Every doc has a blank separator line (df = 1.0, far above any
    // threshold); stripping it would collapse paragraph structure.
    val withBlanks = (1L to 4L).map(i =>
      (i, s"para one of doc $i\n\npara two of doc $i")).toDF("doc_id", "text")
    val clean = Boilerplate.strip(withBlanks, "doc_id", "text", minDocFrac = 0.5)
      .as[(Long, String)].collect().toMap
    (1L to 4L).foreach(i =>
      assert(clean(i) == s"para one of doc $i\n\npara two of doc $i",
        s"doc $i must keep its blank separator: '${clean(i)}'"))
  }

  test("lines above the document-frequency threshold are stripped, rare and body lines survive in order") {
    val clean = cleanOf(0.4)
    assert(clean(1L) == "body first line of doc 1\nbody second line of doc 1")
    assert(clean(2L) == "body first line of doc 2\nbody second line of doc 2")
    assert(clean(5L) == "body first line of doc 5\nbody second line of doc 5\nrare promo")
    assert(clean.values.forall(t => !t.contains("NAV") && !t.contains("footer")))
  }

  test("threshold is a fraction of the corpus: footer (df=0.5) survives at 0.6") {
    val clean = cleanOf(0.6)
    assert(clean(2L) ==
      "body first line of doc 2\nbody second line of doc 2\n(c) footer")
    assert(clean.values.forall(t => !t.contains("NAV")), "df=1.0 line still stripped")
  }

  test("line identity is case- and whitespace-insensitive") {
    val variants = Seq(
      (1L, "SHARED LINE\nunique one"), (2L, "shared line\nunique two"),
      (3L, "  shared line  \nunique three"), (4L, "unique four"))
      .toDF("doc_id", "text")
    val clean = Boilerplate.strip(variants, "doc_id", "text", 0.5)
      .as[(Long, String)].collect().toMap
    assert(clean == Map(1L -> "unique one", 2L -> "unique two",
      3L -> "unique three", 4L -> "unique four"))
  }

  test("a document that is entirely boilerplate becomes the empty string, not a dropped row") {
    val d = Seq((1L, "only line"), (2L, "only line"), (3L, "only line\nextra"))
      .toDF("doc_id", "text")
    val clean = Boilerplate.strip(d, "doc_id", "text", 0.9)
      .as[(Long, String)].collect().toMap
    assert(clean == Map(1L -> "", 2L -> "", 3L -> "extra"))
  }

  test("null text yields an empty-string row, not a dropped doc") {
    val d = Seq((1L, "shared"), (2L, "shared"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val clean = Boilerplate.strip(d, "doc_id", "text", 0.6)
      .as[(Long, String)].collect().toMap
    assert(clean.keySet == Set(1L, 2L, 3L))
    assert(clean(1L) == "" && clean(3L) == "")
  }

  test("duplicate lines inside one doc count once toward document frequency") {
    // "echo" appears twice in doc 1 only: df = 1/3 < 0.5 ⇒ kept (twice).
    val d = Seq((1L, "echo\necho\nmine"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    val clean = Boilerplate.strip(d, "doc_id", "text", 0.5)
      .as[(Long, String)].collect().toMap
    assert(clean(1L) == "echo\necho\nmine")
  }
}
