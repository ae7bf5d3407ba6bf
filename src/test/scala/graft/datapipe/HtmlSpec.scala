package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def one(html: String): (String, String, Seq[String], Double) = {
    val r = Seq(html).toDF("h")
      .select(
        Html.extractText($"h").as("t"),
        Html.title($"h").as("ti"),
        Html.links($"h").as("l"),
        Html.textRatio($"h").as("r"))
      .collect().head
    (r.getAs[String]("t"), r.getAs[String]("ti"),
      r.getSeq[String](2), r.getAs[Double]("r"))
  }

  test("full page: script/style dropped, blocks split, entities decoded") {
    val (t, ti, l, r) = one(
      """<html><head><title> News &amp; Views </title>
        |<style>p{color:red}</style></head>
        |<body><script type="text/js">var x="<p>not text</p>";</script>
        |<div class="nav"><a href="/home">Home</a> <a href="/about">About</a></div>
        |<p>First&nbsp;para with &lt;tags&gt; &amp; an &#39;apostrophe&#39;.</p>
        |<p>Second para.</p><!-- hidden comment --></body></html>""".stripMargin)
    assert(ti == "News & Views")
    assert(t == "Home About First para with <tags> & an 'apostrophe'. Second para.")
    assert(l == Seq("/home", "/about"))
    assert(r > 0.0 && r < 1.0)
  }

  test("block closers keep words apart; plain text passes through") {
    val (t, _, _, _) = one("<p>end.</p><p>Start</p>")
    assert(t == "end. Start")
    val (plain, ti, l, r) = one("just words, no markup")
    assert(plain == "just words, no markup" && ti == "" && l.isEmpty && r == 1.0)
  }

  test("double-encoded entity decodes one level only") {
    // &amp;lt; must become the literal text "&lt;", NOT "<".
    val (t, _, _, _) = one("<p>&amp;lt;kept&amp;gt;</p>")
    assert(t == "&lt;kept&gt;")
  }

  test("unclosed script is left as stripped text, not eaten to EOF") {
    val (t, _, _, _) = one("<script>var x=1; <p>rest of the page</p>")
    assert(t.contains("rest of the page"))
  }

  test("br and headings break; empty page ratio is 0") {
    val (t, _, _, _) = one("<h1>Head</h1>line one<br>line two")
    assert(t == "Head line one line two")
    val (_, _, _, r) = one("")
    assert(r == 0.0)
  }
}
