package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MarkdownSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("md").select(Markdown.toText($"md")).as[String].head()

  test("headers, emphasis, links, images, quotes, lists, rules all strip") {
    val md =
      """## Title
        |**bold** and *ital* and __ubold__
        |See [docs](http://x) and ![logo](img.png)
        |> quoted line
        |- item one
        |2. item two
        |---
        |plain tail""".stripMargin
    assert(strip(md) ==
      """Title
        |bold and ital and ubold
        |See docs and logo
        |quoted line
        |item one
        |item two
        |
        |plain tail""".stripMargin)
  }

  test("code fences drop, code body survives; inline code unwraps") {
    val md = "a `snippet` here\n```scala\nval x = 1\n```\ndone"
    assert(strip(md) == "a snippet here\n\nval x = 1\n\ndone")
  }

  test("bold strips before italics (** is not eaten as two *)") {
    assert(strip("**strong** *soft*") == "strong soft")
  }

  test("plain text is a fixed point; blank runs collapse") {
    assert(strip("just prose, no markup.") == "just prose, no markup.")
    assert(strip("a\n\n\n\n\nb") == "a\n\nb")
  }
}
