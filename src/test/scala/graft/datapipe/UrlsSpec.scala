package graft.datapipe

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def parse(url: String): (String, String, String, String, String, String) = {
    val r = Seq(url).toDF("u").select(
      Urls.host($"u"), Urls.path($"u"), Urls.queryParam($"u", "ref"),
      Urls.fragment($"u"), Urls.registeredDomain($"u"), Urls.tld($"u"))
      .collect().head
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
      r.getString(4), r.getString(5))
  }

  test("full URL decomposes field by field") {
    val (h, p, q, f, d, t) =
      parse("https://user@www.example.com:8443/a/b%20c?x=1&ref=r7#sec-2")
    assert(h == "www.example.com")
    assert(p == "/a/b%20c")
    assert(q == "r7")
    assert(f == "sec-2")
    assert(d == "example.com")
    assert(t == "com")
  }

  test("ccTLD second-level registry gets three labels") {
    val (_, _, _, _, d, t) = parse("http://news.bbc.co.uk/stories")
    assert(d == "bbc.co.uk" && t == "uk")
    val (_, _, _, _, d2, _) = parse("http://example.ac.jp")
    assert(d2 == "example.ac.jp")
  }

  test("missing components are empty strings, never null") {
    val (h, p, q, f, d, t) = parse("https://example.org")
    assert(h == "example.org" && p == "" && q == "" && f == "")
    assert(d == "example.org" && t == "org")
  }

  test("host is lowercased; dotless host has empty tld and itself-ish domain") {
    val (h, _, _, _, _, t) = parse("HTTPS://Example.COM/Path")
    assert(h == "example.com" && t == "com")
    val (h2, _, _, _, d2, t2) = parse("http://localhost:8080/x")
    assert(h2 == "localhost" && d2 == "" && t2 == "")
  }

  test("capPerDomain keeps the best n per registered domain, deterministically") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "https://a.example.com/1", 50L),
      (2L, "https://www.a.example.com/2", 90L), // same domain as 1, better
      (3L, "https://a.example.com/3", 90L),     // tie with 2 → lower id kept first
      (4L, "https://b.example.org/1", 10L)
    ).toDF("doc", "u", "score")
    val kept = Urls.capPerDomain(docs, "u", col("score"), col("doc"), 2)
      .select("doc").as[Long].collect().toSet
    // example.com keeps 2 and 3 (both score 90); doc 1 capped out.
    assert(kept == Set(2L, 3L, 4L))
  }

  test("hostBucket is stable and within range") {
    val rows = Seq("https://a.example.com/1", "https://a.example.com/2",
      "https://b.example.org/1").toDF("u")
      .select(Urls.host($"u").as("h"), Urls.hostBucket($"u", 16).as("b"))
      .collect()
    val byHost = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert(byHost("a.example.com").size == 1)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
  }
}
