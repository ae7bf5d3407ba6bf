package graft.datapipe

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL decomposition and domain policy for web-crawl pipelines —
  * source filtering (allowlist/blocklist by registered domain) is the
  * first gate of every crawl-derived training set. Beyond-reference
  * op. Like [[Html]], everything is pure `Column` over the
  * Java-regex ∩ RE2 subset so a DuckDB oracle can recompute each
  * field exactly (which is also why this avoids Spark's built-in
  * `parse_url` — the oracle engine has no such function, and a
  * cross-checked regex contract beats an uncheckable builtin).
  *
  * Contract: absolute http(s)/ftp URLs. Fields never return null on
  * a non-null input — a missing component is the empty string, so
  * downstream groupBys don't need null-guards.
  */
object Urls {

  private val hostRe = "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)"

  /** Hostname: after scheme and userinfo, before port/path/query. */
  def host(url: Column): Column = regexp_extract(lower(url), hostRe, 1)

  /** Path including the leading slash; "" when the URL ends at the
    * authority.
    */
  def path(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  /** Value of one query parameter; "" when absent. `key` must be a
    * literal identifier ([A-Za-z0-9_]) — it is spliced into the regex.
    */
  def queryParam(url: Column, key: String): Column = {
    require(key.matches("[A-Za-z0-9_]+"), s"unsafe query key: $key")
    regexp_extract(url, "[?&]" + key + "=([^&#]*)", 1)
  }

  /** Fragment after '#'; "" when absent. */
  def fragment(url: Column): Column = regexp_extract(url, "#(.*)$", 1)

  /** Registered domain via the standard two-level heuristic: last two
    * host labels, or last three when the second-to-last is a known
    * second-level registry label under a two-letter ccTLD
    * ("example.co.uk" → "example.co.uk", "www.example.com" →
    * "example.com"). A full public-suffix list is a data file, not an
    * algorithm — at scale it broadcast-joins against the host column;
    * this closed-form core is what the PSL degenerates to for the
    * dominant suffixes.
    */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    val sld = "(?:co|com|net|org|ac|gov|edu)"
    val three = regexp_extract(h, "([^.]+\\." + sld + "\\.[a-z][a-z])$", 1)
    val two = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(three =!= "", three).otherwise(two)
  }

  /** Last host label ("com", "uk"); "" for dotless hosts. */
  def tld(url: Column): Column = regexp_extract(host(url), "\\.([^.]+)$", 1)

  /** Hash-bucketed crawl sharding key: deterministic partition id for
    * a host, so one site's pages co-locate (politeness windows,
    * per-site caps) without a shuffle-by-host of the full corpus.
    */
  def hostBucket(url: Column, buckets: Int): Column =
    pmod(xxhash64(host(url)), lit(buckets.toLong))

  /** Per-domain document cap — the crawl-diversity gate: keep at most
    * `n` documents per registered domain, best-first by `order`
    * (ties broken by `tieBreak` ascending so the kept set is
    * deterministic). One shuffle on the domain key; the rank filter
    * compiles to Spark's native WindowGroupLimit, so each partition
    * keeps only its running top-n instead of materializing full
    * per-domain sorts.
    */
  def capPerDomain(docs: org.apache.spark.sql.DataFrame, urlCol: String,
                   order: Column, tieBreak: Column, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(registeredDomain(col(urlCol)))
      .orderBy(order.desc, tieBreak.asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
