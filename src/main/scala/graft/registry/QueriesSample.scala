package graft.registry

import graft.datapipe.{Dsir, Sampling, TextAnalysis}
import graft.tables.TestTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry: deterministic sampling / packing operators over the
  * documents corpus, each with a DuckDB oracle. The md5-prefix hash is
  * bit-identical across engines, so even the "random" selections are
  * fully hash-checkable.
  */
object QueriesSample {

  /** DuckDB twin of Sampling.hashHex. */
  private def hashHexSql(key: String, salt: String): String =
    s"substr(md5('$salt' || '|' || CAST($key AS VARCHAR)), 1, 8)"

  /** DuckDB twin of Sampling.uniform01. */
  private def uniform01Sql(key: String, salt: String): String =
    s"CAST(CAST(('0x' || ${hashHexSql(key, salt)}) AS BIGINT) AS DOUBLE) / 4294967296.0"

  // Single shared renderer — see TextAnalysis.qualityScoreSql.
  private val qualitySql = TextAnalysis.qualityScoreSql

  private val tokensWsSql =
    "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic 25% corpus sample keyed on doc_id.
    "q_sample_hash" -> ((s, dir) =>
      Sampling.sampleByHash(TestTables.documents(s, dir), col("doc_id"), 0.25)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // Per-language quota sample (pretraining language mix): half the
    // English, 30% of Chinese, 10% of everything else.
    "q_sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedSample(TestTables.documents(s, dir), col("lang"), col("doc_id"),
          Map("en" -> 0.5, "zh" -> 0.3), defaultFraction = 0.1)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // Quality-weighted sample: keep-probability is the quality score
    // squashed linearly to [0,1] — high-quality docs survive more often.
    "q_sample_weighted" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      val weight = least(greatest((TextAnalysis.qualityScore(col("text")) + lit(2.0)) / lit(6.0),
        lit(0.0)), lit(1.0))
      Sampling.weightedSample(docs, col("doc_id"), weight)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Domain-mixture rebalance: rebuild the corpus at target source
    // proportions (30/20/10/5% of a 60-doc budget; unlisted sources
    // dropped) by deterministic hash rank.
    "q_sample_mixture" -> ((s, dir) =>
      Sampling.toMixture(TestTables.documents(s, dir), col("source"), col("doc_id"),
          Map("src0" -> 0.3, "src1" -> 0.2, "src2" -> 0.1, "src3" -> 0.05), total = 60L)
        .select(col("doc_id"), col("source"))
        .orderBy(col("source"), col("doc_id"))),

    // Temperature-flattened mixture (T=2): per-language quotas
    // proportional to sqrt(n_lang) — en (218 docs) is flattened toward
    // the small languages. All arithmetic after the correctly-rounded
    // IEEE sqrt is integer, so the quota set is engine-exact.
    "q_sample_temperature" -> ((s, dir) =>
      Sampling.temperatureMixture(TestTables.documents(s, dir), col("lang"), col("doc_id"),
          total = 300L)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id"))),

    // Fractional-epoch up-sampling: 2.3 epochs of the high-quality
    // slice — every doc twice, a hash-chosen 30% a third time.
    "q_sample_epochs" -> ((s, dir) =>
      Sampling.withEpochs(
          TestTables.documents(s, dir).filter(col("doc_id") % 4 === 0)
            .select(col("doc_id"), col("source")),
          col("doc_id"), epochs = 2.3)
        .orderBy(col("doc_id"), col("epoch"))),

    // Leakage-safe split: whole sources assigned to train/val (20%)
    // by group hash — no shuffle, rows of one source never straddle.
    "q_sample_split" -> ((s, dir) =>
      Sampling.groupSplit(TestTables.documents(s, dir), col("source"), valFraction = 0.2)
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))),

    // Per-group reservoir: exactly 5 uniform picks per language.
    "q_sample_reservoir" -> ((s, dir) =>
      Sampling.reservoirPerGroup(TestTables.documents(s, dir), col("lang"), col("doc_id"), k = 5)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id"))),

    // Exact-percentile quality gate: keep the top-10%-quality documents.
    "q_sample_percentile_gate" -> ((s, dir) =>
      Sampling.percentileGate(
          TestTables.documents(s, dir)
            .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality")),
          col("quality"), p = 0.9)
        .orderBy(col("doc_id"))),

    // Token-budget sequence packing: 8 hash buckets, 512-token bins.
    "q_pack_sequences" -> ((s, dir) =>
      Sampling.packSequences(TestTables.documents(s, dir), col("doc_id"),
          TextAnalysis.tokenCountWs(col("text")), budget = 512L, buckets = 8)
        .withColumnRenamed("key", "doc_id")
        .orderBy(col("doc_id"))),

    // DSIR bucket score table: English documents as the target slice,
    // the whole corpus as raw — 64 hashed-ngram buckets, quantized
    // smoothed likelihood ratios. Bounded output (exactly 64 rows)
    // whatever the corpus size.
    "q_dsir_bucket_scores" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      Dsir.bucketScores(docs.filter(col("lang") === "en"), "text", docs, "text", buckets = 64)
        .orderBy(col("bucket"))
    }),

    // Per-document DSIR importance scores against the en-target model:
    // integer ratio sum + mean likelihood ratio, every value exact.
    "q_dsir_score" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      val scores = Dsir.bucketScores(docs.filter(col("lang") === "en"), "text", docs, "text", 64)
      Dsir.scoreDocs(docs, "doc_id", "text", scores, buckets = 64)
        .orderBy(col("doc_id"))
    }),

    // DSIR selection: the 50 most target-like documents
    // (TakeOrderedAndProject — per-partition top-k, no global sort).
    "q_dsir_topk" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      val scores = Dsir.bucketScores(docs.filter(col("lang") === "en"), "text", docs, "text", 64)
      Dsir.resampleTopK(Dsir.scoreDocs(docs, "doc_id", "text", scores, 64), "doc_id", k = 50)
    }),

    // DSIR acceptance resampling: keep-probability proportional to the
    // importance weight, deterministic via the md5-prefix uniform.
    "q_dsir_accept" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      val scores = Dsir.bucketScores(docs.filter(col("lang") === "en"), "text", docs, "text", 64)
      Dsir.acceptByImportance(Dsir.scoreDocs(docs, "doc_id", "text", scores, 64), "doc_id")
        .orderBy(col("doc_id"))
    }),
  )

  /** Shared DuckDB CTE chain replaying Dsir: words → unigram+bigram
    * features → XXH64 buckets (value-exact replay of the engine's
    * codegen'd `xxhash64(gram)` via PortableHashSql, hashed once per
    * DISTINCT gram then joined back to occurrences) → target/raw
    * counts → 64-row spine → HUGEINT-exact quantized ratios →
    * per-doc integer scores. The final CTE `dsirdoc` exposes
    * (doc_id, n_feat, dsir_q, dsir_mean); `dsirsc` the score table.
    * Opens WITH RECURSIVE — the XXH64 stripe walk recurses.
    */
  private val dsirCtes: String =
    """WITH RECURSIVE w AS (
      |  SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, lang, list_concat(ws,
      |    CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
      |         ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]) END) AS gs
      |  FROM w),
      |occ AS MATERIALIZED (SELECT doc_id, lang, g AS w FROM f, unnest(gs) AS t(g)),
      |uw AS MATERIALIZED (SELECT DISTINCT w FROM occ),
      |""".stripMargin +
      graft.oracle.PortableHashSql.wordHashCtes("dsx", "uw", Seq(42L)) +
    """,
      |fb AS MATERIALIZED (
      |  SELECT doc_id, lang, ((h0 % 64) + 64) % 64 AS b
      |  FROM occ JOIN dsxh USING (w)),
      |tcnt AS (SELECT b, CAST(count(*) AS BIGINT) AS tc FROM fb WHERE lang = 'en' GROUP BY b),
      |rcnt AS (SELECT b, CAST(count(*) AS BIGINT) AS rc FROM fb GROUP BY b),
      |spine AS (SELECT CAST(i AS BIGINT) AS bucket FROM unnest(range(0, 64)) AS t(i)),
      |cnts AS (
      |  SELECT bucket, coalesce(tc, 0) AS tc, coalesce(rc, 0) AS rc
      |  FROM spine LEFT JOIN tcnt ON bucket = tcnt.b LEFT JOIN rcnt ON bucket = rcnt.b),
      |tot AS (SELECT CAST(sum(tc) AS BIGINT) AS tt, CAST(sum(rc) AS BIGINT) AS rr FROM cnts),
      |dsirsc AS (
      |  SELECT bucket, tc, rc,
      |    CAST((CAST(1000000 AS HUGEINT) * (tc + 1) * (rr + 64))
      |         // (CAST(rc + 1 AS HUGEINT) * (tt + 64)) AS BIGINT) AS s
      |  FROM cnts, tot),
      |dsirdoc AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat, CAST(sum(s) AS BIGINT) AS dsir_q,
      |    CAST(CAST(sum(s) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |      / CAST(1000000 AS DOUBLE) AS dsir_mean
      |  FROM fb JOIN dsirsc ON fb.b = dsirsc.bucket GROUP BY doc_id)
      |""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_dsir_bucket_scores" ->
      s"""${dsirCtes}SELECT bucket, tc, rc, s FROM dsirsc ORDER BY bucket""",

    "q_dsir_score" ->
      s"""${dsirCtes}SELECT doc_id, n_feat, dsir_q, dsir_mean FROM dsirdoc ORDER BY doc_id""",

    "q_dsir_topk" ->
      s"""${dsirCtes}SELECT doc_id, n_feat, dsir_q, dsir_mean FROM dsirdoc
         |ORDER BY dsir_mean DESC, doc_id LIMIT 50""".stripMargin,

    "q_dsir_accept" ->
      s"""${dsirCtes}, wm AS (SELECT max(dsir_mean) AS wmax FROM dsirdoc)
         |SELECT doc_id, n_feat, dsir_q, dsir_mean FROM dsirdoc, wm
         |WHERE ${uniform01Sql("doc_id", "dsir")} < dsir_mean / wmax
         |ORDER BY doc_id""".stripMargin,

    "q_sample_hash" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${hashHexSql("doc_id", "s0")} < '${Sampling.hexThreshold(0.25)}'
         |ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${hashHexSql("doc_id", "s0")} <
         |  CASE WHEN lang = 'en' THEN '${Sampling.hexThreshold(0.5)}'
         |       WHEN lang = 'zh' THEN '${Sampling.hexThreshold(0.3)}'
         |       ELSE '${Sampling.hexThreshold(0.1)}' END
         |ORDER BY doc_id""".stripMargin,

    "q_sample_weighted" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${uniform01Sql("doc_id", "s0")} <
         |  least(greatest((($qualitySql) + CAST(2.0 AS DOUBLE)) / CAST(6.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
         |ORDER BY doc_id""".stripMargin,

    "q_sample_mixture" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY ${hashHexSql("doc_id", "mix")}, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= CASE source WHEN 'src0' THEN 18 WHEN 'src1' THEN 12
         |                        WHEN 'src2' THEN 6 WHEN 'src3' THEN 3 ELSE 0 END
         |ORDER BY source, doc_id""".stripMargin,

    "q_sample_temperature" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
         |w AS (SELECT lang, CAST(floor(sqrt(n) * 1e6) AS BIGINT) AS wq FROM c),
         |q AS (SELECT lang, (wq * 300) // (SELECT CAST(sum(wq) AS BIGINT) FROM w) AS quota FROM w)
         |SELECT doc_id, lang FROM (
         |  SELECT d.doc_id, d.lang, quota,
         |    row_number() OVER (PARTITION BY d.lang
         |      ORDER BY ${hashHexSql("doc_id", "mixT")}, d.doc_id) AS rn
         |  FROM documents d JOIN q ON d.lang = q.lang) t
         |WHERE rn <= quota ORDER BY lang, doc_id""".stripMargin,

    "q_sample_epochs" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    2 + CASE WHEN ${uniform01Sql("doc_id", "epoch")} < (CAST(2.3 AS DOUBLE) - CAST(2.0 AS DOUBLE))
         |             THEN 1 ELSE 0 END AS copies
         |  FROM documents WHERE doc_id % 4 = 0)
         |SELECT doc_id, source, CAST(i AS BIGINT) AS epoch
         |FROM d, unnest(range(0, copies)) AS t(i)
         |ORDER BY doc_id, epoch""".stripMargin,

    "q_sample_split" ->
      s"""SELECT doc_id, source,
         |  CASE WHEN ${hashHexSql("source", "split")} < '33333333' THEN 'val' ELSE 'train' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sample_reservoir" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY ${hashHexSql("doc_id", "s0")}, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin,

    "q_sample_percentile_gate" ->
      s"""WITH q AS (SELECT doc_id, ($qualitySql) AS quality FROM documents),
         |thr AS (SELECT quantile_cont(quality, 0.9) AS t FROM q)
         |SELECT doc_id, quality FROM q, thr WHERE quality >= t
         |ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST($tokensWsSql AS BIGINT) AS n_tokens,
         |    CAST(('0x' || ${hashHexSql("doc_id", "pack")}) AS BIGINT) % 8 AS bucket
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT doc_id, bucket, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin, n_tokens
         |FROM c ORDER BY doc_id""".stripMargin,
  )
}
