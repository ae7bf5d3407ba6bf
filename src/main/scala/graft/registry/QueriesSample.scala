package graft.registry

import graft.datapipe.{Sampling, TextAnalysis}
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
  )

  def oracleSql: Map[String, String] = Map(
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
