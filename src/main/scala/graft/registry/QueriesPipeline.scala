package graft.registry

import graft.pipeline.Pipelines
import graft.sink.Sinks
import graft.tables.TestTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry: the three end-to-end pipelines and the upsert sink as
  * oracle-checked queries. The mocks are pure functions of the keys, so
  * each pipeline's composite semantics (extract → enrich → parse →
  * rules → merge) has a closed-form SQL oracle.
  *
  * Contract note: sink/stateful operators (q_d2_upsert_pruned here,
  * q_e3_checkpoint_resume, q_b04_excel_roundtrip) deliberately perform
  * filesystem I/O against a job-scoped temp dir inside the query —
  * durable side effects ARE the semantics under test; the returned
  * DataFrame is the read-back, which is what the oracle checks.
  */
object QueriesPipeline {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_eligibility" -> ((s, dir) =>
      Pipelines.eligibility(s, dir).orderBy(col("visit_id"))),

    // The global ORDER BY is verify-surface determinism scaffolding,
    // but a range sort over an unmaterialized child runs the child
    // TWICE (the range-partitioner's sampling job, then the real
    // shuffle-write job). The result here is corpus-sized lineage
    // (the fan-out join-back), so stage it to disk first: sampling
    // and shuffle-write both read the blocks instead of re-running
    // the join. Product deployments write the UNSORTED frame to a
    // sink and never pay any of this.
    "q_pipeline_predictions" -> ((s, dir) =>
      graft.util.Materialize.stageData(Pipelines.predictions(s, dir))
        .orderBy(col("visit_id"), col("uid"), col("svc"))),

    // Same stage-before-sort as q_pipeline_predictions above: the
    // result is corpus-sized (full extraction × 5 business units), so
    // the range sampling job must read blocks, not re-run the fan-out
    // join-back.
    "q_pipeline_resubmission" -> ((s, dir) =>
      graft.util.Materialize.stageData(Pipelines.resubmission(s, dir))
        .orderBy(col("bu"), col("visit_id"), col("seq_no"), col("reason"),
          col("service_name"), col("reason_code"), col("status"))),

    // D2: upsert MERGE semantics — updates win, untouched rows survive.
    "q_d2_upsert" -> ((s, dir) => {
      val old = TestTables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = old.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * lit(2.0))
      Sinks.upsert(old, updates, "o_orderkey").orderBy(col("o_orderkey"))
    }),

    // D2 upgraded to SCD-2: fold timestamped updates into a validity-
    // interval dimension (the write side of the as-of join). Planted
    // shapes: a closed history row on every 10th key (must pass
    // through untouched), a real segment change on every 3rd key at
    // t1, a restated no-op on every 5th (non-3rd) key (must collapse),
    // and a revert back on every 6th key at t2 (a real change again).
    "q_d2_scd2" -> ((s, dir) => {
      val c = TestTables.customer(s, dir)
      def d(iso: String) = to_date(lit(iso))
      val open = c.select(col("c_custkey"), d("2020-01-01").as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"))
      val hist = c.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), d("2019-01-01").as("valid_from"),
          d("2020-01-01").as("valid_to"),
          concat(lit("OLD-"), col("c_mktsegment")).as("segment"), col("c_acctbal").as("acctbal"))
      val u1 = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), d("2021-06-01").as("ts"),
          concat(lit("NEW-"), col("c_mktsegment")).as("segment"), col("c_acctbal").as("acctbal"))
      val noop = c.filter(col("c_custkey") % 5 === 0 && col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"), d("2021-09-01").as("ts"),
          col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"))
      val u2 = c.filter(col("c_custkey") % 6 === 0)
        .select(col("c_custkey"), d("2022-06-01").as("ts"),
          col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"))
      graft.relational.Scd2.applyChanges(
          hist.unionByName(open), u1.unionByName(noop).unionByName(u2),
          "c_custkey", "ts", Seq("segment", "acctbal"))
        // Open rows project the conventional 9999-12-31 high date (also
        // keeps the hash compare off null-date representation).
        .withColumn("valid_to", coalesce(col("valid_to"), d("9999-12-31")))
        .orderBy(col("c_custkey"), col("valid_from"))
    }),

    // D2 with snapshot isolation: the manifest-committed table format
    // (immutable files + atomic manifest rename) runs the same MERGE;
    // only key-range-overlapping files rewrite, the commit is one
    // rename, and the pre-merge snapshot stays readable (time travel).
    // Oracle: identical to q_d2_upsert — the table format must not
    // change one row.
    "q_d2_manifest_upsert" -> ((s, dir) => {
      val table = graft.util.TempDirs.scratch("graft_mtable") + "/t"
      val old = TestTables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      graft.sink.ManifestTable.create(s, table, old, "o_orderkey")
      val updates = old.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * lit(2.0))
      graft.sink.ManifestTable.upsert(s, table, updates)
      graft.sink.ManifestTable.read(s, table)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // CDC over the manifest table: create -> upsert(+inserts) ->
    // deleteKeys, then diff snapshot 1 against snapshot 3. The oracle
    // derives the same insert/update/delete sets straight from the
    // orders table. Deleted keys must surface with their ORIGINAL
    // values even when an intermediate version updated them.
    "q_cdc_changes" -> ((s, dir) => {
      val table = graft.util.TempDirs.scratch("graft_cdc") + "/t"
      val base = TestTables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      graft.sink.ManifestTable.create(s, table, base, "o_orderkey")
      val updates = base.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * lit(2.0))
      val inserts = base.filter(col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000L))
        .withColumn("o_orderstatus", lit("N"))
      graft.sink.ManifestTable.upsert(s, table, updates.unionByName(inserts))
      graft.sink.ManifestTable.deleteKeys(s, table,
        base.filter(col("o_orderkey") % 7 === 0).select(col("o_orderkey")))
      graft.sink.ManifestTable.changes(s, table, fromV = 1L, toV = 3L)
        .orderBy(col("o_orderkey"), col("change_type"))
    }),

    // D2 at scale: partition-pruned MERGE — only month partitions that
    // contain updated keys are rewritten; the swap is rename-aside.
    "q_d2_upsert_pruned" -> ((s, dir) => {
      val table = graft.util.TempDirs.scratch("graft_pupsert") + "/t"
      val old = TestTables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      Sinks.upsertPartitioned(s, table, old, "o_orderkey", "month") // initial load
      val updates = old.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * lit(2.0))
      Sinks.upsertPartitioned(s, table, updates, "o_orderkey", "month")
      s.read.parquet(table)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("month"))
        .orderBy(col("o_orderkey"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_pipeline_eligibility" ->
      """SELECT o_orderkey AS visit_id, c_custkey AS patient_id,
        |  CASE WHEN c_custkey % 13 = 0 THEN 'Fail' ELSE 'Success' END AS api_status,
        |  CASE WHEN c_custkey % 13 = 0 THEN NULL
        |       ELSE 'INS-' || CAST(c_custkey % 5 AS VARCHAR) END AS ins_name,
        |  CASE WHEN o_orderkey % 11 = 0 THEN 'Null' ELSE 'Complete' END AS outcome,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |       WHEN o_orderkey % 2 = 0 THEN 'eligible' ELSE 'not-active' END AS class,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |       ELSE 'note for visit ' || CAST(o_orderkey AS VARCHAR) END AS note,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |       ELSE CAST(o_orderkey % 5000 AS DOUBLE) END AS approval_limit,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |       ELSE CAST(o_orderkey % 100 AS DOUBLE) END AS copay_maximum
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON s_suppkey = coalesce(nullif(o_custkey % 10, 0), 10) AND s_nationkey < 25
        |WHERE o_orderstatus <> 'F' AND o_orderpriority <> '5-LOW'
        |ORDER BY visit_id""".stripMargin,

    "q_pipeline_predictions" -> (predictionsSql() + " ORDER BY visit_id, uid, svc"),

    "q_pipeline_resubmission" -> resubmissionOracle,

    "q_d2_upsert" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * CAST(2.0 AS DOUBLE)
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_d2_scd2" ->
      """WITH cur_open AS (
        |  SELECT c_custkey, DATE '2020-01-01' AS ts, c_mktsegment AS segment, c_acctbal AS acctbal
        |  FROM customer),
        |upd AS (
        |  SELECT c_custkey, DATE '2021-06-01' AS ts, 'NEW-' || c_mktsegment AS segment, c_acctbal AS acctbal
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, DATE '2021-09-01', c_mktsegment, c_acctbal
        |  FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 3 <> 0
        |  UNION ALL
        |  SELECT c_custkey, DATE '2022-06-01', c_mktsegment, c_acctbal
        |  FROM customer WHERE c_custkey % 6 = 0),
        |vers AS (SELECT * FROM cur_open UNION ALL SELECT * FROM upd),
        |flagged AS (
        |  SELECT *, row_number() OVER w AS rn,
        |    (segment IS DISTINCT FROM lag(segment) OVER w)
        |      OR (acctbal IS DISTINCT FROM lag(acctbal) OVER w) AS chg
        |  FROM vers WINDOW w AS (PARTITION BY c_custkey ORDER BY ts)),
        |kept AS (SELECT c_custkey, ts, segment, acctbal FROM flagged WHERE rn = 1 OR chg),
        |closed AS (
        |  SELECT c_custkey, segment, acctbal, ts AS valid_from,
        |    coalesce(lead(ts) OVER (PARTITION BY c_custkey ORDER BY ts),
        |             DATE '9999-12-31') AS valid_to
        |  FROM kept),
        |hist AS (
        |  SELECT c_custkey, 'OLD-' || c_mktsegment AS segment, c_acctbal AS acctbal,
        |    DATE '2019-01-01' AS valid_from, DATE '2020-01-01' AS valid_to
        |  FROM customer WHERE c_custkey % 10 = 0)
        |SELECT * FROM closed UNION ALL SELECT * FROM hist
        |ORDER BY c_custkey, valid_from""".stripMargin,

    "q_cdc_changes" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
        |SELECT 'delete' AS change_type, o_orderkey, o_orderstatus, o_totalprice
        |FROM base WHERE o_orderkey % 7 = 0
        |UNION ALL
        |SELECT 'update', o_orderkey, 'U', o_totalprice * CAST(2.0 AS DOUBLE)
        |FROM base WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
        |UNION ALL
        |SELECT 'insert', o_orderkey + 1000000, 'N', o_totalprice
        |FROM base WHERE o_orderkey % 11 = 0
        |ORDER BY o_orderkey, change_type""".stripMargin,

    "q_d2_manifest_upsert" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * CAST(2.0 AS DOUBLE)
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_d2_upsert_pruned" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * CAST(2.0 AS DOUBLE)
        |       ELSE o_totalprice END AS o_totalprice,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )

  /** Closed-form DuckDB SQL for the predictions pipeline output —
    * shared with the KPI/EDA oracles (QueriesAnalysis), which wrap it
    * as a derived table. `withDay = true` appends the claim's service
    * day, mirroring Pipelines.predictions(keepDay = true).
    */
  def predictionsSql(withDay: Boolean = false): String = {
    val dayCol = if (withDay) ", CAST(l_shipdate AS DATE) AS day" else ""
    val daySel = if (withDay) ", day" else ""
    s"""WITH claims AS (
       |  SELECT l_orderkey AS visit_id, l_orderkey * 10 + l_linenumber AS uid,
       |         l_partkey AS svc, l_shipdate, l_linenumber$dayCol,
       |         CASE WHEN l_orderkey % 53 = 0 AND l_linenumber = 1 THEN NULL
       |              ELSE 'ICD-' || CAST(l_partkey % 500 AS VARCHAR) END AS icd10
       |  FROM lineitem),
       |nodx AS (
       |  SELECT visit_id FROM claims GROUP BY visit_id
       |  HAVING max(CASE WHEN icd10 IS NULL THEN 1 ELSE 0 END) = 1),
       |kept AS (
       |  SELECT uid FROM (
       |    SELECT uid, row_number() OVER (PARTITION BY visit_id, svc
       |      ORDER BY l_shipdate ASC, l_linenumber ASC, uid ASC) AS rn
       |    FROM claims) t WHERE rn = 1),
       |dup AS (SELECT uid FROM claims EXCEPT SELECT uid FROM kept)
       |SELECT visit_id, uid, svc$daySel,
       |  CASE WHEN visit_id IN (SELECT visit_id FROM nodx) THEN 'Rejected'
       |       WHEN uid IN (SELECT uid FROM dup) THEN 'Rejected'
       |       WHEN visit_id % 97 = 0 THEN 'Failed to reach LLM'
       |       WHEN uid % 5 = 0 THEN 'Rejected'
       |       ELSE 'Approved' END AS medical_prediction,
       |  CASE WHEN visit_id IN (SELECT visit_id FROM nodx) THEN 'Missing diagnosis'
       |       WHEN uid IN (SELECT uid FROM dup) THEN 'Duplicated Service'
       |       WHEN visit_id % 97 = 0 THEN NULL
       |       WHEN uid % 5 = 0 THEN 'service ' || CAST(uid AS VARCHAR) || ' is a duplicate order'
       |       END AS reason
       |FROM claims""".stripMargin
  }

  /** The resubmission oracle reuses SparkEntry's full-extraction SQL as
    * a derived table and cross-joins the five business units.
    */
  private def resubmissionOracle: String = {
    val fullSql = graft.SparkEntry.resubmissionFullSql
    s"""SELECT f.visit_id, f.seq_no, f.visit_service_id, f.service_name,
       |  f.justification_type, f.reason, f.reason_code, f.status,
       |  CASE WHEN f.visit_id % 97 = 0 THEN 'Failed to reach LLM'
       |       ELSE 'clinical justification for service ' || CAST(f.visit_service_id AS VARCHAR)
       |       END AS justification,
       |  b.bu
       |FROM (
       |$fullSql
       |) f CROSS JOIN (VALUES ('AKW'), ('ALW'), ('LCH'), ('MKR'), ('SNB')) b(bu)
       |ORDER BY b.bu, f.visit_id, f.seq_no, f.reason, f.service_name, f.reason_code, f.status""".stripMargin
  }
}
