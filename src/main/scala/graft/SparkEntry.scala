package graft

import graft.ops.ColumnOps
import graft.relational.{EligibilityExtract, ResubmissionExtract}
import graft.tables.TestTables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one entry per implemented operator from SURVEY.md §2.
  * Every query is deterministic (explicit ORDER BY on a unique key, no
  * wall-clock) so the DuckDB-oracle hash compare is stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ResubmissionExtract.full(spark, "/root/testdata/sf0.001")

  // ---- shared oracle-SQL fragments (kept in lockstep with ColumnOps) ----

  /** Birthday-adjusted age — the exact formula of ColumnOps.exactAge. */
  private def ageSql(dob: String, asOf: String): String =
    s"CAST(year($asOf) - year($dob) - CASE WHEN (month($asOf) < month($dob)) " +
      s"OR (month($asOf) = month($dob) AND day($asOf) < day($dob)) THEN 1 ELSE 0 END AS INT)"

  private val brandsIn = ResubmissionExtract.rejectionBrands.map(b => s"'$b'").mkString(", ")
  private val dupBrandsIn = Seq("Brand#11", "Brand#12", "Brand#13", "Brand#14", "Brand#15").map(b => s"'$b'").mkString(", ")

  private val justifTypeSql =
    s"CASE WHEN p_brand IN ($dupBrandsIn) THEN 'Duplicated Services' ELSE 'Medical Necessity' END"
  private val classifySql =
    "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'ER' " +
      "WHEN o_orderpriority IN ('3-MEDIUM') THEN 'IP' ELSE 'OPD' END"

  /** Shared CTE text for the resubmission branches (mirrors
    * ResubmissionExtract.latestItems / flaggedOrders).
    */
  private val latestOrderSql =
    ResubmissionExtract.latestItemsOrder.map(c => s"$c DESC").mkString(", ")
  private val latestCte =
    s"""latest AS (
       |  SELECT * EXCLUDE (rn) FROM (
       |    SELECT l.*, row_number() OVER (PARTITION BY l_orderkey, l_returnflag
       |                                   ORDER BY $latestOrderSql) AS rn
       |    FROM lineitem l) t WHERE rn = 1)""".stripMargin
  private val flaggedCte =
    """flagged AS (
      |  SELECT DISTINCT l_orderkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE lower(p_name) LIKE '%red%' AND l_returnflag = 'R')""".stripMargin

  private def projectClaimsSql(reason: String): String =
    s"""SELECT i.l_orderkey AS visit_id, i.l_linenumber AS seq_no,
       |  i.l_orderkey * 10 + i.l_linenumber AS visit_service_id,
       |  p_name AS service_name, p_brand AS reason_code,
       |  $justifTypeSql AS justification_type,
       |  c_name AS patient_name,
       |  ${ageSql("CAST(o_orderdate AS DATE)", "DATE '2026-01-01'")} AS age,
       |  $classifySql AS visit_classification,
       |  CAST(o_orderdate AS DATE) AS visit_start_date,
       |  i.l_returnflag AS status, '$reason' AS reason""".stripMargin

  private def branchMnSql: String =
    s"""WITH $latestCte,
       |mn AS (
       |  SELECT latest.* FROM latest JOIN part ON l_partkey = p_partkey
       |  WHERE l_returnflag = 'R' AND p_brand IN ($brandsIn)
       |    AND NOT coalesce(p_name, '') LIKE '%blue%')
       |${projectClaimsSql("Medical Necessity")}
       |FROM mn i
       |JOIN orders ON i.l_orderkey = o_orderkey
       |LEFT JOIN customer ON o_custkey = c_custkey
       |JOIN part ON i.l_partkey = p_partkey""".stripMargin

  private def branchDiSql: String =
    s"""WITH $latestCte,
       |$flaggedCte,
       |di AS (
       |  SELECT latest.* FROM latest WHERE l_orderkey IN (SELECT l_orderkey FROM flagged))
       |${projectClaimsSql("Drug Interaction")}
       |FROM di i
       |JOIN orders ON i.l_orderkey = o_orderkey
       |LEFT JOIN customer ON o_custkey = c_custkey
       |JOIN part ON i.l_partkey = p_partkey""".stripMargin

  private val maritalCaseSql =
    "CASE CAST(c_custkey % 16 AS VARCHAR) " +
      EligibilityExtract.maritalMapping.map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ") +
      " ELSE 'U' END"
  private val idTypeCaseSql =
    "CASE CAST(c_nationkey % 5 AS VARCHAR) " +
      EligibilityExtract.idTypeMapping.map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ") +
      " ELSE 'NI' END"

  // ---- the registry ----

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ graft.registry.QueriesB.queries ++ graft.registry.QueriesParse.queries ++
      graft.registry.QueriesEnrich.queries ++ graft.registry.QueriesPipeline.queries ++
      graft.registry.QueriesData.queries ++ graft.registry.QueriesStream.queries ++
      graft.registry.QueriesAnalysis.queries ++ graft.registry.QueriesSample.queries ++
      graft.registry.QueriesTemporal.queries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: table scan with predicate.
    "q_a01_scan_filter" -> ((s, dir) => {
      TestTables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          to_date(col("l_shipdate")).as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // A2: incremental time-window scan with data-derived high-water mark.
    "q_a02_incremental_window" -> ((s, dir) => {
      val ev = TestTables.events(s, dir)
      val hi = ev.agg(max(col("ts")).as("__hi"))
      ev.join(broadcast(hi))
        .filter(col("ts") >= ColumnOps.minutesBefore(col("__hi"), 270))
        .select(col("event_id"), col("ts_us"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // A3: multi-way left equi-join, dimensions broadcast.
    "q_a03_multijoin" -> ((s, dir) => {
      val o = TestTables.orders(s, dir); val c = TestTables.customer(s, dir)
      val n = TestTables.nation(s, dir); val r = TestTables.region(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
        .select(col("o_orderkey"), col("c_name"), col("n_name"), col("r_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // A4: inner join on expression key + constant predicate. Supplier
    // scales with the data, so the broadcast hint is evidence-gated.
    "q_a04_expr_join" -> ((s, dir) => {
      val o = TestTables.orders(s, dir); val sup = TestTables.supplier(s, dir)
      o.join(graft.ops.Joins.broadcastIfSmall(sup),
          sup("s_suppkey") === coalesce(nullif(o("o_custkey") % 10, lit(0)), lit(10)) &&
            sup("s_nationkey") < 25)
        .select(col("o_orderkey"), col("s_suppkey"), col("s_name"))
        .orderBy(col("o_orderkey"))
    }),

    // A5-A10: the full eligibility wide projection (8-way star join).
    // r12 OPT: rangeByVisit pre-partitions the fact scan so the
    // trailing ORDER BY is a local sort (see EligibilityExtract.build).
    "q_eligibility_extract" -> ((s, dir) =>
      EligibilityExtract.build(s, dir, rangeByVisit = true).orderBy(col("visit_id"))),

    // A2 variant on the business query: 7-day incremental window.
    "q_eligibility_window" -> ((s, dir) =>
      EligibilityExtract.build(s, dir, windowMinutes = 7 * 24 * 60, rangeByVisit = true)
        .orderBy(col("visit_id"))),

    // A6: 16-branch CASE value mapping.
    "q_a06_case_map" -> ((s, dir) => {
      TestTables.customer(s, dir)
        .select(col("c_custkey"),
          ColumnOps.caseMap((col("c_custkey") % 16).cast("string"), EligibilityExtract.maritalMapping, "U").as("marital_char"),
          ColumnOps.caseMap((col("c_nationkey") % 5).cast("string"), EligibilityExtract.idTypeMapping, "NI").as("nationality"))
        .orderBy(col("c_custkey"))
    }),

    // A7: NULL-skipping concat (concat_ws).
    "q_a07_concat_ws" -> ((s, dir) => {
      TestTables.customer(s, dir)
        .select(col("c_custkey"),
          ColumnOps.nameConcat(col("c_name"), nullif(col("c_mktsegment"), lit("MACHINERY")), col("c_mktsegment")).as("patient_name"))
        .orderBy(col("c_custkey"))
    }),

    // A8/A9: date cast, month floor, interval arithmetic.
    "q_a08_a09_date_ops" -> ((s, dir) => {
      TestTables.orders(s, dir)
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date"),
          ColumnOps.monthFloor(to_date(col("o_orderdate"))).as("month_start"),
          (col("o_orderdate") - expr("INTERVAL 270 MINUTES")).as("overlap_cutoff"))
        .orderBy(col("o_orderkey"))
    }),

    // A10: exact birthday-adjusted age.
    "q_a10_age" -> ((s, dir) => {
      TestTables.orders(s, dir)
        .select(col("o_orderkey"),
          ColumnOps.exactAge(to_date(col("o_orderdate")), to_date(lit("2026-01-01"))).as("age"))
        .orderBy(col("o_orderkey"))
    }),

    // A11: latest-per-group window (row_number = 1).
    // r12 OPT (guide §2.4 — establish the partitioning once): the
    // final ORDER BY keys equal the window's PARTITION BY keys, so
    // range-partition the scan FIRST. RangePartitioning(k) satisfies
    // the window's ClusteredDistribution(k) (no hash exchange), the
    // window's own sort starts with (k asc), and the trailing global
    // sort is therefore already satisfied — the old plan's second
    // (range) exchange, its duplicate execution of the window tail in
    // the range sampler, and the final sort all disappear. The range
    // sampler now samples the bare scan instead of the window output.
    "q_a11_latest_per_group" -> ((s, dir) =>
      ResubmissionExtract.latestItems(
          TestTables.lineitem(s, dir)
            .repartitionByRange(col("l_orderkey"), col("l_returnflag")))
        .select(col("l_orderkey"), col("l_returnflag"), col("l_linenumber"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_returnflag"))),

    // A11b: DENSE_RANK keep-all-ties — every lineitem on the order's
    // latest ship date survives (ties are real in TPC-H data).
    "q_a11_dense_rank" -> ((s, dir) =>
      ColumnOps.latestGroupAllRows(
          TestTables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate")),
          Seq(col("l_orderkey")), Seq(col("l_shipdate")))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // A12: order-deterministic grouped string aggregation.
    // r12 OPT: same one-exchange shape as q_a11_latest_per_group —
    // the ORDER BY key is the grouping key, so range-partition the
    // fact scan first: the groupBy plans no hash exchange (range
    // partitioning clusters equal keys) and the trailing sort becomes
    // a partition-local sort of the aggregated rows. Nothing is lost
    // map-side: collect_list partial aggregation never shrinks the
    // shuffle anyway (the lists carry every row).
    // SCALE POSTURE (r12 ADVICE): this shape — like the q_a11 and
    // eligibility rangeByVisit wins — assumes the part/dimension joins
    // stay BROADCAST (dimensions are sublinear in SF). If AQE ever
    // flips one to a shuffle join at a larger SF, that join's hash
    // exchange destroys the up-front range partitioning and the
    // repartitionByRange degrades to a pure extra full-fact shuffle
    // (results unchanged, perf only). A plan showing rangepartitioning
    // BELOW a ShuffledJoin is that flip, not an unrelated regression —
    // drop the repartition in that world.
    "q_a12_string_agg" -> ((s, dir) =>
      ResubmissionExtract.diagnosisAgg(
          TestTables.lineitem(s, dir).repartitionByRange(col("l_orderkey")),
          TestTables.part(s, dir))
        .orderBy(col("l_orderkey"))),

    // A13: CTE / derived-table composition (same SQL text runs in DuckDB).
    "q_a13_cte" -> ((s, dir) => {
      TestTables.registerAll(s, dir)
      s.sql(
        """WITH big_orders AS (
          |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 50000),
          |flagged_items AS (
          |  SELECT l_orderkey, count(*) AS n_items,
          |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
          |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey)
          |SELECT b.o_orderkey, b.o_totalprice, f.n_items, f.gross
          |FROM big_orders b JOIN flagged_items f ON b.o_orderkey = f.l_orderkey
          |ORDER BY b.o_orderkey""".stripMargin)
    }),

    // A14: DISTINCT projection.
    "q_a14_distinct" -> ((s, dir) =>
      TestTables.customer(s, dir).select(col("c_mktsegment"), col("c_nationkey")).distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey"))),

    // A15: LIKE / null-guarded NOT LIKE.
    "q_a15_like" -> ((s, dir) =>
      TestTables.part(s, dir)
        // nullif plants genuine NULLs (the synthetic part table has
        // none) so the null-guarded NOT LIKE is load-bearing: PROMO-
        // typed red parts survive ONLY through the coalesce guard.
        .filter(lower(col("p_name")).like("%red%") &&
          ColumnOps.notLikeNullSafe(nullif(col("p_type"), lit("PROMO")), "%SMALL%"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey"))),

    // A16: IN-list predicates (21-code whitelist analog).
    "q_a16_inlist" -> ((s, dir) =>
      TestTables.part(s, dir)
        .filter(col("p_brand").isin(ResubmissionExtract.rejectionBrands: _*))
        .select(col("p_partkey"), col("p_brand"))
        .orderBy(col("p_partkey"))),

    // A17: categorical bucketing CASE.
    "q_a17_bucketing" -> ((s, dir) =>
      TestTables.orders(s, dir)
        .select(col("o_orderkey"), ResubmissionExtract.classifyVisit(col("o_orderpriority")).as("visit_classification"))
        .orderBy(col("o_orderkey"))),

    // A18: COALESCE change-date + day-range filter.
    "q_a18_coalesce_date" -> ((s, dir) => {
      val o = TestTables.orders(s, dir)
      val li7 = TestTables.lineitem(s, dir).filter(col("l_linenumber") === 7)
        .select(col("l_orderkey"), col("l_shipdate"))
      val hi = o.agg(max(to_date(col("o_orderdate"))).as("__hi"))
      o.join(li7, o("o_orderkey") === li7("l_orderkey"), "left")
        .join(broadcast(hi))
        .withColumn("change_date", coalesce(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
        .filter(col("change_date") >= date_sub(col("__hi"), 30))
        .select(col("o_orderkey"), col("change_date"))
        .orderBy(col("o_orderkey"))
    }),

    // A19 + A20 + A14: the two resubmission branches and their union.
    "q_r_branch_mn" -> ((s, dir) =>
      ResubmissionExtract.branchMN(s, dir).orderBy(col("visit_id"), col("seq_no"))),
    "q_r_branch_di" -> ((s, dir) =>
      ResubmissionExtract.branchDI(s, dir).orderBy(col("visit_id"), col("seq_no"))),
    "q_resubmission_full" -> ((s, dir) => ResubmissionExtract.full(s, dir)),

    // A20: semi-join in isolation.
    "q_a20_semijoin" -> ((s, dir) => {
      val li = TestTables.lineitem(s, dir)
      li.join(ResubmissionExtract.flaggedOrders(li, TestTables.part(s, dir)), Seq("l_orderkey"), "left_semi")
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // A21: TOP-N with deterministic ordering.
    "q_a21_topn" -> ((s, dir) =>
      TestTables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(100)),

    // A22: != filter with SQL null-drop semantics.
    "q_a22_neq_nulldrop" -> ((s, dir) =>
      TestTables.lineitem(s, dir)
        .filter(nullif(col("l_returnflag"), lit("A")) =!= "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // A23: parameterized ID-list → semi-join, no string templating.
    "q_a23_idlist_semijoin" -> ((s, dir) => {
      import s.implicits._
      val ids = Seq(1L, 7L, 32L, 33L, 34L, 35L, 36L, 37L, 38L, 39L).toDF("l_orderkey")
      TestTables.lineitem(s, dir).join(broadcast(ids), Seq("l_orderkey"), "left_semi")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
  )

  /** DuckDB-dialect oracle for each query above. Column aliases match the
    * Spark side exactly (the driver sorts columns by name before hashing).
    */
  def oracleSql: Map[String, String] =
    baseOracleSql ++ moreOracleSql ++ graft.registry.QueriesB.oracleSql ++
      graft.registry.QueriesParse.oracleSql ++ graft.registry.QueriesEnrich.oracleSql ++
      graft.registry.QueriesPipeline.oracleSql ++ graft.registry.QueriesData.oracleSql ++
      graft.registry.QueriesStream.oracleSql ++ graft.registry.QueriesAnalysis.oracleSql ++
      graft.registry.QueriesSample.oracleSql ++ graft.registry.QueriesTemporal.oracleSql

  private def baseOracleSql: Map[String, String] = Map(
    "q_a01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_a02_incremental_window" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 270 MINUTES
        |ORDER BY event_id""".stripMargin,

    "q_a03_multijoin" ->
      """SELECT o_orderkey, c_name, n_name, r_name, o_totalprice
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_a04_expr_join" ->
      """SELECT o_orderkey, s_suppkey, s_name
        |FROM orders JOIN supplier
        |  ON s_suppkey = coalesce(nullif(o_custkey % 10, 0), 10) AND s_nationkey < 25
        |ORDER BY o_orderkey""".stripMargin,

    "q_eligibility_extract" -> eligibilityOracle(windowed = false),
    "q_eligibility_window" -> eligibilityOracle(windowed = true),

    "q_a06_case_map" ->
      s"""SELECT c_custkey, $maritalCaseSql AS marital_char, $idTypeCaseSql AS nationality
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_a07_concat_ws" ->
      """SELECT c_custkey, concat_ws(' ', c_name, nullif(c_mktsegment, 'MACHINERY'), c_mktsegment) AS patient_name
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_a08_a09_date_ops" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
        |  o_orderdate - INTERVAL 270 MINUTES AS overlap_cutoff
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_a10_age" ->
      s"""SELECT o_orderkey, ${ageSql("CAST(o_orderdate AS DATE)", "DATE '2026-01-01'")} AS age
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_a11_latest_per_group" ->
      s"""SELECT l_orderkey, l_returnflag, l_linenumber, l_shipdate
         |FROM (SELECT l.*, row_number() OVER (PARTITION BY l_orderkey, l_returnflag
         |                                     ORDER BY $latestOrderSql) AS rn
         |      FROM lineitem l) t
         |WHERE rn = 1 ORDER BY l_orderkey, l_returnflag""".stripMargin,

    "q_a11_dense_rank" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate
        |FROM (SELECT l_orderkey, l_linenumber, l_shipdate,
        |             dense_rank() OVER (PARTITION BY l_orderkey
        |                                ORDER BY l_shipdate DESC) AS rn
        |      FROM lineitem) t
        |WHERE rn = 1 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_a12_string_agg" ->
      """SELECT l_orderkey, string_agg(p_name, ' , ' ORDER BY l_linenumber, p_name) AS diagnosis
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_a13_cte" ->
      """WITH big_orders AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 50000),
        |flagged_items AS (
        |  SELECT l_orderkey, count(*) AS n_items,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey)
        |SELECT b.o_orderkey, b.o_totalprice, f.n_items, f.gross
        |FROM big_orders b JOIN flagged_items f ON b.o_orderkey = f.l_orderkey
        |ORDER BY b.o_orderkey""".stripMargin,

    "q_a14_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "q_a15_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE lower(p_name) LIKE '%red%'
        |  AND NOT coalesce(nullif(p_type, 'PROMO'), '') LIKE '%SMALL%'
        |ORDER BY p_partkey""".stripMargin,

    "q_a16_inlist" ->
      s"""SELECT p_partkey, p_brand FROM part WHERE p_brand IN ($brandsIn)
         |ORDER BY p_partkey""".stripMargin,

    "q_a17_bucketing" ->
      s"""SELECT o_orderkey, $classifySql AS visit_classification
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_a18_coalesce_date" ->
      """SELECT o_orderkey,
        |  coalesce(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS change_date
        |FROM orders
        |LEFT JOIN (SELECT l_orderkey, l_shipdate FROM lineitem WHERE l_linenumber = 7) li
        |  ON o_orderkey = li.l_orderkey
        |WHERE coalesce(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))
        |      >= (SELECT max(CAST(o_orderdate AS DATE)) FROM orders) - 30
        |ORDER BY o_orderkey""".stripMargin,

    "q_r_branch_mn" -> (branchMnSql + "\nORDER BY visit_id, seq_no"),
    "q_r_branch_di" -> (branchDiSql + "\nORDER BY visit_id, seq_no"),

    "q_resubmission_full" -> resubmissionFullSql,
  )

  /** Shared with QueriesPipeline (the justification pipeline wraps it). */
  def resubmissionFullSql: String =
      s"""WITH mn_branch AS ($branchMnSql),
         |di_branch AS ($branchDiSql),
         |unioned AS (SELECT DISTINCT * FROM (SELECT * FROM mn_branch UNION ALL SELECT * FROM di_branch) u),
         |diag AS (
         |  SELECT l_orderkey, string_agg(p_name, ' , ' ORDER BY l_linenumber, p_name) AS diagnosis
         |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY l_orderkey)
         |SELECT u.*, d.diagnosis
         |FROM unioned u LEFT JOIN diag d ON u.visit_id = d.l_orderkey
         |ORDER BY visit_id, seq_no, reason, service_name, reason_code, status
         |LIMIT 100""".stripMargin

  private def moreOracleSql: Map[String, String] = Map(
    "q_a20_semijoin" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT DISTINCT l_orderkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE lower(p_name) LIKE '%red%' AND l_returnflag = 'R')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_a21_topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_a22_neq_nulldrop" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE nullif(l_returnflag, 'A') != 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_a23_idlist_semijoin" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN (1, 7, 32, 33, 34, 35, 36, 37, 38, 39)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )

  private def eligibilityOracle(windowed: Boolean): String = {
    val windowPred = if (windowed)
      "\n  AND o_orderdate >= (SELECT max(o_orderdate) FROM orders WHERE o_orderstatus <> 'F' AND o_orderpriority <> '5-LOW') - INTERVAL 10080 MINUTES"
    else ""
    s"""SELECT o_orderkey AS visit_id,
       |  CAST(o_orderdate AS DATE) AS start_date,
       |  strftime(o_orderdate, '%Y-%m-%d') AS start_date_str,
       |  c_custkey AS patient_id,
       |  CAST(o_orderdate AS DATE) AS date_of_birth,
       |  concat_ws(' ', c_name, c_mktsegment, n_name) AS patient_name,
       |  c_name AS family_name,
       |  CASE WHEN c_custkey % 2 = 0 THEN 'male' ELSE 'female' END AS gender,
       |  CAST(c_nationkey AS BIGINT) AS nationality_id,
       |  $maritalCaseSql AS marital_char,
       |  $idTypeCaseSql AS nationality,
       |  n_name AS en_name,
       |  try_cast(substr(c_name, 10, 8) AS BIGINT) AS iqama_no,
       |  1 AS organization_code,
       |  'Andalusia-Spark' AS organization_name,
       |  CAST(10000500 AS BIGINT) AS provider_license,
       |  concat_ws('-', 'POL', CAST(o_orderkey AS VARCHAR)) AS policy_number,
       |  r_name AS purchaser_name,
       |  s_name AS payer_name,
       |  CAST(s_suppkey AS BIGINT) AS payer_license,
       |  ${ageSql("CAST(o_orderdate AS DATE)", "DATE '2026-01-01'")} AS age,
       |  date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
       |  o_totalprice AS total_price,
       |  o_totalprice * CAST(0.9 AS DOUBLE) AS net_price,
       |  o_orderstatus AS visit_status,
       |  o_orderpriority AS financial_status,
       |  c_mktsegment AS segment,
       |  c_acctbal AS account_balance,
       |  upper(n_name) AS nation_uc,
       |  lower(r_name) AS region_lc
       |FROM orders
       |LEFT JOIN customer ON o_custkey = c_custkey
       |LEFT JOIN nation ON c_nationkey = n_nationkey
       |LEFT JOIN region ON n_regionkey = r_regionkey
       |JOIN supplier ON s_suppkey = coalesce(nullif(o_custkey % 10, 0), 10) AND s_nationkey < 25
       |WHERE o_orderstatus <> 'F' AND o_orderpriority <> '5-LOW'$windowPred
       |ORDER BY visit_id""".stripMargin
  }
}
