package graft.relational

import graft.ops.ColumnOps
import graft.tables.TestTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The richest reference query re-expressed Spark-first: the daily
  * rejected-claims extraction (reference sql/resubmission.sql:2-209 and
  * sql/resubmission_update.sql:1-224). Exercises CTE composition (A13),
  * dense-rank latest-per-group (A11), STRING_AGG (A12), LIKE/IN filters
  * (A15/A16), categorical bucketing (A17), UNION ALL (A19), semi-join
  * (A20), DISTINCT (A14) and TOP-N (A21).
  *
  * Domain mapping onto the test tables (FIXTURES.md §4): orders =
  * claim/visit transactions, lineitem = claim items, part = service
  * catalog, customer = patient. Every stage is also registered
  * individually in SparkEntry so the driver's DuckDB oracle checks each
  * operator in isolation.
  *
  * Scale notes (100 TB posture):
  *  - `part` is a catalog dimension but GROWS with SF (sf100 → 20 M
  *    rows): no static broadcast hint — the planner's parquet size
  *    stats pick broadcast while it measures small and AQE re-decides
  *    at runtime, so only lineitem (the fact) shuffles at test scale
  *    and nothing OOMs at 100×.
  *  - latest-per-group window and the diagnosis string-agg share the
  *    l_orderkey partitioning, so Catalyst reuses one exchange.
  *  - the "flagged" set is produced as a distinct key list and joined
  *    left_semi — never collected to the driver.
  */
object ResubmissionExtract {

  // 21-code rejection whitelist analog (sql/resubmission_update.sql:51-74).
  val rejectionBrands: Seq[String] = Seq(
    "Brand#11", "Brand#12", "Brand#13", "Brand#14", "Brand#15",
    "Brand#21", "Brand#22", "Brand#23", "Brand#24", "Brand#25",
    "Brand#31", "Brand#32", "Brand#33", "Brand#34", "Brand#35",
    "Brand#41", "Brand#42", "Brand#43", "Brand#44", "Brand#45", "Brand#51")

  /** CTE 1 analog — "drug interaction" flagged transactions: DISTINCT
    * order keys whose item's service name matches a reason pattern
    * (ResponseReason LIKE '% drug interaction %', sql/resubmission.sql:2-25).
    */
  def flaggedOrders(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, lineitem("l_partkey") === part("p_partkey"))
      .filter(lower(col("p_name")).like("%red%") && col("l_returnflag") === "R")
      .select(col("l_orderkey")).distinct()

  /** CTE 2 analog — latest request per (order, returnflag):
    * ROW_NUMBER() OVER (PARTITION BY … ORDER BY shipdate DESC, line DESC)
    * = 1 (sql/resubmission.sql:55-68). The order list continues through
    * every remaining column: (shipdate, linenumber) alone is NOT total
    * in this data — ties picked different winners (different partkeys)
    * on different engines, found as an off-by-one at sf0.1.
    */
  val latestItemsOrder: Seq[String] = Seq(
    "l_shipdate", "l_linenumber", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_linestatus")

  def latestItems(lineitem: DataFrame): DataFrame =
    ColumnOps.latestPerGroup(
      lineitem,
      keys = Seq(col("l_orderkey"), col("l_returnflag")),
      order = latestItemsOrder.map(col))

  /** Diagnosis STRING_AGG analog: service names per order, ' , '-joined
    * in line order (sql/resubmission.sql:78-90 — STRING_AGG(name,' , ')).
    */
  def diagnosisAgg(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(ColumnOps.stringAgg(col("l_linenumber"), col("p_name"), " , ").as("diagnosis"))

  /** Visit-classification bucketing analog (sql/resubmission_update.sql:105-119). */
  def classifyVisit(priority: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(priority.isin("1-URGENT", "2-HIGH"), "ER")
      .when(priority.isin("3-MEDIUM"), "IP")
      .otherwise("OPD")

  /** Justification-type bucketing (sql/resubmission_update.sql:9-40). */
  def justificationType(brand: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(brand.isin("Brand#11", "Brand#12", "Brand#13", "Brand#14", "Brand#15"), "Duplicated Services")
      .otherwise("Medical Necessity")

  private val asOf = to_date(lit("2026-01-01"))

  /** Common projection shared by both branches (23-col shape analog). */
  private def projectClaims(items: DataFrame, orders: DataFrame, customer: DataFrame,
                            part: DataFrame, reasonTag: String): DataFrame =
    items
      .join(orders, items("l_orderkey") === orders("o_orderkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
      .join(part, items("l_partkey") === part("p_partkey"))
      .select(
        col("l_orderkey").as("visit_id"),
        col("l_linenumber").as("seq_no"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("visit_service_id"),
        col("p_name").as("service_name"),
        col("p_brand").as("reason_code"),
        justificationType(col("p_brand")).as("justification_type"),
        col("c_name").as("patient_name"),
        ColumnOps.exactAge(to_date(col("o_orderdate")), asOf).as("age"),
        classifyVisit(col("o_orderpriority")).as("visit_classification"),
        to_date(col("o_orderdate")).as("visit_start_date"),
        col("l_returnflag").as("status"),
        lit(reasonTag).as("reason"))

  /** Branch 1 — "medical necessity" rejections: latest items in the
    * rejection-code whitelist, excluding packaged/accommodation-like
    * services (NOT LIKE, null-guarded) (sql/resubmission.sql:26-116).
    */
  def branchMN(spark: SparkSession, dir: String): DataFrame = {
    val li = TestTables.lineitem(spark, dir); val p = TestTables.part(spark, dir)
    val items = latestItems(li)
      .filter(col("l_returnflag") === "R")
    val withPart = items.join(p, items("l_partkey") === p("p_partkey"))
      .filter(col("p_brand").isin(rejectionBrands: _*))
      .filter(ColumnOps.notLikeNullSafe(col("p_name"), "%blue%"))
      .select(li.columns.map(col): _*)
    projectClaims(withPart, TestTables.orders(spark, dir), TestTables.customer(spark, dir), p, "Medical Necessity")
  }

  /** Branch 2 — "drug interaction" claims: all latest items of flagged
    * orders (semi-join, sql/resubmission.sql:74-75,117-209).
    */
  def branchDI(spark: SparkSession, dir: String): DataFrame = {
    val li = TestTables.lineitem(spark, dir); val p = TestTables.part(spark, dir)
    val items = latestItems(li)
      .join(flaggedOrders(li, p), Seq("l_orderkey"), "left_semi")
    projectClaims(items, TestTables.orders(spark, dir), TestTables.customer(spark, dir), p, "Drug Interaction")
  }

  /** Full extraction: (MN ∪ DI) DISTINCT, joined to the per-visit
    * diagnosis aggregate, ordered, TOP 100 per the recovery variant
    * (sql/resubmission_update.sql:97).
    *
    * r12 OPT (guide §2.4 — remove shuffles outright / share passes):
    * the literal `branchMN ∪ branchDI` form computed the
    * latest-per-group WINDOW twice (the branch plans share the
    * l_orderkey exchange via ReuseExchange, but each re-runs the sort
    * + window + filter above it) and ran the orders/customer/part
    * joins twice. Both branches are pure row-filters over the SAME
    * `latest` frame, so run the window and the star joins ONCE and
    * explode a per-row reason tag instead: a row satisfying the MN
    * predicate emits "Medical Necessity", a row of a flagged order
    * emits "Drug Interaction", a row satisfying both emits both rows —
    * exactly the union's multiset, fed into the same DISTINCT.
    * Measured at sf0.1/local[32] (subset A/B, 5 passes):
    * q_resubmission_full 4.25 → 2.89 s median, and the staged
    * q_pipeline_resubmission riding on it 4.06 → 3.27 s; plan 7 → 4
    * hash exchanges, 13 → 8 parquet scans (PlanShapeSpec re-pinned).
    * The standalone q_r_branch_mn / q_r_branch_di registry entries
    * keep the original single-branch builders.
    */
  def full(spark: SparkSession, dir: String): DataFrame = {
    val li = TestTables.lineitem(spark, dir)
    val p = TestTables.part(spark, dir)
    val latest = latestItems(li)
    val flagged = flaggedOrders(li, p).withColumn("__di", lit(1))
    // The MN predicate references part columns, so evaluate it after
    // the (single) part join; notLikeNullSafe never returns null, and
    // l_returnflag/p_brand are non-null, so the OR-filter below keeps
    // exactly the rows some branch keeps.
    val mnCond = col("l_returnflag") === "R" &&
      col("p_brand").isin(rejectionBrands: _*) &&
      ColumnOps.notLikeNullSafe(col("p_name"), "%blue%")
    val emptyTag = array().cast("array<string>")
    val unioned = latest
      .join(p, latest("l_partkey") === p("p_partkey"))
      .join(flagged, Seq("l_orderkey"), "left")
      .filter(mnCond || col("__di") === 1)
      .join(TestTables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(TestTables.customer(spark, dir), col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("l_orderkey").as("visit_id"),
        col("l_linenumber").as("seq_no"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("visit_service_id"),
        col("p_name").as("service_name"),
        col("p_brand").as("reason_code"),
        justificationType(col("p_brand")).as("justification_type"),
        col("c_name").as("patient_name"),
        ColumnOps.exactAge(to_date(col("o_orderdate")), asOf).as("age"),
        classifyVisit(col("o_orderpriority")).as("visit_classification"),
        to_date(col("o_orderdate")).as("visit_start_date"),
        col("l_returnflag").as("status"),
        explode(concat(
          when(mnCond, array(lit("Medical Necessity"))).otherwise(emptyTag),
          when(col("__di") === 1, array(lit("Drug Interaction"))).otherwise(emptyTag))).as("reason"))
      .distinct()
    val diag = diagnosisAgg(li, p)
    unioned
      .join(diag, unioned("visit_id") === diag("l_orderkey"), "left")
      .drop("l_orderkey")
      // l_linenumber is not unique per order in the synthetic data, so
      // (visit_id, seq_no) can tie — order by enough columns that the
      // LIMIT cut is fully deterministic for the oracle compare.
      .orderBy(col("visit_id"), col("seq_no"), col("reason"), col("service_name"),
        col("reason_code"), col("status"))
      .limit(100)
  }
}
