package graft.relational

import graft.SharedSpark
import graft.ops.ColumnOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("incrementalWindow keeps rows within the lookback of the max, inclusive") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 09:31:00")),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 09:30:00")), // exactly at max - 30min
      (4L, java.sql.Timestamp.valueOf("2024-01-01 09:29:59"))
    ).toDF("id", "ts")
    val kept = EligibilityExtract.incrementalWindow(df, "ts", 30).select($"id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L), "the >= cutoff keeps the boundary row; older rows drop")
  }

  test("latestPerGroup returns exactly one row per group, the greatest by order") {
    val df = Seq(
      (1L, "R", 3, "2024-01-03"), (1L, "R", 1, "2024-01-05"), (1L, "A", 2, "2024-01-01"),
      (2L, "R", 9, "2024-01-02")
    ).toDF("order_key", "flag", "line", "d").withColumn("d", to_date($"d"))
    val out = ColumnOps.latestPerGroup(df, Seq($"order_key", $"flag"), Seq($"d", $"line"))
      .select($"order_key", $"flag", $"line").as[(Long, String, Int)].collect().toSet
    assert(out == Set((1L, "R", 1), (1L, "A", 2), (2L, "R", 9)))
  }

  test("latestGroupAllRows keeps every row tied at the group maximum") {
    val df = Seq(
      // group 1: two rows tie on the latest date — BOTH must survive
      (1L, 1, "2024-01-05"), (1L, 2, "2024-01-05"), (1L, 3, "2024-01-03"),
      // group 2: no tie — one survivor
      (2L, 9, "2024-01-02"), (2L, 8, "2024-01-01")
    ).toDF("order_key", "line", "d").withColumn("d", to_date($"d"))
    val out = ColumnOps.latestGroupAllRows(df, Seq($"order_key"), Seq($"d"))
      .select($"order_key", $"line").as[(Long, Int)].collect().toSet
    assert(out == Set((1L, 1), (1L, 2), (2L, 9)),
      "dense_rank must keep all items of the latest transaction, not one")
  }

  test("flaggedOrders only flags orders with a returned (R) red-named item") {
    val li = Seq(
      (1L, 10L, "R"), (2L, 20L, "A"), (3L, 10L, "N")
    ).toDF("l_orderkey", "l_partkey", "l_returnflag")
    val part = Seq((10L, "dark red anvil"), (20L, "red gizmo")).toDF("p_partkey", "p_name")
    val flagged = ResubmissionExtract.flaggedOrders(li, part).as[Long].collect().toSet
    assert(flagged == Set(1L), "order 2 is red but not returned; order 3 returned-N")
  }

  test("branch union is disjoint-by-reason and distinct removes duplicate claim rows") {
    val mn = ResubmissionExtract.branchMN(spark, "/root/testdata/sf0.001")
    val di = ResubmissionExtract.branchDI(spark, "/root/testdata/sf0.001")
    assert(mn.select($"reason").distinct().as[String].collect().toSeq == Seq("Medical Necessity"))
    val full = ResubmissionExtract.full(spark, "/root/testdata/sf0.001")
    assert(full.count() == 100, "TOP-100 cap")
    // The FULL ordering key (every column two distinct claim rows can
    // differ in): its uniqueness is what makes the LIMIT cut — and so
    // the oracle compare — deterministic. (visit_id, seq_no, reason)
    // alone is NOT unique once both branches emit rows: the same item
    // can surface with different status or part attributes.
    assert(full.select($"visit_id", $"seq_no", $"reason", $"service_name",
        $"reason_code", $"status").distinct().count() == 100,
      "ordering key is unique across the limited set")
  }

  test("classifyVisit and justificationType bucket deterministically") {
    val p = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED").toDF("o_orderpriority")
    val cls = p.select(ResubmissionExtract.classifyVisit($"o_orderpriority")).as[String].collect().toSeq
    assert(cls == Seq("ER", "ER", "IP", "OPD"))
    val b = Seq("Brand#11", "Brand#45").toDF("p_brand")
    val jt = b.select(ResubmissionExtract.justificationType($"p_brand")).as[String].collect().toSeq
    assert(jt == Seq("Duplicated Services", "Medical Necessity"))
  }
}
