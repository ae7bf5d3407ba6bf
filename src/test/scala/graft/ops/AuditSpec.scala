package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AuditSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "alpha", Option(10L)), (2L, "beta", Option(20L)),
    (3L, "gamma", None), (4L, "alpha", Option(10L)), (5L, "delta", Option(40L)))
    .toDF("id", "name", "score")
  private val cols = Seq("id", "name", "score")

  private def fp(df: org.apache.spark.sql.DataFrame) =
    Audit.columnFingerprints(df, cols).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap

  test("fingerprints are row-order and partitioning independent") {
    val a = fp(base)
    assert(a == fp(base.orderBy($"id".desc)), "sort must not matter")
    assert(a == fp(base.repartition(7, $"name")), "partitioning must not matter")
    assert(a == fp(base.coalesce(1)), "parallelism must not matter")
  }

  test("a single changed value moves both checksums of exactly that column") {
    val tampered = base.withColumn("score",
      when($"id" === 2, 21L).otherwise($"score"))
    val (a, b) = (fp(base), fp(tampered))
    assert(a("id") == b("id") && a("name") == b("name"))
    assert(a("score")(2) != b("score")(2), "xor_check must move")
    assert(a("score")(3) != b("score")(3), "sum_check must move")
  }

  test("even-multiplicity duplicates blind the xor fold but not rows+sum") {
    // Append two identical rows: each column's xor gets x^x = 0 twice.
    val dup = base.unionAll(base.filter($"id" === 1)).unionAll(base.filter($"id" === 1))
    val (a, b) = (fp(base), fp(dup))
    assert(a("id")(2) == b("id")(2), "xor cancels on doubled rows")
    assert(a("id")(0) != b("id")(0), "n_rows catches it")
    assert(a("id")(3) != b("id")(3), "sum_check catches it")
  }

  test("null accounting: nulls counted, skipped by checksums; all-null column is null") {
    val a = fp(base)
    assert(a("score")(1) == 1L, "one null score")
    val allNull = base.withColumn("score", lit(null).cast("long"))
    val n = fp(allNull)("score")
    assert(n(1) == 5L && n(2) == null && n(3) == null)
  }

  test("fingerprintsMatch is the migration predicate") {
    assert(Audit.fingerprintsMatch(base, base.repartition(3), cols))
    assert(!Audit.fingerprintsMatch(base, base.filter($"id" =!= 5), cols))
    intercept[IllegalArgumentException] { Audit.columnFingerprints(base, Nil) }
  }

  test("single-scan plan: one aggregate, no join, no window") {
    val plan = Audit.columnFingerprints(base, cols).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"no join expected:\n$plan")
    // generate/explode over the 1-row agg result is fine; a second
    // Aggregate would mean one pass per column.
    assert("(?i)aggregate".r.findAllIn(plan).size <= 2,
      s"one aggregation pass expected:\n$plan")
  }
}
