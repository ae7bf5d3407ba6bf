package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TableDiffSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("labels added, removed, and changed; unchanged rows never surface") {
    val before = Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "s", "v")
    val after = Seq(
      (1L, "a", 10L),            // unchanged
      (2L, "B", 20L),            // changed
      (4L, "d", 40L), (5L, "e", 50L)) // 3 removed, 5 added
      .toDF("k", "s", "v")
    val got = TableDiff.diff(before, after, Seq("k"), Seq("s", "v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    got shouldBe Map(2L -> "changed", 3L -> "removed", 5L -> "added")
  }

  test("NULL-vs-value and NULL-vs-empty-string differences are seen (prefix-free encoding)") {
    val before = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("k", "s")
    val after = Seq((1L, Option.empty[String]), (2L, Option(""))).toDF("k", "s")
    val got = TableDiff.diff(before, after, Seq("k"), Seq("s"))
      .select("k", "status").as[(Long, String)].collect().toMap
    got shouldBe Map(1L -> "changed", 2L -> "changed")
  }

  test("concatenation cannot alias across column boundaries") {
    // ("ab", "c") vs ("a", "bc") — a naive concat hash would collide.
    val before = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val after = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val got = TableDiff.diff(before, after, Seq("k"), Seq("x", "y"))
      .select("status").as[String].collect()
    got.toSeq shouldBe Seq("changed")
  }

  test("duplicate keys fail loud on either side") {
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "s")
    val ok = Seq((1L, "a")).toDF("k", "s")
    val e = intercept[Exception] {
      TableDiff.diff(dup, ok, Seq("k"), Seq("s")).collect()
    }
    e.getMessage should include("duplicate key")
    val e2 = intercept[Exception] {
      TableDiff.diff(ok, dup, Seq("k"), Seq("s")).collect()
    }
    e2.getMessage should include("duplicate key")
  }

  test("NULL keys fail loud instead of double-counting as added+removed") {
    val withNullKey = spark.sql("SELECT CAST(NULL AS BIGINT) AS k, 'a' AS s")
    val ok = Seq((1L, "a")).toDF("k", "s")
    val e = intercept[Exception] {
      TableDiff.diff(withNullKey, ok, Seq("k"), Seq("s")).collect()
    }
    e.getMessage should include("NULL key")
  }

  test("composite keys diff correctly") {
    val before = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k1", "k2", "s")
    val after = Seq((1L, 1L, "x"), (1L, 2L, "Z")).toDF("k1", "k2", "s")
    val got = TableDiff.diff(before, after, Seq("k1", "k2"), Seq("s"))
      .select("k1", "k2", "status").as[(Long, Long, String)].collect()
    got.toSeq shouldBe Seq((1L, 2L, "changed"))
  }

  test("pruned diff equals plain diff on messy data; the dirty set is exactly the touched partitions") {
    val before = (0 until 500).map { i =>
      (i.toLong % 10, i.toLong, s"v${i % 13}")
    }.toDF("part", "k", "s")
    // touch partitions 2 (change), 5 (remove), 8 (add); 7 stay clean
    val after = before
      .filter(!(col("part") === 5 && col("k") % 3 === 0))
      .withColumn("s", when(col("part") === 2 && col("k") % 4 === 0, lit("CHANGED"))
        .otherwise(col("s")))
      .unionByName(before.filter(col("part") === 8 && col("k") % 7 === 0)
        .withColumn("k", col("k") + 10000L))
    val plain = TableDiff.diff(before, after, Seq("k"), Seq("s"))
      .select("k", "status").as[(Long, String)].collect().toSet
    val pruned = TableDiff.prunedDiff(before, after, "part", Seq("k"), Seq("s"))
      .select("k", "status").as[(Long, String)].collect().toSet
    pruned shouldBe plain
    assert(plain.nonEmpty)
    // dirty set: fingerprints must disagree exactly on {2, 5, 8}
    val fb = TableDiff.partitionFingerprints(before, "part", Seq("k"), Seq("s"))
    val fa = TableDiff.partitionFingerprints(after, "part", Seq("k"), Seq("s"))
    val dirty = fb.as("a").join(fa.as("b"), col("a.part") === col("b.part"), "full_outer")
      .filter(!(col("a.n_rows") <=> col("b.n_rows")) ||
        !(col("a.xor_check") <=> col("b.xor_check")) ||
        !(col("a.sum_check") <=> col("b.sum_check")))
      .select(coalesce(col("a.part"), col("b.part"))).as[Long].collect().toSet
    dirty shouldBe Set(2L, 5L, 8L)
  }

  test("pruned diff: a partition present on only one side is dirty, not skipped") {
    val before = Seq((1L, 1L, "a"), (2L, 2L, "b")).toDF("part", "k", "s")
    val after = Seq((1L, 1L, "a")).toDF("part", "k", "s") // partition 2 vanished
    val got = TableDiff.prunedDiff(before, after, "part", Seq("k"), Seq("s"))
      .select("k", "status").as[(Long, String)].collect().toMap
    got shouldBe Map(2L -> "removed")
  }

  test("pruned diff: a NULL partition fails loud instead of vanishing from the drill-down") {
    val before = spark.sql("SELECT CAST(NULL AS BIGINT) AS part, 1L AS k, 'a' AS s")
    val after = Seq((1L, 1L, "b")).toDF("part", "k", "s")
    val e = intercept[Exception] {
      TableDiff.prunedDiff(before, after, "part", Seq("k"), Seq("s")).collect()
    }
    e.getMessage should include("NULL part")
  }

  test("pruned diff: a key that MOVES partitions dirties both and surfaces like plain diff") {
    val before = Seq((1L, 7L, "x"), (2L, 8L, "y")).toDF("part", "k", "s")
    val after = Seq((2L, 7L, "x"), (2L, 8L, "y")).toDF("part", "k", "s") // key 7 moved 1 -> 2
    val plain = TableDiff.diff(before, after, Seq("k"), Seq("s"))
      .select("k", "status").as[(Long, String)].collect().toSet
    val pruned = TableDiff.prunedDiff(before, after, "part", Seq("k"), Seq("s"))
      .select("k", "status").as[(Long, String)].collect().toSet
    pruned shouldBe plain
    // moving between partitions changes neither key set nor row content
    // at key granularity: the diff is rightly EMPTY — the point is the
    // pruned form must not invent added+removed rows either.
    pruned shouldBe Set.empty[(Long, String)]
  }

  test("pruned diff on DISK-partitioned tables plans dynamic partition pruning on the drill scans") {
    val dir = java.nio.file.Files.createTempDirectory("tablediff_dpp").toString
    spark.range(0, 2000).select((col("id") % 10).as("part"), col("id").as("k"),
        (col("id") % 7).cast("string").as("s"))
      .write.partitionBy("part").mode("overwrite").parquet(s"$dir/before")
    spark.range(0, 2000).select((col("id") % 10).as("part"), col("id").as("k"),
        when(col("id") % 10 === 3, lit("X")).otherwise((col("id") % 7).cast("string")).as("s"))
      .write.partitionBy("part").mode("overwrite").parquet(s"$dir/after")
    val d = TableDiff.prunedDiff(
      spark.read.parquet(s"$dir/before"), spark.read.parquet(s"$dir/after"),
      "part", Seq("k"), Seq("s"))
    // only partition 3 changed: 200 changed rows
    d.count() shouldBe 200L
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"drill scans must plan dynamic partition pruning on the dirty set:\n$plan")
  }

  test("plan: one exchange per side, the full outer join reuses both — never a third") {
    // Parquet-backed inputs so the optimizer cannot constant-fold the
    // fixture into a LocalRelation (vacuous-plan trap).
    val dir = java.nio.file.Files.createTempDirectory("tablediff_plan").toString
    spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).cast("string").as("s"))
      .write.mode("overwrite").parquet(s"$dir/before")
    spark.range(500, 1500).select(col("id").as("k"), (col("id") % 5).cast("string").as("s"))
      .write.mode("overwrite").parquet(s"$dir/after")
    val diff = TableDiff.diff(
      spark.read.parquet(s"$dir/before"), spark.read.parquet(s"$dir/after"),
      Seq("k"), Seq("s"))
    val plan = diff.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2,
      s"one per-side groupBy exchange each; the join must reuse them, found $exchanges:\n$plan")
    assert(diff.count() > 0)
  }
}
