package graft.functions

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BitmapDistinctSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val M = 4096

  test("bitmap cardinality equals exact count-distinct of buckets across many partitions") {
    val df = spark.range(0, 5000).repartition(17)
      .select((col("id") % 5).cast("string").as("g"), (col("id") % 700).as("v"))
    val withBkt = df.select(col("g"), BitmapDistinct.bucketOf(col("v"), M).as("bkt"))
    val sketch = withBkt.groupBy($"g")
      .agg(BitmapDistinct.cardinality(BitmapDistinct.agg($"bkt", M)).as("k"))
      .as[(String, Long)].collect().toMap
    val exact = withBkt.groupBy($"g").agg(countDistinct($"bkt").as("k"))
      .as[(String, Long)].collect().toMap
    assert(sketch == exact, s"sketch $sketch vs exact $exact")
  }

  test("and/or cardinalities are exact set algebra over the bucket sets") {
    val a = spark.range(0, 400).select(lit("a").as("g"), col("id").as("v"))
    val b = spark.range(200, 600).select(lit("b").as("g"), col("id").as("v"))
    val bm = a.union(b)
      .select(col("g"), BitmapDistinct.bucketOf(col("v"), M).as("bkt"))
      .groupBy($"g").agg(BitmapDistinct.agg($"bkt", M).as("bm"))
    val row = bm.filter($"g" === "a").crossJoin(
        bm.filter($"g" === "b").select($"bm".as("bm_b")))
      .select(
        BitmapDistinct.andCardinality($"bm", $"bm_b").as("and_k"),
        BitmapDistinct.orCardinality($"bm", $"bm_b").as("or_k"),
        BitmapDistinct.cardinality($"bm").as("ka"),
        BitmapDistinct.cardinality($"bm_b").as("kb"))
      .as[(Long, Long, Long, Long)].head()
    val bktOf = (v: Long) => {
      // Replay the portable bucket on the driver for ground truth.
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"bm|$v".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % M
    }
    val sa = (0L until 400L).map(bktOf).toSet
    val sb = (200L until 600L).map(bktOf).toSet
    assert(row == ((sa.intersect(sb).size.toLong, sa.union(sb).size.toLong,
      sa.size.toLong, sb.size.toLong)))
  }

  test("null buckets are skipped; empty group yields zero") {
    val df = Seq((1L, Some(3L)), (1L, None), (2L, None)).toDF("g", "bkt")
    val out = df.groupBy($"g")
      .agg(BitmapDistinct.cardinality(BitmapDistinct.agg($"bkt", 64)).as("k"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 0L))
  }

  test("misconfiguration fails analysis readably") {
    val df = Seq(1L).toDF("bkt")
    intercept[Exception] {
      df.agg(BitmapDistinct.agg($"bkt", 100)).collect() // not a multiple of 64
    }
    intercept[Exception] { // out-of-range bucket at runtime
      Seq(-1L).toDF("bkt").agg(BitmapDistinct.agg($"bkt", 64)).collect()
    }
    intercept[Exception] { // disagreeing m between sketches
      val x = Seq(1L).toDF("bkt").agg(BitmapDistinct.agg($"bkt", 64).as("a"))
      val y = Seq(1L).toDF("bkt").agg(BitmapDistinct.agg($"bkt", 128).as("b"))
      x.crossJoin(y).select(BitmapDistinct.andCardinality($"a", $"b")).collect()
    }
  }

  test("plan shape: partial sketches merge through one exchange (raw buckets never shuffle)") {
    val df = spark.range(0, 2000).repartition(8)
      .select((col("id") % 3).as("g"), BitmapDistinct.bucketOf(col("id"), M).as("bkt"))
    val plan = df.groupBy($"g").agg(BitmapDistinct.agg($"bkt", M).as("bm"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      s"partial + final sketch stages expected:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"only merged sketches shuffle:\n$plan")
  }

  test("bitmap_or_agg rollup of daily sketches equals the flat single-level sketch") {
    val df = spark.range(0, 3000).repartition(11)
      .select((col("id") % 4).as("g"), (col("id") % 30).as("day"), (col("id") % 450).as("v"))
      .select($"g", $"day", BitmapDistinct.bucketOf($"v", M).as("bkt"))
    val flat = df.groupBy($"g")
      .agg(BitmapDistinct.cardinality(BitmapDistinct.agg($"bkt", M)).as("k"))
      .as[(Long, Long)].collect().toMap
    val rolled = df.groupBy($"g", $"day")
      .agg(BitmapDistinct.agg($"bkt", M).as("bm"))
      .groupBy($"g")
      .agg(BitmapDistinct.cardinality(BitmapDistinct.orAgg($"bm")).as("k"))
      .as[(Long, Long)].collect().toMap
    assert(flat == rolled, s"two-level merge must be lossless: $flat vs $rolled")
  }

  test("bitmap_or_agg rejects mixed-width sketches and ignores empty input") {
    val a = Seq(1L).toDF("bkt").agg(BitmapDistinct.agg($"bkt", 64).as("bm"))
    val b = Seq(1L).toDF("bkt").agg(BitmapDistinct.agg($"bkt", 128).as("bm"))
    intercept[Exception] {
      a.union(b).agg(BitmapDistinct.orAgg($"bm")).collect()
    }
    val empty = spark.emptyDataset[Array[Byte]].toDF("bm")
    val out = empty.agg(BitmapDistinct.cardinality(BitmapDistinct.orAgg($"bm")))
      .as[Long].head()
    assert(out == 0L, "empty rollup is the empty bitmap")
  }

  test("bucketOf is null-preserving: a NULL value gets a NULL bucket, not the salt's") {
    val df = Seq(Some("a"), None).toDF("v")
    val out = df.select(BitmapDistinct.bucketOf($"v", M).as("bkt"))
      .as[Option[Long]].collect().toSet
    assert(out.exists(_.isDefined) && out.contains(None),
      s"NULL must not hash to the bare-salt bucket: $out")
    // And the aggregate path skips it: cardinality counts only "a".
    val k = df.select(BitmapDistinct.bucketOf($"v", M).as("bkt"))
      .agg(BitmapDistinct.cardinality(BitmapDistinct.agg($"bkt", M)))
      .as[Long].head()
    assert(k == 1L, "a forgotten IS NOT NULL filter must not inflate the count")
  }

  test("linear-count estimate is monotone and sane on a half-full sketch") {
    val k = Seq(32L).toDF("k")
    val est = k.select(BitmapDistinct.linearCountEstimate($"k", 64).as("e"))
      .as[Double].head()
    // -64 ln(1 - 0.5) = 44.36...: above the raw bucket count, below m.
    assert(est > 32.0 && est < 64.0)
  }

  test("a throwing or NULL m literal fails ANALYSIS with a named error (DictMatch contract)") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // ANSI overflow inside the foldable literal: must surface as a named
    // TypeCheckFailure, not escape the analyzer as a raw ArithmeticException.
    val e1 = intercept[Exception] { spark.sql("SELECT bitmap_agg(b, 2147483647 + 1) FROM VALUES (CAST(1 AS BIGINT)) t(b)").collect() }
    assert(msgs(e1).exists(_.contains("failed to evaluate")), msgs(e1).mkString(" | "))
    // A NULL literal silently unboxes to 0 without the check.
    val e2 = intercept[Exception] { spark.sql("SELECT bitmap_agg(b, CAST(NULL AS INT)) FROM VALUES (CAST(1 AS BIGINT)) t(b)").collect() }
    assert(msgs(e2).exists(_.contains("NULL literal")), msgs(e2).mkString(" | "))
  }
}
