package graft.scale

import graft.SharedSpark
import graft.ops.Skew
import graft.sink.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100-TB levers, verified: salting preserves aggregate/join
  * results, bucketed joins plan without a shuffle, IVF finds real
  * neighbors.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val li = graft.tables.TestTables.lineitem(spark, "/root/testdata/sf0.001")

  test("salted two-phase aggregation equals the direct groupBy") {
    val direct = li.groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_rows"), sum($"l_quantity").as("sum_l_quantity"))
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    val salted = Skew.saltedCountSum(li, Seq("l_orderkey"), "l_quantity", $"l_linenumber", buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    assert(salted == direct)
  }

  test("salted join equals the plain join") {
    val dim = li.select($"l_partkey").distinct().withColumn("dim_tag", $"l_partkey" % 7)
    val plain = li.join(dim, Seq("l_partkey")).select($"l_orderkey", $"l_linenumber", $"dim_tag")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(li, dim, "l_partkey", $"l_linenumber", buckets = 4)
      .select($"l_orderkey", $"l_linenumber", $"dim_tag")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("bucketed-by-key join plans with zero shuffle exchanges") {
    val orders = graft.tables.TestTables.orders(spark, "/root/testdata/sf0.001")
    val bdir = java.nio.file.Files.createTempDirectory("bucketed").toString
    Bucketing.writeBucketed(li.select($"l_orderkey", $"l_quantity"),
      "b_items", s"$bdir/b_items", Seq("l_orderkey"), 4, Seq("l_orderkey"))
    Bucketing.writeBucketed(orders.select($"o_orderkey".as("l_orderkey"), $"o_totalprice"),
      "b_orders", s"$bdir/b_orders", Seq("l_orderkey"), 4, Seq("l_orderkey"))
    // Force the sort-merge path (at real scale neither side broadcasts —
    // that is exactly when bucketing pays).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.table(spark, "b_items")
        .join(Bucketing.table(spark, "b_orders"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must use the bucket layout:\n$plan")
      assert(joined.count() == li.count(), "inner join on complete key set keeps all items")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF ANN finds the planted near-duplicate and real neighbors") {
    val emb = graft.tables.TestTables.embeddings(spark, "/root/testdata/sf0.001")
    val plant = emb.filter($"vec_id" === 0)
      .select(lit(9000L).as("vec_id"), transform($"embedding", x => x + lit(0.001f)).as("embedding"), $"label")
    val corpus = emb.unionByName(plant)
    val centroids = graft.datapipe.Ivf.train(corpus, "vec_id", "embedding", k = 8, iters = 2)
    assert(centroids.count() == 8)
    val res = graft.datapipe.Ivf.topK(corpus.filter($"vec_id" === 9000L), corpus, centroids,
      "vec_id", "embedding", k = 3, nprobe = 2)
    val top = res.orderBy($"rank").select($"n_id").as[Long].collect()
    assert(top.headOption.contains(0L), s"nearest neighbor of the planted copy must be vec 0, got ${top.toSeq}")
  }

  test("cell-partitioned IVF: pruned probe equals the in-memory path and prunes the scan") {
    val emb = graft.tables.TestTables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" % 200 === 0)
    val centroids = graft.datapipe.Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivf_cells").toString + "/corpus"
    graft.datapipe.Ivf.writeCellPartitioned(emb, centroids, "vec_id", "embedding", path)

    val pruned = graft.datapipe.Ivf.topKPruned(spark, queries, path, centroids,
      "vec_id", "embedding", k = 5, nprobe = 2)
    val mem = graft.datapipe.Ivf.topK(queries, emb, centroids,
      "vec_id", "embedding", k = 5, nprobe = 2)
    val a = pruned.select($"q_id", $"n_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val b = mem.select($"q_id", $"n_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(a == b, "partition-pruned probe must return exactly the in-memory results")

    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"the probe's cell set must prune at the partition level:\n$plan")
  }

  test("incremental IVF ingest converges to the full rebuild; probes see additions immediately") {
    val emb = graft.tables.TestTables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = graft.datapipe.Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val full = java.nio.file.Files.createTempDirectory("ivf_full").toString + "/corpus"
    val inc = java.nio.file.Files.createTempDirectory("ivf_inc").toString + "/corpus"
    graft.datapipe.Ivf.writeCellPartitioned(emb, centroids, "vec_id", "embedding", full)
    // Same corpus arriving as three uneven batches against fixed centroids.
    graft.datapipe.Ivf.ingestBatch(emb.filter($"vec_id" % 3 === 0), centroids, "vec_id", "embedding", inc)
    graft.datapipe.Ivf.ingestBatch(emb.filter($"vec_id" % 3 === 1), centroids, "vec_id", "embedding", inc)
    graft.datapipe.Ivf.ingestBatch(emb.filter($"vec_id" % 3 === 2), centroids, "vec_id", "embedding", inc)
    val layout = (p: String) => spark.read.parquet(p).select($"id", $"cell")
      .as[(Long, Int)].collect().toSet
    assert(layout(inc) == layout(full), "ingest sequence must equal the rebuild layout")
    val queries = emb.filter($"vec_id" % 200 === 0)
    val a = graft.datapipe.Ivf.topKPruned(spark, queries, inc, centroids,
      "vec_id", "embedding", k = 5, nprobe = 2)
      .select($"q_id", $"n_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val b = graft.datapipe.Ivf.topKPruned(spark, queries, full, centroids,
      "vec_id", "embedding", k = 5, nprobe = 2)
      .select($"q_id", $"n_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(a == b, "probe results must be identical on both layouts")
  }

  test("IVF recall vs brute force is reasonable on random embeddings") {
    val emb = graft.tables.TestTables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" % 100 === 0)
    val centroids = graft.datapipe.Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val bf = graft.datapipe.Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ivf = graft.datapipe.Ivf.topK(queries, emb, centroids, "vec_id", "embedding", k = 5, nprobe = 4)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = (bf & ivf).size.toDouble / bf.size.toDouble
    assert(recall >= 0.3, s"nprobe=4 of k=8 cells should catch a fair share of true top-5: $recall")
  }
}
