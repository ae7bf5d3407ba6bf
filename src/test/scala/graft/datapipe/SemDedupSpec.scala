package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // 24 docs over 4 orthogonal one-hot directions (id % 4), scaled by
  // id+1: cosine is exactly 1.0 within a direction class, 0.0 across.
  private def oneHot(n: Int, dims: Int, classes: Int) =
    spark.range(n).toDF("id")
      .withColumn("vec", transform(sequence(lit(0), lit(dims - 1)),
        d => when(d === col("id") % classes, (col("id") + 1).cast("double"))
          .otherwise(lit(0.0))))

  test("survivors are the class minima; drops attributed to them") {
    val out = SemDedup.dedupReport(oneHot(24, 8, 4), "id", "vec",
        k = 4, iters = 1, minCosine = 0.9)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    // Class minima 0,1,2,3 survive; each class has 6 members → 5 drops.
    assert(out == Seq((0L, 5L), (1L, 5L), (2L, 5L), (3L, 5L)))
  }

  test("non-transitive chain: every drop is attributed to the surviving root") {
    // 2-D unit vectors at 0°, 25°, 50°: cos(25°) ≈ 0.906 pairs both
    // neighbors, cos(50°) ≈ 0.64 does NOT pair the ends — doc 2's
    // minimum partner (doc 1) is itself dropped by doc 0. Attribution
    // must follow the chain 2 → 1 → 0 so the survivor reports BOTH
    // drops; the naive min-partner rule loses doc 2's drop entirely.
    val rad = math.Pi / 180.0
    val docs = Seq(
      (0L, Seq(math.cos(0.0), math.sin(0.0))),
      (1L, Seq(math.cos(25 * rad), math.sin(25 * rad))),
      (2L, Seq(math.cos(50 * rad), math.sin(50 * rad))))
      .toDF("id", "vec")
    val out = SemDedup.dedupReport(docs, "id", "vec",
        k = 1, iters = 1, minCosine = 0.9)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L)), s"chain must resolve to the root: $out")
  }

  test("capped hot cell falls back to the star and still merges the class") {
    // One class of 20 identical-direction docs; cap 5 forces the star.
    val out = SemDedup.dedupReport(oneHot(20, 8, 1), "id", "vec",
        k = 1, iters = 1, minCosine = 0.9, maxCell = 5)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 19L)))
  }

  test("cap bounds candidate pairs: star emits |cell|-1, not quadratic") {
    val corpus = oneHot(40, 8, 1)
    val centroids = Ivf.train(corpus, "id", "vec", k = 1, iters = 1)
    val capped = SemDedup.pairs(corpus, "id", "vec", centroids,
      minCosine = 0.9, maxCell = 10)
    assert(capped.count() == 39L)
    assert(capped.filter($"doc_a" =!= 0L).count() == 0L)
  }

  test("DEFAULT call is star-capped: a hot cell beyond 256 emits linear pairs") {
    // One 300-doc identical-direction cell with NO explicit maxCell:
    // the default must ride the star (299 pairs), never the 300·299/2
    // quadratic enumeration.
    val corpus = oneHot(300, 8, 1)
    val centroids = Ivf.train(corpus, "id", "vec", k = 1, iters = 1)
    val p = SemDedup.pairs(corpus, "id", "vec", centroids, minCosine = 0.9)
    assert(p.count() == 299L, "default maxCell must be finite (star-capped)")
    assert(p.filter($"doc_a" =!= 0L).count() == 0L, "star pairs anchor at the cell minimum")
    val rep = SemDedup.dedupReport(corpus, "id", "vec", k = 1, iters = 1)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(rep == Seq((0L, 299L)), "star still merges the whole class")
  }

  test("orthogonal classes never pair; unique docs survive with 0 drops") {
    val out = SemDedup.dedupReport(oneHot(4, 8, 4), "id", "vec",
        k = 2, iters = 1, minCosine = 0.9)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L)))
  }
}
