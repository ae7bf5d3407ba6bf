package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ShortestPathsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("hand graph: weighted detour beats the direct edge") {
    // 0 -> 1 (w 10), 0 -> 2 (w 1), 2 -> 1 (w 2): dist(1) = 3 via 2.
    val edges = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 2L)).toDF("s", "d", "w")
    val sources = Seq(Tuple1(0L)).toDF("n")
    val got = ShortestPaths.distances(sources, "n", edges, "s", "d", "w", iters = 3)
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(0L -> 0L, 1L -> 3L, 2L -> 1L)
  }

  test("round k finalizes exactly the <=k-edge paths") {
    // chain 0 -> 1 -> 2 -> 3, unit weights.
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L)).toDF("s", "d", "w")
    val sources = Seq(Tuple1(0L)).toDF("n")
    val after2 = ShortestPaths.distances(sources, "n", edges, "s", "d", "w", iters = 2)
      .as[(Long, Long)].collect().toMap
    after2 shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 2L) // 3 not yet reached
    val after3 = ShortestPaths.distances(sources, "n", edges, "s", "d", "w", iters = 3)
      .as[(Long, Long)].collect().toMap
    after3(3L) shouldBe 3L
  }

  test("multi-source takes the min over seeds; duplicate seed rows collapse") {
    val edges = Seq((0L, 5L, 4L), (9L, 5L, 1L)).toDF("s", "d", "w")
    val sources = Seq(0L, 9L, 9L).toDF("n")
    val got = ShortestPaths.distances(sources, "n", edges, "s", "d", "w", iters = 2)
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(0L -> 0L, 9L -> 0L, 5L -> 1L)
  }

  test("matches Floyd–Warshall brute force at full convergence on an irregular graph") {
    val n = 40
    val edgeSeq = (0 until n).flatMap { s =>
      (1 to (1 + s % 3)).map { k =>
        val d = (s * 31 + k * 97) % n
        (s.toLong, d.toLong, (1L + (s + d) % 7))
      }
    }
    val inf = Long.MaxValue / 4
    val dm = Array.fill(n, n)(inf)
    (0 until n).foreach(i => dm(i)(i) = 0L)
    edgeSeq.foreach { case (s, d, w) =>
      if (w < dm(s.toInt)(d.toInt)) dm(s.toInt)(d.toInt) = w
    }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (dm(i)(k) + dm(k)(j) < dm(i)(j)) dm(i)(j) = dm(i)(k) + dm(k)(j)
    val seeds = Seq(0L, 7L)
    val expect = (0 until n).flatMap { v =>
      val best = seeds.map(s => dm(s.toInt)(v)).min
      if (best < inf) Some(v.toLong -> best) else None
    }.toMap
    val got = ShortestPaths.distances(
        seeds.toDF("n"), "n",
        edgeSeq.toDF("s", "d", "w").repartition(5), "s", "d", "w",
        iters = n, checkpointEvery = 8)
      .as[(Long, Long)].collect().toMap
    got shouldBe expect
  }

  test("NULL edge endpoints fail loud instead of dropping edges or minting NULL nodes") {
    val sources = Seq(Tuple1(0L)).toDF("n")
    val nullDst = spark.sql("SELECT 0L AS s, CAST(NULL AS BIGINT) AS d, 1L AS w")
    val e = intercept[Exception] {
      ShortestPaths.distances(sources, "n", nullDst, "s", "d", "w", iters = 1).collect()
    }
    e.getMessage should include("NULL d")
    val nullSrc = spark.sql("SELECT CAST(NULL AS BIGINT) AS s, 1L AS d, 1L AS w")
    val e2 = intercept[Exception] {
      ShortestPaths.distances(sources, "n", nullSrc, "s", "d", "w", iters = 1).collect()
    }
    e2.getMessage should include("NULL s")
  }

  test("negative or NULL weights fail loud") {
    val sources = Seq(Tuple1(0L)).toDF("n")
    val neg = Seq((0L, 1L, -1L)).toDF("s", "d", "w")
    val e = intercept[Exception] {
      ShortestPaths.distances(sources, "n", neg, "s", "d", "w", iters = 1).collect()
    }
    e.getMessage should include("non-negative")
    val nul = spark.sql("SELECT 0L AS s, 1L AS d, CAST(NULL AS BIGINT) AS w")
    val e2 = intercept[Exception] {
      ShortestPaths.distances(sources, "n", nul, "s", "d", "w", iters = 1).collect()
    }
    e2.getMessage should include("non-negative")
  }
}
