package graft.datapipe

import graft.SharedSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Randomized equivalence: fixed-round relaxation at full convergence
  * (iters = |V|) must agree with Floyd–Warshall on arbitrary small
  * weighted digraphs — parallel edges, self-loops, unreachable
  * components, zero weights, multi-source seed sets.
  */
object ShortestPathsProps extends Properties("ShortestPaths") {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private val n = 10
  private val edgeGen = Gen.zip(Gen.chooseNum(0L, (n - 1).toLong),
    Gen.chooseNum(0L, (n - 1).toLong), Gen.chooseNum(0L, 6L))
  private val graphGen = Gen.listOf(edgeGen).map(_.take(30))
  private val seedsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, (n - 1).toLong)).map(_.take(3))

  property("full-convergence distances == Floyd-Warshall") =
    Prop.forAll(graphGen, seedsGen) { (edges, seeds) =>
      val inf = Long.MaxValue / 4
      val dm = Array.fill(n, n)(inf)
      (0 until n).foreach(i => dm(i)(i) = 0L)
      edges.foreach { case (s, d, w) =>
        if (w < dm(s.toInt)(d.toInt)) dm(s.toInt)(d.toInt) = w
      }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        if (dm(i)(k) + dm(k)(j) < dm(i)(j)) dm(i)(j) = dm(i)(k) + dm(k)(j)
      val expect = (0 until n).flatMap { v =>
        val best = seeds.map(s => dm(s.toInt)(v)).min
        if (best < inf) Some(v.toLong -> best) else None
      }.toMap
      val got =
        if (edges.isEmpty) // distances() still works; only seeds survive
          ShortestPaths.distances(seeds.toDF("node"), "node",
              spark.emptyDataset[(Long, Long, Long)].toDF("s", "d", "w"),
              "s", "d", "w", iters = n)
            .as[(Long, Long)].collect().toMap
        else
          ShortestPaths.distances(seeds.toDF("node"), "node",
              edges.toDF("s", "d", "w").repartition(3), "s", "d", "w",
              iters = n, checkpointEvery = 4)
            .as[(Long, Long)].collect().toMap
      Prop(got == expect) :| s"got=$got expect=$expect seeds=$seeds edges=$edges"
    }
}
