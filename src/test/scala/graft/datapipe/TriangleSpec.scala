package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TriangleSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphRank.triangleCounts(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap

  test("hand graph: K4 has four triangles, three per corner") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(counts(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("a path has no triangles; one chord closes exactly one") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(counts(path).isEmpty)
    assert(counts(path :+ (0L, 2L)) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("direction, duplicates, and self-loops don't change the undirected count") {
    val messy = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (0L, 0L), (2L, 1L))
    assert(counts(messy) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("matches brute-force enumeration on an irregular random-ish graph") {
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 60), (i, (i + 1) % 60), (i, (i * 13 + 5) % 60)))
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val brute = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    for {
      a <- nodes; b <- nodes if a < b && canon(( a, b))
      c <- nodes if b < c && canon((b, c)) && canon((a, c))
    } { brute(a) += 1; brute(b) += 1; brute(c) += 1 }
    assert(counts(edges) == brute.toMap)
  }

  test("the hot node's wedge fan-out follows its ORIENTED degree, not its raw degree") {
    // Star: hub 0 connected to 1..40 (plus one closing edge). The
    // hub's raw degree is 40, but every star edge orients INTO the
    // hub (leaves have degree 1 ≺ 40), so the hub centers no wedges —
    // the explosion a raw self-join would produce.
    val star = (1L to 40L).map(i => (0L, i)) :+ (1L, 2L)
    assert(counts(star) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }
}
