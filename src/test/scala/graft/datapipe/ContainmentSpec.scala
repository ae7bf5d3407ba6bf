package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Asymmetric containment dedup semantics. */
class ContainmentSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], num: Long = 4, den: Long = 5) =
    Dedup.containmentPairs(docs.toDF("id", "text"), "id", "text", num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getBoolean(5), r.getBoolean(6))).toSeq

  test("short doc inside long doc: containment fires one direction only") {
    // doc 2's word set is a strict subset of doc 1's larger set.
    val p = pairs(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon")))
    p shouldBe Seq((1L, 2L, false, true)) // b_in_a, NOT a_in_b
  }

  test("identical word sets: both directions") {
    val p = pairs(Seq((1L, "x y z"), (2L, "z y x x")))
    p shouldBe Seq((1L, 2L, true, true))
  }

  test("low overlap yields no pair") {
    pairs(Seq((1L, "a b c d e"), (2L, "a q r s t"))) shouldBe empty
  }

  test("integer threshold is exact at the boundary") {
    // |A∩B| = 4 of |A| = 5: 4*5 >= 4*5 passes at 4/5 exactly.
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d zz"))
    pairs(docs, 4, 5).head._4 shouldBe true  // b_in_a: 4 of 5
    pairs(docs, 9, 10) shouldBe empty        // 4*10 < 9*5
  }

  test("df cap prunes candidate generation, never the verified counts") {
    // 'common' appears in every doc -> pruned at maxDf 2: docs sharing
    // ONLY 'common' never meet as candidates, so no pair is emitted.
    val docs = Seq((1L, "common u1 u2 u3 u4"), (2L, "common v1 v2 v3 v4"),
      (3L, "common w1 w2 w3 w4")).toDF("id", "text")
    val p = Dedup.containmentPairs(docs, "id", "text", 1, 10, maxDf = 2)
    p.collect() shouldBe empty
    // A pair that meets through an UNPRUNED token is verified on the
    // true intersection, which still counts the pruned token — pruning
    // narrows which pairs are examined, never what c they're assigned.
    val docs2 = Seq((1L, "common u1 x y z"), (2L, "common u1 p q r"),
      (3L, "common m1 m2 m3 m4")).toDF("id", "text")
    val q = Dedup.containmentPairs(docs2, "id", "text", 1, 10, maxDf = 2)
    q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, 2L, 2L)) // c = |{common, u1}| — the pruned token counted
  }
}
