package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val B = 16

  // Target corpus speaks vocabulary A; the raw corpus is half A-like,
  // half B-like (disjoint vocabulary) — DSIR must rank the A-like half
  // above the B-like half.
  private def target = Seq.tabulate(20)(i => s"alpha beta gamma delta word$i alpha beta")
    .toDF("text")
  private def raw = (Seq.tabulate(10)(i => (i.toLong, s"alpha beta gamma delta extra$i")) ++
    Seq.tabulate(10)(i => (100L + i, s"zulu yankee xray whiskey other$i")))
    .toDF("doc_id", "text")

  test("bigrams: strict sliding pairs, no whole-doc collapse") {
    val out = Seq("a b c", "solo", "", "x y").toDF("t")
      .select(Dsir.bigrams(TextAnalysis.words(col("t"))).as("bg"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b", "b c"))
    assert(out(1) == Seq.empty, "a 1-word doc has no bigram (must not echo the unigram)")
    assert(out(2) == Seq.empty)
    assert(out(3) == Seq("x y"))
  }

  test("featureBuckets: exactly words + bigrams features, all inside [0, B)") {
    val out = Seq("one two three four").toDF("t")
      .select(Dsir.featureBuckets(col("t"), B).as("fb"))
      .as[Seq[Long]].collect().head
    assert(out.size == 4 + 3)
    assert(out.forall(b => b >= 0 && b < B))
  }

  test("bucketScores reproduces the exact quantized ratio formula") {
    val scores = Dsir.bucketScores(target, "text", raw, "text", B)
      .orderBy("bucket").collect()
    assert(scores.length == B, "spine must emit every bucket, seen or not")
    val tTot = scores.map(_.getLong(1)).sum
    val rTot = scores.map(_.getLong(2)).sum
    scores.foreach { r =>
      val (tc, rc, s) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val expected = (BigInt(1000000) * BigInt(tc + 1) * BigInt(rTot + B) /
        (BigInt(rc + 1) * BigInt(tTot + B))).toLong
      assert(s == expected, s"bucket ${r.getLong(0)}: got $s want $expected")
    }
    // Unseen-in-both buckets score the smoothing default, not zero.
    val default = (BigInt(1000000) * BigInt(rTot + B) / BigInt(tTot + B)).toLong
    scores.filter(r => r.getLong(1) == 0 && r.getLong(2) == 0)
      .foreach(r => assert(r.getLong(3) == default))
  }

  test("scoreDocs: n_feat is the exact feature count; target-like docs outscore off-target docs") {
    val scores = Dsir.bucketScores(target, "text", raw, "text", B)
    val scored = Dsir.scoreDocs(raw, "doc_id", "text", scores, B).collect()
    assert(scored.length == 20)
    // Every raw doc has 5 words + 4 bigrams = 9 features.
    assert(scored.forall(_.getAs[Long]("n_feat") == 9L))
    val aMin = scored.filter(_.getLong(0) < 100).map(_.getAs[Double]("dsir_mean")).min
    val bMax = scored.filter(_.getLong(0) >= 100).map(_.getAs[Double]("dsir_mean")).max
    assert(aMin > bMax,
      s"every target-vocabulary doc ($aMin) must outscore every off-target doc ($bMax)")
  }

  test("resampleTopK keeps exactly the k most target-like docs") {
    val scores = Dsir.bucketScores(target, "text", raw, "text", B)
    val scored = Dsir.scoreDocs(raw, "doc_id", "text", scores, B)
    val top = Dsir.resampleTopK(scored, "doc_id", 10).collect()
    assert(top.length == 10)
    assert(top.forall(_.getLong(0) < 100), "the A-like half IS the top half")
  }

  test("acceptByImportance is deterministic and always keeps a max-weight doc") {
    val scores = Dsir.bucketScores(target, "text", raw, "text", B)
    val scored = Dsir.scoreDocs(raw, "doc_id", "text", scores, B)
    val a = Dsir.acceptByImportance(scored, "doc_id").select($"doc_id").as[Long].collect().toSet
    val b = Dsir.acceptByImportance(scored, "doc_id").select($"doc_id").as[Long].collect().toSet
    assert(a == b, "same data + salt must accept the same set")
    val best = scored.orderBy(col("dsir_mean").desc).select($"doc_id").as[Long].first()
    assert(a.contains(best), "w = w_max accepts with probability 1 (u < 1.0 always)")
    // Acceptance is weight-proportional: the off-target half survives
    // at a strictly lower rate than the target-like half.
    assert(a.count(_ < 100) > a.count(_ >= 100))
  }

  test("score join broadcasts the B-row table (no corpus-sized shuffle on the score side)") {
    val scores = Dsir.bucketScores(target, "text", raw, "text", B)
    val plan = Dsir.scoreDocs(raw, "doc_id", "text", scores, B)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected a broadcast score join, got:\n$plan")
  }
}
