package graft.datapipe

import graft.SharedSpark
import graft.tables.TestTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private def docs = TestTables.documents(spark, dir)

  test("hexThreshold maps fractions to the hash space with sane boundaries") {
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.hexThreshold(1.0) == "g") // sorts after every hex char
    assert(Sampling.hexThreshold(0.25) == "40000000")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    // Fractions within 2^-33 of 1.0 round to 2^32: the naive %08x
    // renders 9 chars ("100000000"), which the fixed-width compare
    // misreads and keeps only hashes below "10000000" (~1/16). Must
    // clamp to the keep-all sentinel instead.
    assert(Sampling.hexThreshold(math.nextDown(1.0)) == "g")
    assert(Sampling.hexThreshold(1.0 - 1e-12) == "g")
    // Largest fraction that still rounds INSIDE the space stays 8-wide.
    assert(Sampling.hexThreshold((4294967295.0 - 0.6) / 4294967296.0) == "fffffffe")
  }

  test("sampleByHash is deterministic and hits the target fraction") {
    val total = docs.count()
    val a = Sampling.sampleByHash(docs, col("doc_id"), 0.25).select($"doc_id").as[Long].collect().toSet
    val b = Sampling.sampleByHash(docs, col("doc_id"), 0.25).select($"doc_id").as[Long].collect().toSet
    assert(a == b, "same data + salt must select the same rows")
    // 4-sigma band around the binomial expectation.
    val sd = math.sqrt(total * 0.25 * 0.75)
    assert(math.abs(a.size - total * 0.25) < 4 * sd, s"got ${a.size} of $total")
    // A different salt draws a genuinely different sample.
    val c = Sampling.sampleByHash(docs, col("doc_id"), 0.25, salt = "other").select($"doc_id").as[Long].collect().toSet
    assert(a != c)
  }

  test("stratifiedSample applies per-stratum fractions") {
    val byLang = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedSample(docs, $"lang", $"doc_id",
        Map("en" -> 0.5, "zh" -> 0.3), defaultFraction = 0.1)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    def check(lang: String, f: Double): Unit = {
      val n = byLang(lang); val got = sampled.getOrElse(lang, 0L)
      val sd = math.sqrt(n * f * (1 - f))
      assert(math.abs(got - n * f) < 4 * sd + 1, s"$lang: got $got of $n at fraction $f")
    }
    check("en", 0.5); check("zh", 0.3); check("de", 0.1); check("fr", 0.1); check("es", 0.1)
  }

  test("weightedSample keeps everything at weight 1 and nothing at weight 0") {
    assert(Sampling.weightedSample(docs, $"doc_id", lit(1.0)).count() == docs.count())
    assert(Sampling.weightedSample(docs, $"doc_id", lit(0.0)).count() == 0)
    val half = Sampling.weightedSample(docs, $"doc_id", lit(0.5)).count()
    val sd = math.sqrt(docs.count() * 0.25)
    assert(math.abs(half - docs.count() * 0.5) < 4 * sd)
  }

  test("reservoirPerGroup returns exactly min(k, |group|) deterministic rows per group") {
    val k = 5
    val sizes = Sampling.reservoirPerGroup(docs, $"lang", $"doc_id", k)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(k.toLong, n), s"$lang: ${sizes(lang)}")
    }
    val again = Sampling.reservoirPerGroup(docs, $"lang", $"doc_id", k)
      .select($"doc_id").as[Long].collect().toSet
    val first = Sampling.reservoirPerGroup(docs, $"lang", $"doc_id", k)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == first)
  }

  test("toMixture hits exact per-domain quotas, drops unlisted domains, is stable") {
    val weights = Map("src0" -> 0.3, "src1" -> 0.2, "src2" -> 0.1)
    val out = Sampling.toMixture(docs, col("source"), col("doc_id"), weights, total = 60L)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts == Map("src0" -> 18L, "src1" -> 12L, "src2" -> 6L),
      s"exact floor(w*total) per domain, nothing else: $counts")
    // Stability: a rerun picks the identical rows (pure function of data+salt).
    val a = out.select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.toMixture(docs, col("source"), col("doc_id"), weights, total = 60L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("temperatureMixture quotas match the closed-form sqrt arithmetic and flatten skew") {
    val counts = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val wq = counts.map { case (d, n) => d -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong }
    val sumWq = wq.values.sum
    val expected = wq.map { case (d, w) => d -> w * 300L / sumWq }
    val out = Sampling.temperatureMixture(docs, col("lang"), col("doc_id"), total = 300L)
    val got = out.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(got == expected.filter(_._2 > 0), s"got $got expected $expected")
    // sqrt flattening: the biggest domain's share of the mixture is
    // strictly below its share of the raw corpus.
    val big = counts.maxBy(_._2)._1
    val rawShare = counts(big).toDouble / counts.values.sum
    val mixShare = got(big).toDouble / got.values.sum
    assert(mixShare < rawShare, s"$big raw=$rawShare mix=$mixShare")
    // Deterministic: rerun picks identical rows.
    val a = out.select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.temperatureMixture(docs, col("lang"), col("doc_id"), total = 300L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("temperatureMixture survives quotas whose wq*total product overflows Long") {
    // wq ≈ 1e6·sqrt(n); with total = 1e15 the product wq·total passes
    // 9.2e18 (Long.MaxValue) for every domain here. Pre-fix the wrap
    // made quotas negative and silently emptied the mixture; the
    // DECIMAL(38,0) product must keep every row (quota >> n).
    val out = Sampling.temperatureMixture(docs, col("lang"), col("doc_id"),
      total = 1_000_000_000_000_000L)
    assert(out.count() == docs.count(),
      "oversized total must keep the whole corpus, not overflow to zero")
  }

  test("withEpochs repeats every row floor(e) times plus a stable fractional extra") {
    val out = Sampling.withEpochs(docs.select($"doc_id"), $"doc_id", epochs = 2.3)
    val perDoc = out.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(perDoc.values.forall(c => c == 2L || c == 3L), "2 or 3 copies each")
    val three = perDoc.values.count(_ == 3L).toDouble / perDoc.size
    assert(three > 0.15 && three < 0.45, s"~30% get the third copy, got $three")
    // Copy indexes are 0..copies-1 and the op is deterministic.
    assert(out.filter($"epoch" < 0 || $"epoch" > 2).count() == 0)
    val again = Sampling.withEpochs(docs.select($"doc_id"), $"doc_id", epochs = 2.3)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(again == perDoc)
  }

  test("groupSplit assigns whole groups to one side and roughly hits the fraction") {
    val out = Sampling.groupSplit(docs, col("source"), valFraction = 0.2)
    val perGroup = out.groupBy("source").agg(countDistinct("split").as("n"))
      .filter($"n" > 1).count()
    assert(perGroup == 0, "a group must never straddle the split")
    val valGroups = out.filter($"split" === "val").select($"source").distinct().count()
    assert(valGroups >= 1 && valGroups <= 10,
      s"~20% of 20 sources in val, got $valGroups") // hash noise allowed, emptiness not
  }

  test("keywords: rare repeated term outranks common terms; k respected") {
    import graft.datapipe.Keywords
    val df = Seq(
      (1L, "zebra zebra common common common"),
      (2L, "common plain words here"),
      (3L, "common plain words there")).toDF("doc_id", "text")
    val top = Keywords.topTfIdf(df, "doc_id", "text", k = 2)
    val doc1 = top.filter($"doc" === 1L).orderBy($"rank")
      .select($"term").as[String].collect().toSeq
    assert(doc1.head == "zebra", s"doc-unique repeated term must rank first: $doc1")
    assert(top.groupBy($"doc").count().filter($"count" > 2).count() == 0)
  }

  test("collocations: always-adjacent pair outranks frequent-but-independent words") {
    import graft.datapipe.Keywords
    // "hong kong" always adjacent (lift max); "the" pairs with many words.
    val df = (1 to 10).map(i =>
      (i.toLong, s"visit hong kong the city the park the trip number$i")).toDF("doc_id", "text")
    val top = Keywords.collocations(df, "text", k = 5, minCount = 5L)
      .select($"bigram").as[String].collect().toSeq
    assert(top.head == "hong kong", s"perfect collocation must rank first: $top")
  }

  test("bm25TopK: rarity weighting, length normalization, k respected") {
    import graft.datapipe.Keywords
    val df = Seq(
      (1L, "quantum flux capacitor alignment"),
      (2L, "common words appear here often common words"),
      (3L, "common words appear there often common words extra extra extra extra"),
      (4L, "unrelated totally different content")).toDF("doc_id", "text")
    val qs = Seq((10L, "quantum flux"), (20L, "common words"), (30L, "quantum common"))
      .toDF("q_id", "q_text")
    val top = Keywords.bm25TopK(df, "doc_id", "text", qs, "q_id", "q_text", k = 3)
    val q10 = top.filter($"q_id" === 10L).orderBy($"rank").select($"doc").as[Long].collect().toSeq
    assert(q10 == Seq(1L), s"only doc 1 contains the q10 terms: $q10")
    // Docs 2 and 3 tie on tf for both terms; doc 3 is longer, so
    // length normalization must rank doc 2 first.
    val q20 = top.filter($"q_id" === 20L).orderBy($"rank").select($"doc").as[Long].collect().toSeq
    assert(q20 == Seq(2L, 3L), s"length normalization must favor the shorter doc: $q20")
    // "quantum" (df=1) must outweigh "common" (df=2) matches.
    val q30 = top.filter($"q_id" === 30L).orderBy($"rank").select($"doc").as[Long].collect().toSeq
    assert(q30.head == 1L, s"rare-term doc must rank first: $q30")
    assert(top.groupBy($"q_id").count().filter($"count" > 3).count() == 0, "k must bound each query")
  }

  test("bm25TopK: repeated query words count once; wordless queries produce no rows") {
    import graft.datapipe.Keywords
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha delta epsilon")).toDF("doc_id", "text")
    val qs = Seq((1L, "alpha alpha alpha"), (2L, "alpha"), (3L, "   ")).toDF("q_id", "q_text")
    val top = Keywords.bm25TopK(df, "doc_id", "text", qs, "q_id", "q_text", k = 5)
    val s1 = top.filter($"q_id" === 1L).select($"doc", $"score").as[(Long, Long)].collect().toMap
    val s2 = top.filter($"q_id" === 2L).select($"doc", $"score").as[(Long, Long)].collect().toMap
    assert(s1 == s2, s"distinct query terms: $s1 vs $s2")
    assert(top.filter($"q_id" === 3L).count() == 0, "no words -> no candidates")
  }

  test("rrfFuse: consensus docs outrank single-system docs; exact integer scores") {
    import graft.datapipe.Retrieval
    // doc 7 is rank 2 in BOTH systems; docs 1 and 9 are rank 1 in one
    // system each. 2/(60+2) > 1/(60+1), so consensus must win.
    val sysA = Seq((100L, 1L, 1), (100L, 7L, 2), (100L, 3L, 3)).toDF("q_id", "doc", "rank")
    val sysB = Seq((100L, 9L, 1), (100L, 7L, 2), (100L, 4L, 3)).toDF("q_id", "doc", "rank")
    val out = Retrieval.rrfFuse(Seq(sysA, sysB), k = 3)
    val rows = out.orderBy($"rank").select($"doc", $"score", $"n_systems")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.head._1 == 7L, s"consensus doc must rank first: $rows")
    assert(rows.head._2 == 2 * (1000000000L / 62L), s"rank-2+rank-2 score: ${rows.head}")
    assert(rows.head._3 == 2L)
    // Ties (docs 1 and 9, both 1e9/61) break by doc id.
    assert(rows.map(_._1) == Seq(7L, 1L, 9L), s"tie-break by doc: $rows")
    assert(out.count() == 3, "k must bound the output")
  }

  test("percentileGate keeps exactly the rows at or above the exact percentile") {
    val scored = docs.select($"doc_id", TextAnalysis.qualityScore($"text").as("q"))
    val kept = Sampling.percentileGate(scored, $"q", 0.9)
    val total = scored.count(); val n = kept.count()
    assert(n >= total / 20 && n <= total / 5, s"top-10% gate kept $n of $total")
    val minKept = kept.agg(min($"q")).as[Double].head()
    val dropped = scored.join(kept.select($"doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = dropped.agg(max($"q")).as[Double].head()
    assert(maxDropped < minKept, s"gate must be a clean cut: dropped max $maxDropped vs kept min $minKept")
  }

  test("percentileGateApprox: clean cut, kept fraction within the sketch's rank-error bound") {
    import spark.implicits._
    val n = 10000
    val scored = (1 to n).map(i => (i.toLong, (i * 7919 % n).toDouble)).toDF("id", "q")
    val accuracy = 1000 // rank error <= n/accuracy = 10 rows
    val kept = Sampling.percentileGateApprox(scored, $"q", 0.9, accuracy)
    val k = kept.count()
    val expected = n / 10
    assert(math.abs(k - expected) <= n / accuracy + 1,
      s"kept $k, expected $expected +/- ${n / accuracy}")
    // Still a clean threshold cut even though the threshold is approximate.
    val minKept = kept.agg(min($"q")).as[Double].head()
    val maxDropped = scored.join(kept.select($"id"), Seq("id"), "left_anti")
      .agg(max($"q")).as[Double].head()
    assert(maxDropped < minKept)
  }

  test("packSequences assigns every doc once and bins only overflow by their last doc") {
    val budget = 512L
    val packed = Sampling.packSequences(docs, $"doc_id",
      TextAnalysis.tokenCountWs($"text"), budget = budget, buckets = 8)
    assert(packed.count() == docs.count())
    assert(packed.select($"key").distinct().count() == docs.count())
    // Streaming-pack rule: a doc STARTS in its bin, so a bin's token
    // total minus its last doc stays under budget.
    val viol = packed.groupBy($"bucket", $"bin")
      .agg(sum($"n_tokens").as("tot"), max($"n_tokens").as("biggest"))
      .filter($"tot" - $"biggest" >= budget)
    assert(viol.count() == 0, "bin start offsets must stay under the budget")
    // Bins are contiguous per bucket: max(bin)+1 == distinct bins.
    val bins = packed.groupBy($"bucket").agg(max($"bin").as("mx"), countDistinct($"bin").as("n"))
      .filter($"mx" + 1 =!= $"n")
    assert(bins.count() == 0, "bin ids must be dense per bucket")
  }
}
