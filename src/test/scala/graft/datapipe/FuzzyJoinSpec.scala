package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // Adversarial set: transpositions (share deletions at distance 2),
  // repeats, prefixes, short strings, the empty string.
  private val words = Seq(
    "spark", "sparc", "spork", "sprk", "sparkk", "park", "stark",
    "ab", "ba", "a", "", "aa", "aaa", "graft", "grait", "grfat",
    "stream", "streams", "upstream")

  private def df(name: String) =
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF(s"${name}_id", s"${name}_w")

  private def brute(k: Int): Set[(Long, Long)] =
    (for {
      (a, i) <- words.zipWithIndex
      (b, j) <- words.zipWithIndex
      if levDist(a, b) <= k
    } yield (i.toLong, j.toLong)).toSet

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistanceJoin == brute force at k = 1 and k = 2") {
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistanceJoin(df("l"), "l_id", "l_w", df("r"), "r_id", "r_w", k)
        .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
      assert(got == brute(k), s"pair set at k=$k")
    }
  }

  test("same-named columns on both sides join cleanly; right side suffixes _r") {
    // Two document tables keyed `id` with a `text` column — the common
    // shape that used to die in analysis with an ambiguous reference.
    val a = Seq((1L, "kitten"), (2L, "apple")).toDF("id", "text")
    val b = Seq((10L, "sitten"), (20L, "orange")).toDF("id", "text")
    val out = FuzzyJoin.editDistanceJoin(a, "id", "text", b, "id", "text", 1)
    assert(out.columns.toSeq == Seq("id", "text", "id_r", "text_r", "dist"))
    val got = out.select($"id", $"id_r", $"dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 10L, 1)), s"got $got")
  }

  test("output-name guards: reserved 'dist' rejected, suffixing loops past chained collisions") {
    val a = Seq((1L, "kitten")).toDF("id", "dist")
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(a, "id", "dist", a.toDF("id", "w"), "id", "w", 1)
    }
    // rightText collides with leftText AND the suffixed name collides
    // with rightKey ("text_r"): the loop must find a THIRD name.
    val l = Seq((1L, "kitten")).toDF("id", "text")
    val r = Seq((10L, "sitten")).toDF("text_r", "text")
    val out = FuzzyJoin.editDistanceJoin(l, "id", "text", r, "text_r", "text", 1)
    assert(out.columns.toSeq == Seq("id", "text", "text_r", "text_r_r", "dist"),
      s"chained collision must keep all columns distinct: ${out.columns.toSeq}")
    assert(out.count() == 1)
  }

  test("dist column is the exact levenshtein distance") {
    val got = FuzzyJoin.editDistanceJoin(df("l"), "l_id", "l_w", df("r"), "r_id", "r_w", 2)
      .as[(Long, String, Long, String, Int)].collect()
    got.foreach { case (_, a, _, b, d) => assert(d == levDist(a, b), s"dist($a, $b)") }
  }

  test("transposition pair ab/ba shares a deletion variant but is filtered at k = 1") {
    val pairs = FuzzyJoin.editDistanceJoin(df("l"), "l_id", "l_w", df("r"), "r_id", "r_w", 1)
      .filter($"l_w" === "ab" && $"r_w" === "ba").count()
    assert(pairs == 0, "lev(ab, ba) = 2 must not pass k = 1")
  }

  test("null text yields no pairs; bounds are enforced") {
    val l = Seq((1L, null.asInstanceOf[String]), (2L, "ok")).toDF("l_id", "l_w")
    val r = Seq((1L, "ok")).toDF("r_id", "r_w")
    val got = FuzzyJoin.editDistanceJoin(l, "l_id", "l_w", r, "r_id", "r_w", 1)
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(2L))
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(l, "l_id", "l_w", r, "r_id", "r_w", 3)
    }
  }

  test("the Column-expr neighborhood equals the property-tested JVM reference") {
    val inputs = words.filter(_ != null)
    for (k <- Seq(1, 2)) {
      val got = inputs.toDF("w")
        .select($"w", FuzzyJoin.deletionNeighborhood($"w", k).as("nb"))
        .as[(String, Seq[String])].collect().toMap
      inputs.foreach { w =>
        assert(got(w).toSet == FuzzyJoinProps.neighborhood(w, k),
          s"neighborhood($w, $k)")
      }
    }
  }

  test("candidate generation is an equi-join on variants, not a cross join") {
    val plan = FuzzyJoin.editDistanceJoin(df("l"), "l_id", "l_w", df("r"), "r_id", "r_w", 1)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesianproduct") && !plan.toLowerCase.contains("cross"),
      s"no cross join allowed:\n$plan")
  }
}
