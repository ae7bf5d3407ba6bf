package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) similarity join — find all cross-table string
  * pairs within Levenshtein distance `maxDist`, without an all-pairs
  * comparison.
  *
  * Candidate scheme: the symmetric deletion neighborhood (SymSpell;
  * Garbe's public algorithm). If `lev(a, b) <= k`, the two strings
  * share at least one member of their depth-k deletion neighborhoods
  * (delete the characters the edit script touches on each side: both
  * sides land on the same common subsequence with <= k deletions
  * each). So candidates = equi-join on exploded deletion variants — a
  * plain key shuffle, never a cross join. Sharing a variant does NOT
  * imply `lev <= k` (e.g. "ab"/"ba" share "a" at k=1 but sit at
  * distance 2), so every candidate pair is settled by a final
  * codegen'd `levenshtein` filter: the operator is EXACT regardless
  * of how loose the candidate generator is.
  *
  * Scale posture: each string of length L yields ~`L choose <=k`
  * variants (L+1 at k=1), so the exploded key table is a bounded
  * multiple of the corpus — the reason `maxDist` is capped at 2; at
  * k=3+ the variant blowup (~L^3) wants the segment-index family
  * (PassJoin) instead. The verify filter runs only on candidate
  * pairs, which for near-duplicate workloads is orders of magnitude
  * below |L|x|R|. Pair generation runs on slim (key, text)
  * projections; callers join wide payloads back by key afterwards —
  * the same discipline as the cosine/minhash dedup family.
  */
object FuzzyJoin {

  /** All strings obtainable from `v` by deleting exactly one
    * character: position i keeps chars [1..i] and [i+2..L].
    */
  private def deleteEach(v: Column): Column =
    when(length(v) > 0,
      transform(sequence(lit(0), length(v) - 1),
        i => concat(v.substr(lit(1), i), v.substr(i + lit(2), length(v)))))
      .otherwise(array())

  /** The depth-`k` deletion neighborhood of `s`, including `s` itself
    * (deletion distance 0). Pure nested higher-order functions —
    * codegen-friendly, no UDF, no shuffle.
    */
  def deletionNeighborhood(s: Column, k: Int): Column = {
    require(k >= 1 && k <= 2, s"deletion neighborhood supported for k in {1, 2}, got $k")
    val d1 = deleteEach(s)
    val all =
      if (k == 1) concat(array(s), d1)
      else concat(array(s), d1, flatten(transform(d1, v => deleteEach(v))))
    array_distinct(all)
  }

  /** All (left, right) pairs with `levenshtein(leftText, rightText)
    * <= maxDist`. Output: `leftKey, leftText, rightKey, rightText,
    * dist` — slim by design; join payload columns back by key. When a
    * right column NAME collides with a left output name (two document
    * tables both keyed `id` with a `text` column — the common case),
    * the right column is suffixed `_r` instead of failing analysis
    * with an ambiguous reference.
    *
    * Keys must be unique per side (the usual doc-id contract); rows
    * with NULL text produce no candidates and never match (SQL
    * `levenshtein(NULL, _)` is NULL).
    */
  def editDistanceJoin(left: DataFrame, leftKey: String, leftText: String,
                       right: DataFrame, rightKey: String, rightText: String,
                       maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"editDistanceJoin supports maxDist in {1, 2} (variant blowup is ~L^k), got $maxDist")
    // Internal names keep the join unambiguous whatever the callers
    // called their columns; output restores caller names (suffixing
    // only on collision). "dist" is reserved by the output contract —
    // a left column of that name would be silently overwritten by the
    // withColumn below, so refuse it loudly.
    require(leftKey != "dist" && leftText != "dist",
      "left columns may not be named 'dist' — it is the output distance column")
    val taken = scala.collection.mutable.Set(leftKey, leftText, "dist")
    def rightName(n: String): String = {
      var out = n
      while (taken(out)) out += "_r" // loop: a single suffix could still collide
      taken += out
      out
    }
    val l = left.select(col(leftKey).as("__lk"), col(leftText).as("__lt"))
      .withColumn("__v", explode(deletionNeighborhood(col("__lt"), maxDist)))
    val r = right.select(col(rightKey).as("__rk"), col(rightText).as("__rt"))
      .withColumn("__v", explode(deletionNeighborhood(col("__rt"), maxDist)))
    val rkOut = rightName(rightKey)
    val rtOut = rightName(rightText)
    l.join(r, Seq("__v"))
      .select(col("__lk").as(leftKey), col("__lt").as(leftText),
        col("__rk").as(rkOut), col("__rt").as(rtOut))
      .distinct()
      // Thresholded levenshtein: the kernel abandons a row the moment
      // the running minimum exceeds maxDist (returns -1) — on a
      // candidate set this is most comparisons; values ≤ maxDist are
      // exact, so results are unchanged.
      .withColumn("dist", levenshtein(col(leftText), col(rtOut), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }
}
