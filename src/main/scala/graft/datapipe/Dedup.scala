package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for a document corpus — each variant scales a
  * different way, and none ever does an all-pairs crossJoin:
  *
  *  - exact:   one shuffle on the content hash;
  *  - jaccard: token-inverted-index join (candidates only meet through
  *             a shared token, frequent tokens pruned — prefix
  *             filtering; verified with TRUE set similarity);
  *  - minhash: banded LSH — pairs only meet through a shared band
  *             bucket, candidates then verified with true Jaccard;
  *  - simhash: 64-bit sketch, candidates meet through equal 16-bit
  *             chunks (Hamming ≤ 3 ⇒ some chunk equal by pigeonhole);
  *  - embedding: cosine near-dup via the Similarity module.
  *
  * At 100 TB the bucket/band joins are ordinary shuffle joins on small
  * keys; group sizes are bounded by band width and token-frequency
  * pruning, and AQE splits whatever skews.
  */
object Dedup {

  /** Exact dedup: canonical hash → keep lowest doc id (deterministic
    * survivor), count the duplicates.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_copies"))

  /** Distinct (doc, token) pairs with document-frequency pruning: tokens
    * appearing in more than `maxDf` docs can't discriminate and only
    * inflate the index — standard prefix-filter trick.
    */
  def tokenIndex(docs: DataFrame, idCol: String, textCol: String, maxDf: Long): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc"), explode(array_distinct(TextAnalysis.words(col(textCol)))).as("w"))
    // Plain shuffle semi-join on the token: `keep` is nearly the whole
    // vocabulary (everything under the df cap), which on a large corpus
    // is billions of rows — never hint it broadcast. AQE may still
    // broadcast it at runtime when it is measured small; that choice
    // must stay the planner's, not a hard-coded hint.
    val keep = tok.groupBy(col("w")).count().filter(col("count") <= maxDf).select(col("w"))
    tok.join(keep, Seq("w"), "left_semi")
  }

  /** N-gram/word-set Jaccard pairs ≥ `minJaccard` via inverted index.
    * Candidates meet through a shared token in the df-PRUNED index
    * (prefix filtering bounds the self-join); the reported jaccard is
    * then verified on the FULL distinct word sets — pruning narrows
    * which pairs are examined, never what similarity they're assigned.
    * Recall bound (inherent to df pruning): a pair ALL of whose shared
    * tokens exceed `maxDf` never becomes a candidate — e.g. a corpus
    * duplicated en masse where every token's df passes the cap. That
    * regime is exactly where [[exact]] and [[minhashPairs]] (no df
    * pruning) stay correct; raise `maxDf` or use those there.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double, maxDf: Long = 1000): DataFrame = {
    // Materialized: both sides of the candidate self-join consume the
    // index; unmaterialized, tokenize + df-count + semi-join run twice.
    val idx = graft.util.Materialize.once(tokenIndex(docs, idCol, textCol, maxDf))
    val cand = idx.as("a").join(idx.as("b"), col("a.w") === col("b.w") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b")).distinct()
    val sets = docs.select(col(idCol).as("doc"),
      array_distinct(TextAnalysis.words(col(textCol))).as("ws"))
    cand
      .join(sets.select(col("doc").as("doc_a"), col("ws").as("wa")), Seq("doc_a"))
      .join(sets.select(col("doc").as("doc_b"), col("ws").as("wb")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Asymmetric CONTAINMENT pairs — |A∩B| ≥ (num/den)·|A| in either
    * direction: the near-dup relation symmetric Jaccard misses when a
    * short document is wholly embedded in a long one (quote farms,
    * article + syndicated excerpt). Candidates come from the same
    * df-capped inverted index as [[jaccardPairs]] (same recall bound:
    * a pair sharing ONLY over-`maxDf` tokens is never examined); the
    * verdicts are then exact INTEGER cross-multiplications over the
    * TRUE intersection and set sizes — no IEEE ratio in the filter, so
    * results are engine-portable. Output: `(doc_a, doc_b, c, na, nb,
    * a_in_b, b_in_a)` — true counts plus both direction flags; callers
    * wanting a containment ratio derive it from c/na or c/nb.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       minNum: Long, minDen: Long, maxDf: Long = 1000,
                       shingle: Int = 0): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
      explode(array_distinct(units(col(textCol), shingle))).as("w"))
    val keep = tok.groupBy(col("w")).count().filter(col("count") <= maxDf).select(col("w"))
    val idx = graft.util.Materialize.once(tok.join(keep, Seq("w"), "left_semi"))
    val cand = idx.as("a").join(idx.as("b"), col("a.w") === col("b.w") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b")).distinct()
    val sets = docs.select(col(idCol).as("doc"),
      array_distinct(units(col(textCol), shingle)).as("ws"))
    cand
      .join(sets.select(col("doc").as("doc_a"), col("ws").as("wa")), Seq("doc_a"))
      .join(sets.select(col("doc").as("doc_b"), col("ws").as("wb")), Seq("doc_b"))
      .withColumn("c", size(array_intersect(col("wa"), col("wb"))).cast("long"))
      .withColumn("na", size(col("wa")).cast("long"))
      .withColumn("nb", size(col("wb")).cast("long"))
      .withColumn("a_in_b", col("c") * minDen >= lit(minNum) * col("na"))
      .withColumn("b_in_a", col("c") * minDen >= lit(minNum) * col("nb"))
      .filter(col("a_in_b") || col("b_in_a"))
      .select(col("doc_a"), col("doc_b"), col("c"), col("na"), col("nb"),
        col("a_in_b"), col("b_in_a"))
  }

  /** Hashing unit: word set by default; `shingle` >= 2 switches to
    * order-sensitive w-shingles (TextAnalysis.shingles) — the classic
    * resemblance formulation, under which reordered documents are NOT
    * near-duplicates.
    */
  private[datapipe] def units(text: Column, shingle: Int): Column =
    if (shingle >= 2) TextAnalysis.shingles(text, shingle) else TextAnalysis.words(text)

  /** MinHash signature rows: (doc, band, band_key). `numHashes` hash
    * functions grouped into `bands` bands whose concatenated minima
    * form the LSH bucket key. Two hash families:
    *  - fast (default): seeded xxhash64 — the production path;
    *  - portable: 15-hex-char md5 prefixes compared as strings —
    *    bit-identical in DuckDB, so the whole banding pipeline is
    *    oracle-checkable (q_dedup_minhash_md5).
    */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 16, bands: Int = 4, portable: Boolean = false,
                   shingle: Int = 0): DataFrame = {
    // bands > numHashes would give every doc the constant empty-band
    // key (one global bucket — the N² cross product this module exists
    // to avoid); a non-divisible split would silently discard the
    // trailing hash functions, weakening the signature vs. what the
    // caller asked for.
    require(bands >= 1 && numHashes >= bands && numHashes % bands == 0,
      s"numHashes must be a positive multiple of bands, got numHashes=$numHashes bands=$bands")
    val rowsPerBand = numHashes / bands
    val tok = docs.select(col(idCol).as("doc"), explode(array_distinct(units(col(textCol), shingle))).as("w"))
    val minExprs = (0 until numHashes).map { i =>
      if (portable) min(substring(md5(concat_ws("|", lit(i.toString), col("w"))), 1, 15)).as(s"h$i")
      else min(xxhash64(lit(i), col("w"))).as(s"h$i")
    }
    val sigs = tok.groupBy(col("doc")).agg(minExprs.head, minExprs.tail: _*)
    val bandCols = (0 until bands).map { b =>
      val hs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      val key = if (portable) md5(concat_ws("|", hs: _*)) else xxhash64(hs: _*).cast("string")
      struct(lit(b).as("band"), key.as("key")).as(s"band$b")
    }
    sigs.select(col("doc"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("band_key"))
  }

  /** MinHash-LSH near-dup pairs: candidates share a band bucket, then
    * are verified with true word-set Jaccard.
    *
    * `maxBucket` bounds the quadratic term: buckets up to the cap emit
    * all candidate pairs; oversized buckets — which only form when the
    * corpus is redundant en masse (a 10×-replicated corpus benched at
    * ~sf1 produced a 2500-doc bucket, 3.1M pairs from one bucket and a
    * 68× blowup) — emit only the STAR against the bucket minimum
    * (|bucket|−1 pairs, still Jaccard-verified). Within an oversized
    * bucket the members are near-identical by construction, so the star
    * reports each member's duplication without enumerating the clique.
    * The default keeps the exact all-pairs semantics.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double, numHashes: Int = 16, bands: Int = 4,
                   portable: Boolean = false, shingle: Int = 0,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    // Materialized: the band table feeds both sides of the candidate
    // self-join; unmaterialized, the tokenize + numHashes×min hashing
    // (the expensive part) runs twice.
    val bandsDf = graft.util.Materialize.once(
      minhashBands(docs, idCol, textCol, numHashes, bands, portable, shingle))
    val cand =
      if (maxBucket == Int.MaxValue) {
        bandsDf.as("a")
          .join(bandsDf.as("b"),
            col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
              col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b")).distinct()
      } else {
        val sized = bandsDf.join(
          bandsDf.groupBy(col("band"), col("band_key"))
            .agg(count(lit(1)).as("__n"), min(col("doc")).as("__keep")),
          Seq("band", "band_key"))
        val small = sized.filter(col("__n") <= maxBucket)
          .select(col("doc"), col("band"), col("band_key"))
        val allPairs = small.as("a")
          .join(small.as("b"),
            col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
              col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        val starPairs = sized.filter(col("__n") > maxBucket && col("doc") =!= col("__keep"))
          .select(col("__keep").as("doc_a"), col("doc").as("doc_b"))
        // A pair can surface as all-pairs in one band and as a star in
        // another — distinct over the union, not per branch.
        allPairs.unionByName(starPairs).distinct()
      }
    val sizes = docs.select(col(idCol).as("doc"), array_distinct(units(col(textCol), shingle)).as("ws"))
    cand
      .join(sizes.select(col("doc").as("doc_a"), col("ws").as("wa")), Seq("doc_a"))
      .join(sizes.select(col("doc").as("doc_b"), col("ws").as("wb")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash-LSH dedup drop-set with bucket-size capping: buckets up to
    * `maxBucket` go through pairwise true-Jaccard verification (drop
    * the higher id of each verified pair); oversized buckets — which
    * only form when documents are near-identical en masse — skip the
    * quadratic verify and keep just the bucket minimum. This bounds
    * candidate pairs at `buckets × maxBucket²` regardless of corpus
    * redundancy.
    */
  def minhashDropSet(docs: DataFrame, idCol: String, textCol: String,
                     minJaccard: Double, maxBucket: Int = 100,
                     numHashes: Int = 16, bands: Int = 4, portable: Boolean = false,
                     shingle: Int = 0): DataFrame = {
    val (verified, bigDrops) =
      minhashVerifiedEdges(docs, idCol, textCol, minJaccard, maxBucket, numHashes, bands, portable, shingle)
    verified.select(col("doc_b").as("doc")).unionByName(bigDrops).distinct()
  }

  /** Shared candidate machinery for the two survivor rules: returns the
    * VERIFIED near-dup edge list `(doc_a, doc_b)` (true Jaccard ≥
    * threshold, small buckets only) and the oversized-bucket drop set
    * `(doc)` (buckets > `maxBucket` skip quadratic verification and
    * keep their minimum directly — the pairs bound).
    */
  private[datapipe] def minhashVerifiedEdges(
      docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, maxBucket: Int,
      numHashes: Int = 16, bands: Int = 4, portable: Boolean = false,
      shingle: Int = 0): (DataFrame, DataFrame) = {
    // Materialized for the same reason as in minhashPairs: consumed by
    // the bucket sizing AND both sides of the candidate self-join.
    val bandsDf = graft.util.Materialize.once(
      minhashBands(docs, idCol, textCol, numHashes, bands, portable, shingle))
    val sized = bandsDf.join(
      bandsDf.groupBy(col("band"), col("band_key"))
        .agg(count(lit(1)).as("__n"), min(col("doc")).as("__keep")),
      Seq("band", "band_key"))
    val small = sized.filter(col("__n") <= maxBucket).select(col("doc"), col("band"), col("band_key"))
    val cand = small.as("a")
      .join(small.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b")).distinct()
    val sizes = docs.select(col(idCol).as("doc"), array_distinct(units(col(textCol), shingle)).as("ws"))
    val verified = cand
      .join(sizes.select(col("doc").as("doc_a"), col("ws").as("wa")), Seq("doc_a"))
      .join(sizes.select(col("doc").as("doc_b"), col("ws").as("wb")), Seq("doc_b"))
      .filter(
        size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))).cast("double") >= minJaccard)
      .select(col("doc_a"), col("doc_b"))
    val bigDrops = sized.filter(col("__n") > maxBucket && col("doc") =!= col("__keep"))
      .select(col("doc"))
    (verified, bigDrops)
  }

  /** 64-bit SimHash over the word multiset: per-bit signed vote of each
    * word's hash — no explode, no shuffle, one fused codegen'd pass per
    * row (graft.functions.SimHash64; the old HOF formulation built a
    * 64-element vote array per word).
    */
  def simhash(text: Column): Column =
    graft.functions.SimHash64.of(TextAnalysis.words(text))

  /** SimHash candidate pairs: equal sketch chunk ⇒ candidate; verified
    * by Hamming distance ≤ `maxHamming` (bit_count of XOR).
    *
    * Recall contract: the 64 sketch bits split into `maxHamming + 1`
    * chunks, so any pair within `maxHamming` has at least one untouched
    * — hence equal — chunk (pigeonhole). The old fixed 4-chunk split
    * only guaranteed Hamming ≤ 3 and silently missed farther pairs.
    *
    * `maxBucket` bounds the quadratic term like minhashPairs: chunk
    * keys are at most ~64/(maxHamming+1) bits, so the bucket COUNT is
    * fixed and bucket SIZE grows linearly with the corpus — without a
    * cap, candidate pairs grow quadratically. Oversized buckets emit
    * only the Hamming-verified STAR against the bucket minimum
    * (documented under-merge, never a false pair).
    */
  /** [[simhashPairs]] with the PORTABLE md5 hash family
    * (graft.functions.SimHashMd5) — sketches any engine can replay, so
    * the pair set is fully oracle-checkable; the candidate machinery
    * is identical.
    */
  def simhashPairsMd5(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    val sh = graft.util.Materialize.once(
      docs.select(col(idCol).as("doc"),
        graft.functions.SimHashMd5.of(TextAnalysis.words(col(textCol))).as("sh")))
    simhashPairsFromSketches(sh, maxHamming, maxBucket)
  }

  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    // Materialized: the 64-bit sketch per doc is the expensive part
    // (per-word bit votes) and feeds both sides of the chunk self-join.
    val sh = graft.util.Materialize.once(
      docs.select(col(idCol).as("doc"), simhash(col(textCol)).as("sh")))
    simhashPairsFromSketches(sh, maxHamming, maxBucket)
  }

  /** Hamming near-dup pairs over ANY precomputed 64-bit sketch table
    * `(doc, sh)` — the public face of the SimHash candidate machinery
    * for other sketch families (e.g. [[Multimodal.dhashBmp]]'s image
    * perceptual hashes): same pigeonhole recall guarantee (lossless at
    * Hamming ≤ maxHamming), same `maxBucket` star cap on the
    * quadratic term.
    */
  def sketchHammingPairs(sketches: DataFrame, idCol: String, sketchCol: String,
                         maxHamming: Int, maxBucket: Int = Int.MaxValue): DataFrame =
    simhashPairsFromSketches(
      sketches.select(col(idCol).as("doc"), col(sketchCol).as("sh")),
      maxHamming, maxBucket)

  /** Candidate machinery over precomputed sketches `(doc, sh)` — split
    * out so the pigeonhole recall guarantee is property-testable on
    * planted bit-flip pairs without going through text.
    */
  private[datapipe] def simhashPairsFromSketches(sh: DataFrame, maxHamming: Int,
                                                 maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      "maxHamming in [0, 15]: pigeonhole needs maxHamming+1 chunks and chunks below 4 bits bucket uselessly")
    val numChunks = maxHamming + 1
    // Distribute 64 bits as evenly as possible across the chunks.
    val widths = Array.tabulate(numChunks)(i => 64 / numChunks + (if (i < 64 % numChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val chunkStructs = (0 until numChunks).map { i =>
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1L
      struct(lit(i).as("chunk"),
        shiftrightunsigned(col("sh"), offsets(i)).bitwiseAND(mask).as("key"))
    }
    val chunks = sh.select(col("doc"), col("sh"),
      explode(array(chunkStructs: _*)).as("ck"))
      .select(col("doc"), col("sh"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val cand =
      if (maxBucket == Int.MaxValue) {
        chunks.as("a")
          .join(chunks.as("b"),
            col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") && col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("a.sh").as("sh_a"),
            col("b.doc").as("doc_b"), col("b.sh").as("sh_b"))
      } else {
        val sized = chunks.join(
          chunks.groupBy(col("chunk"), col("key"))
            .agg(count(lit(1)).as("__n"), min_by(struct(col("doc"), col("sh")), col("doc")).as("__keep")),
          Seq("chunk", "key"))
        val small = sized.filter(col("__n") <= maxBucket)
          .select(col("doc"), col("sh"), col("chunk"), col("key"))
        val allPairs = small.as("a")
          .join(small.as("b"),
            col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") && col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("a.sh").as("sh_a"),
            col("b.doc").as("doc_b"), col("b.sh").as("sh_b"))
        val starPairs = sized.filter(col("__n") > maxBucket && col("doc") =!= col("__keep.doc"))
          .select(col("__keep.doc").as("doc_a"), col("__keep.sh").as("sh_a"),
            col("doc").as("doc_b"), col("sh").as("sh_b"))
        allPairs.unionByName(starPairs)
      }
    cand
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
