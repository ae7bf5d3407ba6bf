package graft.datapipe

import graft.util.Materialize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece unigram model,
  * Kudo 2018) — the third member of the tokenizer triad next to
  * [[Bpe]] (merge learning) and
  * [[graft.functions.SubwordTokenize]] (WordPiece apply): where BPE
  * GROWS a vocab bottom-up by merging, unigram LM SHRINKS a seeded
  * candidate vocab top-down by keeping the pieces an optimal
  * segmentation actually uses.
  *
  * Model, following the paper's structure with two deliberate,
  * documented surrogates:
  *
  *   - HARD EM: the E-step assigns each word its single best (Viterbi)
  *     segmentation under current piece costs instead of marginalizing
  *     over all segmentations; the M-step recounts piece usage from
  *     those segmentations (weighted by word frequency) and re-selects
  *     the vocab. Hard EM is the standard deterministic variant and is
  *     what makes every intermediate table exactly replayable.
  *   - INTEGER HALF-LOG2 COSTS: the paper's piece cost is −log p(piece).
  *     `ln`/`log2` on doubles differ in the last ulp across libm
  *     implementations and would break value-level oracles (the
  *     [[LmScore]]/[[Dsir]] lesson), so the cost is the EXACT integer
  *     floor(2·log2 total) − floor(2·log2 count) + 1, computed via
  *     binary bit lengths (floor(2·log2 x) = bitlen(x²) − 1 — `bin()`
  *     string length in Spark, `format('{:b}')` in DuckDB; no floating
  *     point anywhere). Resolution is half a bit (√2 in probability);
  *     the trailing +1 makes every piece strictly positive so Viterbi
  *     prefers fewer pieces on equal evidence, and counts saturate at
  *     2³¹−1 so the square stays inside a long at any corpus size.
  *
  * Scale shape (the same bound as [[Bpe]]): learning runs on the
  * word-FREQUENCY dictionary, never the corpus — the corpus
  * contributes one explode+aggregate shuffle; seeding, Viterbi and
  * recounting are all vocab-bounded. The piece table itself is
  * `vocabSize`+alphabet rows BY CONSTRUCTION, so it rides along as a
  * one-row broadcast map and segmentation is a pure per-row Column
  * program (nested HOF folds, zero UDF) — applying the tokenizer to
  * the corpus is a linear, shuffle-free map.
  *
  * Viterbi determinism contract (mirrored token-for-token by the
  * oracle): dp[i] minimizes total cost over split points j ∈
  * [max(0, i−maxPieceLen), i); ties prefer the SMALLEST j (= the
  * longest final piece); absent pieces are infinite (the alphabet is
  * always retained, so every word stays segmentable).
  */
object UnigramLm {

  /** floor(2·log2(c)) + 1 for c ≥ 1 via the bit length of c² (exact
    * integer, no floating point); 1 for c = 0 (bin(0) = "0" — the
    * natural saturation that prices an unused piece at the maximum).
    * Counts clamp at 2³¹−1 so the square cannot overflow a long.
    */
  def bitlen2(c: Column): Column = {
    val cc = least(c.cast("long"), lit(2147483647L))
    length(bin(cc * cc)).cast("long")
  }

  /** Integer piece cost given its count and the current total mass:
    * bitlen2(total) − bitlen2(count) + 1 ∈ [1, ~63] — the half-log2
    * surrogate of −log p described in the object scaladoc.
    */
  def pieceCost(count: Column, total: Column): Column =
    bitlen2(total) - bitlen2(count) + lit(1L)

  /** The word-frequency dictionary (word, freq) — the vocab-bounded
    * frame ALL learning runs on.
    */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    Materialize.once(
      docs.select(explode(TextAnalysis.words(col(textCol))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq")))

  /** Every substring of `word` with length ≤ maxPieceLen, one array
    * element per occurrence (overlaps counted — the seed statistic is
    * occurrence mass, not document frequency). `word` must be a bound
    * attribute (lambda-CSE rule).
    */
  private def substrings(word: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)),
      i => transform(sequence(lit(1), least(lit(maxPieceLen), length(word) - i + 1)),
        l => word.substr(i, l))))

  /** Seed candidates: the `seedSize` most frequent substrings (count
    * desc, piece asc) UNIONed with the full single-character alphabet
    * (always retained so segmentation can never fail). Output
    * (piece, cnt).
    */
  def seedVocab(dict: DataFrame, seedSize: Int, maxPieceLen: Int): DataFrame = {
    val occ = dict
      .select(col("freq"), explode(substrings(col("word"), maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val top = occ.orderBy(col("cnt").desc, col("piece")).limit(seedSize)
    // The alphabet rows carry their true occurrence counts (they are
    // substrings too) — distinct-union dedupes pieces already in top.
    val singles = occ.filter(length(col("piece")) === 1)
    top.unionByName(singles).groupBy(col("piece")).agg(max(col("cnt")).as("cnt"))
  }

  /** One-row frame holding the vocab as a cost MAP — broadcastable by
    * construction (vocabSize+alphabet entries). Column name `__vmap`.
    */
  private def vocabMap(vocab: DataFrame): DataFrame =
    vocab.agg(map_from_entries(collect_list(struct(col("piece"), col("cost")))).as("__vmap"))

  private val INF = 1000000000000000L // absent-piece sentinel, additions stay far from overflow

  /** Viterbi-segment every dictionary word against a (piece, cost)
    * vocab: returns (word, freq, seg, n_pieces) with `seg` the pieces
    * joined by one space. Pure nested-HOF fold per word: the outer
    * aggregate builds dp[0..n] (cost, backpointer) position by
    * position, the inner aggregate scans the ≤ maxPieceLen candidate
    * split points ascending and keeps strict improvements only
    * (⇒ smallest j wins ties), and a final n-step fold walks the
    * backpointers into the piece array. The vocab travels as a
    * one-row broadcast map; `try_element_at` (not `element_at` — ANSI
    * throws on absent map keys) prices unknown pieces at the INF
    * sentinel.
    */
  def segmentWords(dict: DataFrame, vocab: DataFrame, maxPieceLen: Int): DataFrame = {
    val withMap = dict.join(broadcast(vocabMap(vocab)))
    val w = col("word")
    val vmap = col("__vmap")
    val n = length(w)
    // dp: array of struct(c: total cost, j: backpointer), 1-indexed by
    // position+1 (dp[1] = position 0 = empty prefix, cost 0).
    val dp = aggregate(
      sequence(lit(1), n),
      array(struct(lit(0L).as("c"), lit(-1).as("j"))),
      (acc, i) => {
        val best = aggregate(
          sequence(greatest(i - lit(maxPieceLen), lit(0)), i - 1),
          struct(lit(INF).as("c"), lit(-1).as("j")),
          (b, j) => {
            val piece = w.substr(j + 1, i - j)
            val cand = element_at(acc, j + 1).getField("c") +
              coalesce(try_element_at(vmap, piece), lit(INF))
            when(cand < b.getField("c"),
              struct(cand.as("c"), j.cast("int").as("j"))).otherwise(b)
          })
        concat(acc, array(best))
      })
    // The dp array is BOUND to an attribute before the backpointer
    // walk (lambda-CSE rule: an inline dp referenced from the walk
    // lambda would re-run the whole DP once per hop, O(n²·L) per
    // word). Two downstream references — the walk and the total-cost
    // column — keep CollapseProject from re-inlining the alias.
    val staged = withMap.select(col("word"), col("freq"), dp.as("__dp"))
    val dpA = col("__dp")
    // Backpointer walk from position n down to 0 (at most n hops; the
    // fold runs n times and no-ops once pos hits 0).
    val pieces = aggregate(
      sequence(lit(1), n),
      struct(n.as("pos"), array().cast("array<string>").as("ps")),
      (st, _) => {
        val pos = st.getField("pos")
        val j = element_at(dpA, pos + 1).getField("j")
        when(pos > 0, struct(
          j.as("pos"),
          concat(array(w.substr(j + 1, pos - j)), st.getField("ps")).as("ps")))
          .otherwise(st)
      }).getField("ps")
    staged.select(col("word"), col("freq"),
      array_join(pieces, " ").as("seg"), size(pieces).as("n_pieces"),
      element_at(dpA, n + 1).getField("c").as("seg_cost"))
  }

  /** One hard-EM round: Viterbi-segment the dictionary under the
    * current vocab, recount freq-weighted piece usage, keep the
    * `vocabSize` most used pieces (usage desc, piece asc) plus the
    * full alphabet, and re-derive costs from the new counts.
    * Input/output vocab schema: (piece, cnt, cost).
    */
  def emRound(dict: DataFrame, vocab: DataFrame, vocabSize: Int,
              maxPieceLen: Int): DataFrame = {
    val seg = segmentWords(dict, vocab, maxPieceLen)
    val usage = seg
      .select(col("freq"), explode(split(col("seg"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val top = usage.orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    // Alphabet survives even at zero usage (cnt 0 ⇒ maximum cost).
    val singles = vocab.filter(length(col("piece")) === 1).select(col("piece"))
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    withCosts(top.unionByName(singles).groupBy(col("piece")).agg(max(col("cnt")).as("cnt")))
  }

  /** (piece, cnt) → (piece, cnt, cost) with total = Σ cnt (the
    * unpartitioned window is safe: the frame is vocab-bounded by
    * construction, same as [[Dsir.bucketScores]]' spine).
    */
  def withCosts(counted: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    counted
      .withColumn("__t", sum(col("cnt")).over(w))
      .withColumn("cost", pieceCost(col("cnt"), col("__t")))
      .drop("__t")
  }

  /** Learn: seed → `nIters` hard-EM rounds. Returns the final vocab
    * (piece, cnt, cost) and the final per-word segmentation
    * (word, freq, seg, n_pieces). Each round's vocab is materialized —
    * it is vocabSize+alphabet rows, so the cost is nil and round i's
    * lineage stays O(1).
    */
  def learn(docs: DataFrame, textCol: String, seedSize: Int, maxPieceLen: Int,
            nIters: Int, vocabSize: Int): (DataFrame, DataFrame) = {
    require(nIters >= 1 && seedSize >= 1 && vocabSize >= 1 && maxPieceLen >= 1,
      "unigram-lm hyperparameters must be positive")
    val dict = wordDict(docs, textCol)
    var vocab = Materialize.once(withCosts(seedVocab(dict, seedSize, maxPieceLen)))
    (1 to nIters).foreach { _ =>
      vocab = Materialize.once(emRound(dict, vocab, vocabSize, maxPieceLen))
    }
    (vocab, segmentWords(dict, vocab, maxPieceLen))
  }

  /** Corpus application: per-document token count under the final
    * segmentation — explode words, join the dictionary's n_pieces,
    * re-aggregate. One shuffle on the word key; the segmentation side
    * is vocab-bounded.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  segmented: DataFrame): DataFrame =
    docs.select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("word"))
      .join(segmented.select(col("word"), col("n_pieces")), Seq("word"))
      .groupBy(col(idCol)).agg(sum(col("n_pieces")).as("n_tokens"))

  // ---------------------------------------------------------------
  // DuckDB oracle
  // ---------------------------------------------------------------

  /** floor(2·log2) bit-length twin of [[bitlen2]] (DuckDB's
    * `format('{:b}', 0)` is "0", length 1 — same as Spark's `bin`).
    */
  private def bl2Sql(x: String): String =
    s"CAST(length(format('{:b}', least(CAST($x AS BIGINT), 2147483647) * " +
      s"least(CAST($x AS BIGINT), 2147483647))) AS BIGINT)"

  private def costSql(cnt: String, tot: String): String =
    s"${bl2Sql(tot)} - ${bl2Sql(cnt)} + 1"

  /** One Viterbi pass (CTE suffix `idx`) of every dictionary word
    * against vocab CTE `vsrc`: the EXACT recursive replay of
    * [[segmentWords]] — dp/backpointer lists grown position by
    * position, then a second recursion walking the backpointers into
    * the piece list. Emits seg$idx(word, freq, ps, seg_cost).
    *
    * The recursive step is PURE LIST ARITHMETIC over a cross-joined
    * one-row piece-cost MAP — deliberately no correlated subqueries:
    * DuckDB 1.0 evaluates a correlated scalar subquery inside a
    * recursive CTE NON-DETERMINISTICALLY when the CTE is consumed
    * more than once (the first formulation returned different dp
    * vectors to vtf and walk on the same data), and cannot
    * decorrelate a LEFT JOIN on a correlated column at all. The
    * candidate-cost list indexes the dp prefix and the map only;
    * `list_position` of the list minimum implements the engine's
    * smallest-j tie-break (first index of the minimum = longest final
    * piece).
    */
  private def viterbiSql(idx: Int, vsrc: String, maxPieceLen: Int): String =
    s"""vmap$idx AS MATERIALIZED (
       |  SELECT map(list(piece ORDER BY piece), list(cost ORDER BY piece)) AS m FROM $vsrc),
       |vt$idx AS (
       |  SELECT word, freq, len(word) AS n, 0 AS i,
       |         [CAST(0 AS BIGINT)] AS dp, CAST([] AS INT[]) AS bp
       |  FROM d
       |  UNION ALL
       |  SELECT word, freq, n, i+1,
       |    list_append(dp, list_min(cand)),
       |    list_append(bp, CAST(lo + list_position(cand, list_min(cand)) - 1 AS INT))
       |  FROM (
       |    SELECT vt$idx.*, greatest(i+1-$maxPieceLen, 0) AS lo,
       |      list_transform(range(greatest(i+1-$maxPieceLen, 0), i+1),
       |        j -> dp[j+1] + coalesce(map_extract(m, substring(word, j+1, i+1-j))[1], $INF)) AS cand
       |    FROM vt$idx, vmap$idx WHERE i < n) t),
       |vtf$idx AS MATERIALIZED (SELECT word, freq, n, dp, bp FROM vt$idx WHERE i = n),
       |walk$idx AS (
       |  SELECT word, freq, n, n AS pos, CAST([] AS VARCHAR[]) AS ps FROM vtf$idx
       |  UNION ALL
       |  SELECT w.word, w.freq, w.n, f.bp[w.pos],
       |         list_prepend(substring(w.word, f.bp[w.pos]+1, w.pos-f.bp[w.pos]), w.ps)
       |  FROM walk$idx w JOIN vtf$idx f ON w.word = f.word WHERE w.pos > 0),
       |seg$idx AS MATERIALIZED (
       |  SELECT s.word, s.freq, s.ps, f.dp[s.n+1] AS seg_cost
       |  FROM walk$idx s JOIN vtf$idx f ON s.word = f.word WHERE s.pos = 0)""".stripMargin

  /** One hard-EM round (CTE suffix `r`, consuming vocab v${r-1}):
    * Viterbi pass `r`, freq-weighted usage recount, top-`vocabSize`
    * (cnt desc, piece asc) plus the previous vocab's alphabet at
    * coalesced-zero usage, and fresh costs from the new total.
    */
  private def roundSql(r: Int, vocabSize: Int, maxPieceLen: Int): String =
    s"""${viterbiSql(r, s"v${r - 1}", maxPieceLen)},
       |u$r AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, unnest(ps) AS piece FROM seg$r) GROUP BY piece),
       |v${r}c AS MATERIALIZED (
       |  SELECT piece, max(cnt) AS cnt FROM (
       |    (SELECT piece, cnt FROM u$r ORDER BY cnt DESC, piece LIMIT $vocabSize)
       |    UNION ALL
       |    SELECT s.piece, CAST(coalesce(u.cnt, 0) AS BIGINT) AS cnt
       |    FROM (SELECT piece FROM v${r - 1} WHERE len(piece) = 1) s
       |    LEFT JOIN u$r u USING (piece)
       |  ) GROUP BY piece),
       |t$r AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM v${r}c),
       |v$r AS MATERIALIZED (SELECT piece, cnt, ${costSql("cnt", "t")} AS cost FROM v${r}c, t$r)""".stripMargin

  /** The full learn+apply oracle: seed vocab, `nIters` unrolled EM
    * rounds, and (for the segment/tokens selects) one final Viterbi
    * pass under the learned vocab — the same shape [[Bpe.oracleSql]]
    * uses for its merge loop. `docsSql` supplies the (doc_id, text)
    * source so fixtures can plant richer dictionaries; `select` is
    * one of "vocab" | "segment" | "tokens".
    */
  def oracleSql(docsSql: String, seedSize: Int, maxPieceLen: Int,
                nIters: Int, vocabSize: Int, select: String): String = {
    val finalIdx = nIters + 1
    val rounds = (1 to nIters).map(roundSql(_, vocabSize, maxPieceLen)).mkString(",\n")
    val finalPass =
      if (select == "vocab") "" else s",\n${viterbiSql(finalIdx, s"v$nIters", maxPieceLen)}"
    val out = select match {
      case "vocab" => s"SELECT piece, cnt, cost FROM v$nIters ORDER BY piece"
      case "segment" =>
        s"""SELECT word, freq, array_to_string(ps, ' ') AS seg,
           |  len(ps) AS n_pieces, seg_cost FROM seg$finalIdx ORDER BY word""".stripMargin
      case "tokens" =>
        s"""SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_tokens
           |FROM (SELECT doc_id,
           |        unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
           |      FROM docsrc) o
           |JOIN (SELECT word, len(ps) AS np FROM seg$finalIdx) s ON o.w = s.word
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      case other => throw new IllegalArgumentException(s"unknown select: $other")
    }
    s"""WITH RECURSIVE
       |docsrc AS MATERIALIZED ($docsSql),
       |d AS MATERIALIZED (
       |  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
       |        FROM docsrc) t
       |  GROUP BY w),
       |cand AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT f.freq, substring(f.word, ii.i, ll.l) AS piece
       |    FROM d f,
       |         LATERAL (SELECT unnest(range(1, len(f.word) + 1)) AS i) ii,
       |         LATERAL (SELECT unnest(range(1, least($maxPieceLen, len(f.word) - ii.i + 1) + 1)) AS l) ll
       |  ) GROUP BY piece),
       |v0c AS MATERIALIZED (
       |  SELECT piece, max(cnt) AS cnt FROM (
       |    (SELECT piece, cnt FROM cand ORDER BY cnt DESC, piece LIMIT $seedSize)
       |    UNION ALL
       |    SELECT piece, cnt FROM cand WHERE len(piece) = 1
       |  ) GROUP BY piece),
       |t0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM v0c),
       |v0 AS MATERIALIZED (SELECT piece, cnt, ${costSql("cnt", "t")} AS cost FROM v0c, t0),
       |$rounds$finalPass
       |$out""".stripMargin
  }
}
