package graft.registry

import graft.datapipe.{Boilerplate, Bpe, Classifier, Gopher, Decontam, Dedup, Dsir, DupSpans, FuzzyJoin, GraphRank, Html, IncrementalDedup, Keywords, LmScore, Markdown, Multimodal, Quantize, Retrieval, SemDedup, ShortestPaths, Similarity, TextAnalysis, UnigramLm, Urls, Vocab}
import graft.functions.SubwordTokenize
import graft.tables.TestTables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry: training-data pipeline operators over documents/embeddings.
  * SQL-expressible variants carry DuckDB oracles; the hash-based ones
  * (minhash/simhash/LSH — xxhash64 has no DuckDB twin) are registered
  * rows-only and verified against planted duplicates in ScalaTest.
  */
object QueriesData {

  private def sampledDocs(s: SparkSession, dir: String): DataFrame =
    TestTables.documents(s, dir).filter(col("doc_id") % 10 === 0)

  /** Planted ANN query set: a ×2-scaled twin of every 50th corpus
    * vector. Doubling is an IEEE exponent shift — exact per component —
    * so a twin is an exact positive scalar multiple of its base:
    * cosine(twin, base) = 1.0 exactly and every hyperplane dot product
    * scales without a sign change. Each ANN variant's top-1 answer for
    * twin (base_id + 10M) is therefore PROVABLY (base_id, 1.0), which
    * turns the rows-only entries into planted-answer checks.
    */
  private def twinQueries(emb: DataFrame): DataFrame =
    // Pinned to replica 0 (vacuous at driver SFs): a planted query
    // fixture must not grow with ScaleUp replicas — see the verify
    // skill's ScaleUp-twin gotcha and the q_bm25_topk rationale.
    emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1000000000L)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))

  /** Fixture piece vocab for q_text_subword, rendered into BOTH the
    * Spark query and the DuckDB oracle so the two cannot drift. It is
    * built to make greedy longest-match observable: `custom`+`##er`
    * must beat `cust`+`##omer` (both tile "customer"), `filt`+`##er`
    * beats char-by-char, and `q` is absent from every piece so "query"
    * exercises the whole-word UNK rollback.
    */
  private val subwordVocab: Seq[String] =
    Seq("custom", "cust", "cus", "##er", "##omer", "wind", "##ow", "spark", "tab", "##le",
      "val", "##ue", "str", "##eam", "fast", "filt") ++
      ('a' to 'z').filter(_ != 'q').map(_.toString) ++
      ('a' to 'z').filter(_ != 'q').map(c => s"##$c")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tokenize→pack pipeline: subword piece counts (the real cost
    // measure a sequence packer needs) feed the hash-bucketed packer —
    // tokenization and batch construction in ONE plan.
    "q_pipeline_tokenize" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val pieces = TestTables.documents(s, dir)
        .select(col("doc_id"), SubwordTokenize.of(ws, subwordVocab).as("pieces"))
      graft.datapipe.Sampling.packSequences(pieces, col("doc_id"), size(col("pieces")),
          budget = 256L, buckets = 8, salt = "tokpack")
        .withColumnRenamed("key", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // End-to-end curriculum pipeline: classifier gate → global score
    // ranks → decile tiers → per-tier epoch schedule (top deciles ×2,
    // middle ×1, bottom hash-halved) — the serving-set construction a
    // quality-curriculum trainer runs, in ONE deterministic plan.
    "q_pipeline_curriculum" -> ((s, dir) => {
      import graft.ops.GlobalIndex
      import graft.datapipe.Sampling
      val kept = Classifier.scoreDocs(TestTables.documents(s, dir), "doc_id", "text",
          Classifier.syntheticWeights(64), salt = "cls0")
        .filter(col("keep")).select(col("doc_id"), col("score"))
      val n = kept.agg(count(lit(1)).as("__n"))
      val tiered = GlobalIndex.withGlobalIndex(kept, Seq(col("score"), col("doc_id")), "rank")
        .crossJoin(broadcast(n))
        .withColumn("decile", expr("(rank * 10) div __n"))
      tiered.select(col("doc_id"), col("score"), col("decile"),
          explode(
            when(col("decile") >= 8, array(lit(0L), lit(1L)))
              .when(col("decile") >= 4, array(lit(0L)))
              .when(Sampling.hashHex(col("doc_id"), "cur") < lit(Sampling.hexThreshold(0.5)),
                array(lit(0L)))
              .otherwise(array().cast("array<bigint>"))).as("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    }),

    // Score normalization for curriculum/filter decisions: classifier
    // scores → exact global ranks (scalable GlobalIndex, no global
    // window) → integer percentile (basis points) and equal-frequency
    // decile. All floor-integer arithmetic on non-negative ranks.
    "q_score_ranks" -> ((s, dir) => {
      import graft.ops.GlobalIndex
      val scored = Classifier.scoreDocs(TestTables.documents(s, dir), "doc_id", "text",
        Classifier.syntheticWeights(64), salt = "cls0")
        .select(col("doc_id"), col("score"))
      val n = scored.agg(count(lit(1)).as("__n"))
      GlobalIndex.withGlobalIndex(scored, Seq(col("score"), col("doc_id")), "rank")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("score"), col("rank"),
          expr("(rank * 10000) div (__n - 1)").as("pct_bp"),
          expr("(rank * 10) div __n").as("decile"))
        .orderBy(col("doc_id"))
    }),

    // Contrastive negative sampling: 4 deterministic hash-stream draws
    // per anchor (with replacement), excluding self and exact-dup
    // twins — the planted duplicates in the corpus make the exclusion
    // path load-bearing. The oracle replays draws, exclusions, and
    // draw-order ranking exactly.
    "q_negative_sample" -> ((s, dir) =>
      graft.datapipe.NegativeSampling.sample(
          TestTables.documents(s, dir), "doc_id", "text", k = 4, salt = "neg0")
        .orderBy(col("anchor"), col("neg_rank"))),

    // Audio transcode on the real WAV codec: decode → 2:1 block-mean
    // downsample → 81/2 gain with PCM16 saturation → re-encode at
    // 4 kHz → decode again for features. The oracle recomputes the
    // whole chain from the closed-form sample definition: floor-exact
    // integer DSP means a single saturation or rounding drift anywhere
    // in decode/process/encode/decode fails the hash.
    "q_mm_wav_transcode" -> ((s, dir) => {
      val wav = Multimodal.synthWav(TestTables.documents(s, dir), "doc_id")
      Multimodal.decodeWavFeatures(
          Multimodal.transcodeWav(wav, factor = 2, gNum = 81, gDen = 2))
        .orderBy(col("media_id"))
    }),

    // Video transcode on the real AVI codec: keep every 2nd frame,
    // halve fps, re-encode, re-extract. The frame-order-weighted
    // feature makes dropped-vs-kept frame identity load-bearing.
    "q_mm_avi_transcode" -> ((s, dir) => {
      val avi = Multimodal.synthAvi(TestTables.documents(s, dir), "doc_id")
      Multimodal.decodeAviFeatures(Multimodal.transcodeAvi(avi, keepEveryNth = 2))
        .orderBy(col("media_id"))
    }),

    // Image resize on the real BMP codec: decode → 4×4 nearest-
    // neighbor downscale → re-encode → decode for features. The
    // oracle recomputes every destination pixel closed-form through
    // the integer source-index map — a row-flip, padding, channel, or
    // index bug anywhere in the chain fails the hash.
    "q_mm_bmp_resize" -> ((s, dir) => {
      val bmp = Multimodal.synthBmp(TestTables.documents(s, dir), "doc_id")
      Multimodal.decodeBmpFeatures(Multimodal.resizeBmp(bmp, dstW = 4, dstH = 4))
        .orderBy(col("media_id"))
    }),

    // Record-linkage resolution: fuzzy candidate sets collapse to ONE
    // canonical match per probe (min distance, then min key — fully
    // deterministic). The fixture deletes each customer name's LAST
    // char, so every probe ties at distance 1 against its whole
    // ten-key decade and the resolver's tie-break is load-bearing.
    "q_linkage_resolve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cust = TestTables.customer(s, dir)
      val probe = cust.filter(col("c_custkey") <= 300)
        .select(col("c_custkey").as("probe_key"),
          col("c_name").substr(lit(1), length(col("c_name")) - 1).as("typo"))
      val cand = FuzzyJoin.editDistanceJoin(probe, "probe_key", "typo",
        cust.select(col("c_custkey").as("match_key"), col("c_name")), "match_key", "c_name",
        maxDist = 1)
      val w = Window.partitionBy(col("probe_key")).orderBy(col("dist"), col("match_key"))
      cand.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("probe_key"), col("typo"), col("match_key").as("resolved_key"),
          col("c_name").as("resolved_name"), col("dist"))
        .orderBy(col("probe_key"))
    }),

    // Asymmetric containment dedup: each sampled doc gets a planted
    // 200-char-prefix twin (its shingle set is a near-subset — the
    // short-in-long duplication symmetric Jaccard under-scores), and
    // pairs pass on an exact integer cross-multiplication ≥ 4/5 in
    // either direction.
    "q_dedup_containment" -> ((s, dir) => {
      val base = sampledDocs(s, dir).select(col("doc_id"), col("text"))
      val prefixes = base.select((col("doc_id") + 10000000L).as("doc_id"),
        col("text").substr(lit(1), lit(200)).as("text"))
      Dedup.containmentPairs(base.unionByName(prefixes), "doc_id", "text",
          minNum = 4, minDen = 5, maxDf = 1000, shingle = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Gopher quality rules (Rae 2021 A1.1) over a fixture that forces
    // every rule both ways: bullets-only docs, sub-minimum word counts,
    // short-word and numeric word-soups, symbol/ellipsis injections,
    // stop-word presence varying by doc id. All-integer verdicts; the
    // oracle replays each count and comparison exactly.
    "q_gopher_rules" -> ((s, dir) => {
      val d = col("doc_id")
      val fixture =
        when(d % 13 === 0, lit("- alpha beta\n- gamma delta\n- epsilon zeta"))
          .when(d % 13 === 1, lit("a aa b bb c cc d dd e ee"))
          .when(d % 13 === 2, lit("1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 the of"))
          .otherwise(concat(
            when(d % 3 === 0, lit("# # # # #\n")).otherwise(lit("")),
            when(d % 7 === 0, lit("trailing thought...\nanother one…\n")).otherwise(lit("")),
            when(d % 11 =!= 0, lit("the story goes that we have to be of and with them\n")).otherwise(lit("")),
            when(d % 2 === 0, col("text")).otherwise(col("text").substr(lit(1), lit(120)))))
      TestTables.documents(s, dir)
        .select(d, graft.datapipe.Gopher.rules(fixture, Gopher.Config(minWords = 50)).as("g"))
        .select(col("doc_id"), col("g.*"))
        .orderBy(col("doc_id"))
    }),

    // Unicode NFC canonicalization ahead of dedup hashing: a fixture
    // suffix mixes combining sequences (e+ACUTE, A+RING), precomposed
    // é, and Hangul jamo; engine (java.text.Normalizer) and oracle
    // (DuckDB utf8proc) must compose byte-identically per UAX #15.
    "q_text_nfc" -> ((s, dir) => {
      import graft.functions.NfcNormalize
      val raw = concat(col("text").substr(lit(1), lit(16)),
        lit(" e\u0301 \u00e9 A\u030A \u1100\u1161")) // e+ACUTE, precomposed, A+RING, jamo
      TestTables.documents(s, dir)
        .select(col("doc_id"), length(raw).cast("long").as("raw_len"),
          NfcNormalize.of(raw).as("norm"))
        .withColumn("norm_len", length(col("norm")).cast("long"))
        .orderBy(col("doc_id"))
    }),

    // Hashed-feature linear classifier inference (the VW/fastText-style
    // corpus quality gate): token → md5-prefix bucket → literal weight
    // vector, summed per doc as a pure Column fold — zero shuffle, all
    // integer. The oracle replays bucket hash + fold exactly; weights
    // render into both sides from the same generator.
    "q_quality_classifier" -> ((s, dir) =>
      Classifier.scoreDocs(TestTables.documents(s, dir), "doc_id", "text",
          Classifier.syntheticWeights(64), salt = "cls0", threshold = 0L)
        .orderBy(col("doc_id"))),

    // TRAINING that classifier in-engine: integer-quantized logistic
    // regression (hard sigmoid on a 4096-level grid, floorDiv batch
    // steps) over a planted corpus — each doc carries its class marker
    // three times, labels from doc parity. Six fixed iterations; the
    // oracle unrolls the SAME six as chained CTEs (margin aggregate →
    // integer sigmoid → bucket-grouped gradient → floorDiv step), so a
    // drift in hashing, quantization, or the update rule fails the
    // hash. ClassifierSpec asserts the trained vector perfectly
    // separates the planted classes.
    "q_classifier_train" -> ((s, dir) => {
      val marked = TestTables.documents(s, dir).select(
        col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          when(col("doc_id") % 2 === 0, lit(" qualgood qualgood qualgood"))
            .otherwise(lit(" qualbad qualbad qualbad"))).as("text"),
        (col("doc_id") % 2 === 0).cast("long").as("y"))
      val w = Classifier.train(marked, "text", col("y"), dim = 64, salt = "clstr", iters = 6)
      Classifier.weightsDf(s, w).orderBy(col("bucket"))
    }),

    // The full quality-gate loop, end-to-end: train on the planted
    // corpus, then gate the REAL (un-marked) documents with the
    // learned vector — keep/drop per doc. The oracle chains the
    // training replay into the scoring replay, joining tokens against
    // the LEARNED weight CTE rather than a rendered literal, so the
    // whole train→gate path is one hash-compared statement.
    "q_classifier_train_gate" -> ((s, dir) => {
      val marked = TestTables.documents(s, dir).select(
        col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          when(col("doc_id") % 2 === 0, lit(" qualgood qualgood qualgood"))
            .otherwise(lit(" qualbad qualbad qualbad"))).as("text"),
        (col("doc_id") % 2 === 0).cast("long").as("y"))
      val w = Classifier.train(marked, "text", col("y"), dim = 64, salt = "clstr", iters = 6)
      Classifier.scoreDocs(TestTables.documents(s, dir), "doc_id", "text",
          w, salt = "clstr", threshold = 0L)
        .orderBy(col("doc_id"))
    }),

    // BPE merge learning on the word-frequency dict (vocab-bounded,
    // never corpus-bounded): 10 heaviest-pair merges with a full
    // deterministic tie-break. The oracle unrolls the SAME 10
    // iterations as chained CTEs (weighted pair count → LIMIT-1
    // arg-max → padded-string replace) — a drift in counting,
    // selection, or greedy application fails the hash.
    "q_bpe_learn" -> ((s, dir) => {
      val (merges, _) = Bpe.learn(TestTables.documents(s, dir), "text", nMerges = 10)
      Bpe.mergesDf(s, merges).orderBy(col("step"))
    }),

    // The final symbolization of every distinct word after those 10
    // merges — the dictionary SubwordTokenize would be trained from.
    "q_bpe_apply" -> ((s, dir) => {
      val (_, dict) = Bpe.learn(TestTables.documents(s, dir), "text", nMerges = 10)
      dict.orderBy(col("word"))
    }),

    // Unigram-LM tokenizer (SentencePiece-style hard-EM, integer
    // half-log2 costs — UnigramLm scaladoc). The synthetic corpus has
    // only 31 distinct words, too thin to exercise segmentation, so
    // the fixture plants fused-bigram COMPOUND words (both sides
    // replay the plant) — the learned vocab should rediscover the
    // constituent words and the Viterbi pass split the compounds back
    // apart. Three faces: the learned vocab, the per-word
    // segmentation, the per-doc token counts.
    "q_unigram_vocab" -> ((s, dir) => {
      val (vocab, _) = UnigramLm.learn(unigramDocs(s, dir), "text",
        seedSize = 200, maxPieceLen = 8, nIters = 2, vocabSize = 100)
      vocab.orderBy(col("piece"))
    }),
    "q_unigram_segment" -> ((s, dir) => {
      val (_, seg) = UnigramLm.learn(unigramDocs(s, dir), "text",
        seedSize = 200, maxPieceLen = 8, nIters = 2, vocabSize = 100)
      seg.orderBy(col("word"))
    }),
    "q_unigram_tokens" -> ((s, dir) => {
      val docs = unigramDocs(s, dir)
      val (_, seg) = UnigramLm.learn(docs, "text",
        seedSize = 200, maxPieceLen = 8, nIters = 2, vocabSize = 100)
      UnigramLm.tokenCounts(docs, "doc_id", "text", seg).orderBy(col("doc_id"))
    }),

    // Greedy longest-match subword tokenization (WordPiece MaxMatch)
    // over every document, as one codegen'd expression: per doc emits
    // word/piece/UNK counts plus the full piece sequence. The oracle
    // re-derives the tokenization independently with a recursive CTE
    // over the DISTINCT words (greedy step = lateral longest-match),
    // then reassembles per-doc sequences by joining words back in
    // position order — engine and oracle share only the vocab.
    "q_text_subword" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      TestTables.documents(s, dir)
        .select(col("doc_id"),
          size(filter(ws, w => w =!= lit(""))).cast("long").as("n_words"),
          SubwordTokenize.of(ws, subwordVocab).as("pieces"))
        .filter(col("n_words") > 0)
        .select(col("doc_id"), col("n_words"),
          size(col("pieces")).cast("long").as("n_pieces"),
          size(filter(col("pieces"), p => p === lit("[UNK]"))).cast("long").as("n_unk"),
          concat_ws(" ", col("pieces")).as("piece_text"))
        .orderBy(col("doc_id"))
    }),

    // Crawl-graph centrality: a deterministic synthetic link graph —
    // doc d emits 1 + d % 3 edges, dst = (d*31 + 97k) % N — ranked by
    // 10 iterations of integer-quantized PageRank. Out-degree varies
    // per node, so in-degrees (and the fixed point) are genuinely
    // non-uniform: a flat answer fails the hash. The oracle unrolls
    // the SAME 10 iterations as chained CTEs — every node's score
    // must agree as an exact long.
    "q_graph_pagerank" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val edges = docs.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("__n"),
          explode(sequence(lit(1), (lit(1) + col("doc_id") % 3).cast("int"))).as("k"))
        .select(col("src"), ((col("src") * 31 + col("k") * 97) % col("__n")).as("dst"))
      GraphRank.pageRank(docs, "doc_id", edges, "src", "dst", iters = 10)
        .orderBy(col("node"))
    }),

    // The SAME ranking computed the way a 100 TB graph would run it:
    // the edge table — the side that can neither broadcast nor afford
    // a per-iteration re-shuffle — is persisted bucketed+sorted on
    // src first (sink/Bucketing), so every iteration's edge join and
    // the degree aggregate plan NO exchange on the edge side; only the
    // small score table moves. The merge hint pins the join strategy
    // the big side would get anyway (at test SF Spark would broadcast
    // the tiny edges and never exercise the layout). Scores are
    // bit-identical to q_graph_pagerank — same oracle; PlanShapeSpec
    // pins the exchange reduction.
    "q_graph_pagerank_bucketed" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val edges = docs.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("__n"),
          explode(sequence(lit(1), (lit(1) + col("doc_id") % 3).cast("int"))).as("k"))
        .select(col("src"), ((col("src") * 31 + col("k") * 97) % col("__n")).as("dst"))
      val path = graft.util.TempDirs.scratch("graft_pr_edges")
      graft.sink.Bucketing.writeBucketed(edges, "graft_pr_edges_bkt", s"$path/e", Seq("src"), 8, Seq("src"))
      val bucketed = graft.sink.Bucketing.table(s, "graft_pr_edges_bkt").hint("merge")
      GraphRank.pageRank(docs, "doc_id", bucketed, "src", "dst", iters = 10)
        .orderBy(col("node"))
    }),

    // Classifier evaluation: the language-ID confusion matrix against
    // the labeled lang column — per (actual, predicted) counts, the
    // precision/recall raw material as exact integers.
    "q_langid_confusion" -> ((s, dir) =>
      TestTables.documents(s, dir)
        .select(col("lang").as("actual"),
          TextAnalysis.langId(col("text")).as("predicted"))
        .groupBy(col("actual"), col("predicted")).agg(count(lit(1)).as("n"))
        .orderBy(col("actual"), col("predicted"))),

    // Degree profile of the link graph: per-node out/in degrees and
    // the corpus-level degree histogram in one output (node rows +
    // histogram rows tagged by kind) — the first diagnostic run on any
    // crawl graph.
    "q_graph_degrees" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val edges = docs.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("__n"),
          explode(sequence(lit(1), (lit(1) + col("doc_id") % 3).cast("int"))).as("k"))
        .select(col("src"), ((col("src") * 31 + col("k") * 97) % col("__n")).as("dst"))
      val outD = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      val inD = edges.groupBy(col("dst").as("node")).agg(count(lit(1)).as("deg"))
      outD.withColumn("kind", lit("out"))
        .unionByName(inD.withColumn("kind", lit("in")))
        .groupBy(col("kind"), col("deg")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("kind"), col("deg"))
    }),

    // Domain-centroid similarity matrix: per-group mean-direction
    // vectors summed as QUANTIZED integers (floor(x·2^20) per
    // component — no IEEE accumulation order anywhere), pairwise dot
    // and norms as exact longs; cosine derived once per pair from the
    // integer pieces. The corpus-level "how close are my sources'
    // embedding distributions" diagnostic.
    "q_centroid_similarity" -> ((s, dir) => {
      val comp = TestTables.embeddings(s, dir)
        .select((col("vec_id") % 4).as("grp"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("grp"), col("dim"))
        .agg(sum(floor(col("x").cast("double") * lit(1048576.0)).cast("long")).as("q"))
      val norms = comp.groupBy(col("grp")).agg(sum(col("q") * col("q")).as("norm_q"))
      val dots = comp.as("a").join(comp.as("b"),
          col("a.dim") === col("b.dim") && col("a.grp") < col("b.grp"))
        .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
        .agg(sum(col("a.q") * col("b.q")).as("dot_q"))
      dots
        .join(norms.select(col("grp").as("grp_a"), col("norm_q").as("norm_a")), Seq("grp_a"))
        .join(norms.select(col("grp").as("grp_b"), col("norm_q").as("norm_b")), Seq("grp_b"))
        .withColumn("cosine", col("dot_q").cast("double") /
          (sqrt(col("norm_a").cast("double")) * sqrt(col("norm_b").cast("double"))))
        .select(col("grp_a"), col("grp_b"), col("dot_q"), col("norm_a"), col("norm_b"), col("cosine"))
        .orderBy(col("grp_a"), col("grp_b"))
    }),

    // K-hop reachability on the same synthetic link graph as PageRank:
    // distinct nodes reachable within 3 hops per source (self included
    // only when a cycle returns). Three frontier equi-joins with
    // per-stage distincts — never a transitive-closure blowup; the
    // oracle unrolls the identical three joins.
    "q_graph_khop" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val e1 = docs.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("__n"),
          explode(sequence(lit(1), (lit(1) + col("doc_id") % 3).cast("int"))).as("k"))
        .select(col("src"), ((col("src") * 31 + col("k") * 97) % col("__n")).as("dst"))
        .distinct()
      val e2 = e1.as("a").join(e1.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst")).distinct()
      val e3 = e2.as("a").join(e1.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst")).distinct()
      e1.unionByName(e2).unionByName(e3).distinct()
        .groupBy(col("src")).agg(count(lit(1)).as("n_reachable"))
        .orderBy(col("src"))
    }),

    // Multi-source weighted shortest paths (Bellman–Ford, 4 relaxation
    // rounds) on the SAME irregular link graph as PageRank, weights
    // 1 + (src + dst) % 7 so parallel paths genuinely compete. Seeds
    // are every 50th doc; output is every reached node's exact long
    // distance. The oracle unrolls the identical 4 rounds as chained
    // CTEs — a drift in the relax/min fold or the round count fails
    // the hash.
    "q_graph_sssp" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("__n"))
      // The DERIVED edge fixture materializes once — every relaxation
      // round re-references `edges`, and without this the whole
      // crossJoin+explode subtree (and its documents scan) clones into
      // all 4 rounds' plans. A real deployment reads edges from their
      // (bucketed-by-src) storage instead — that layout lever is the
      // same as PageRank's; see the bucketed headline twin there.
      val edges = graft.util.Materialize.once(docs.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("__n"),
          explode(sequence(lit(1), (lit(1) + col("doc_id") % 3).cast("int"))).as("k"))
        .select(col("src"), ((col("src") * 31 + col("k") * 97) % col("__n")).as("dst"))
        .withColumn("w", lit(1L) + (col("src") + col("dst")) % 7))
      val sources = docs.filter(col("doc_id") % 50 === 0)
      ShortestPaths.distances(sources, "doc_id", edges, "src", "dst", "w", iters = 4)
        .orderBy(col("node"))
    }),

    // Dictionary blocklist scan (the C4/Gopher word-list gate): one
    // Aho–Corasick pass per document reports which flagged terms occur
    // (sorted, distinct) — where k LIKE predicates would scan every
    // byte k times. The oracle is the obvious k-probe form (list_filter
    // over contains()): the automaton must agree with it exactly,
    // including overlapping terms ("lo"/"lorem") and term-inside-term.
    "q_text_dict_match" -> ((s, dir) => {
      val dict = Seq("the", "and", "data", "system", "error", "lo", "lorem",
        "or", "qual", "ipsum dolor")
      val txt = lower(coalesce(col("text"), lit("")))
      TestTables.documents(s, dir)
        .select(col("doc_id"),
          array_join(graft.functions.DictMatch.of(txt, dict), ",").as("matched"),
          size(graft.functions.DictMatch.of(txt, dict)).as("n_matched"))
        .orderBy(col("doc_id"))
    }),

    // Markdown -> text extraction: a deterministic markdown wrapper
    // around each document (headers/bold/italics/quote/list/link/
    // fence/hr), stripped by the ordered regex chain. The oracle is
    // GENERATED from the same pattern list (Markdown.toTextSql), so
    // the engines cannot drift silently.
    "q_text_markdown" -> ((s, dir) => {
      val md = concat(
        lit("# Doc "), col("doc_id"), lit("\n\n**"), col("lang"),
        lit("** and *"), col("source"), lit("*\n\n> a quote\n\n- item [link](http://ex.com/"),
        col("doc_id"), lit(")\n\n```\ncode body\n```\n\n---\n\n"), col("text"))
      TestTables.documents(s, dir)
        .select(col("doc_id"), Markdown.toText(md).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // Per-node triangle counts on a deterministic graph that GUARANTEES
    // triangles (ring edges d->d+1, d->d+2 close a triangle at every
    // node) plus irregular hash edges so counts vary. The engine runs
    // the degree-oriented enumeration; the oracle brute-enumerates
    // a<b<c triangles — orientation must change nothing.
    "q_graph_triangles" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val raw = docs.crossJoin(broadcast(n)).select(
        col("doc_id").as("s"),
        explode(array((col("doc_id") + 1) % col("__n"), (col("doc_id") + 2) % col("__n"),
          (col("doc_id") * 31 + 97) % col("__n"))).as("d"))
      val tri = GraphRank.triangleCounts(raw, "s", "d")
      docs.join(tri, docs("doc_id") === tri("node"), "left")
        .select(col("doc_id").as("node"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
        .orderBy(col("node"))
    }),

    // Fuzzy (edit-distance <= 1) join: a deterministic typo of each of
    // the first 200 part names (8th char deleted) matched back against
    // the whole part table via the SymSpell deletion-neighborhood
    // candidate join + exact levenshtein verify. The oracle is the
    // brute-force cross join with the same levenshtein predicate —
    // the candidate scheme must lose nothing and add nothing.
    "q_fuzzy_join" -> ((s, dir) => {
      val part = TestTables.part(s, dir)
      val probe = part.filter(col("p_partkey") <= 200)
        .select(col("p_partkey").as("probe_key"),
          concat(col("p_name").substr(lit(1), lit(7)),
            col("p_name").substr(lit(9), length(col("p_name")))).as("typo"))
      val corpus = part.select(col("p_partkey").as("match_key"), col("p_name"))
      FuzzyJoin.editDistanceJoin(probe, "probe_key", "typo",
          corpus, "match_key", "p_name", maxDist = 1)
        .orderBy(col("probe_key"), col("match_key"))
    }),

    // Exact dedup: canonical-hash groups, deterministic survivor.
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(TestTables.documents(s, dir), "doc_id", "text")
        .orderBy(col("fp"))),

    // N-gram (word-set) Jaccard near-dup pairs via inverted index.
    "q_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(sampledDocs(s, dir), "doc_id", "text", minJaccard = 0.5, maxDf = 1000)
        .orderBy(col("doc_a"), col("doc_b"))),

    // MinHash-LSH near-dup pairs (rows-only: banded xxhash64 buckets).
    // Capped at 64: this is the BENCHED query, and an uncapped pairs
    // enumeration is quadratic in duplicate-cluster size (68× blowup on
    // a 10×-replicated corpus).
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(sampledDocs(s, dir), "doc_id", "text", minJaccard = 0.5,
          maxBucket = 64)
        .orderBy(col("doc_a"), col("doc_b"))),

    // Shingled (order-sensitive) MinHash variant — Broder resemblance
    // over word 3-grams. The synthetic corpus's near-dups are
    // word-order-scrambled, which shingling correctly rejects, so this
    // query plants a deterministic last-word-truncated twin of every
    // sampled doc: the output is exactly those planted high-resemblance
    // pairs (rows-only; order-sensitivity proven in DataPipeSpec).
    "q_dedup_minhash_shingled" -> ((s, dir) => {
      val docs = sampledDocs(s, dir).select(col("doc_id"), col("text"))
      val ws = split(col("text"), "\\s+")
      val truncated = docs.select((col("doc_id") + lit(10000000L)).as("doc_id"),
        array_join(slice(ws, lit(1), size(ws) - 1), " ").as("text"))
      Dedup.minhashPairs(docs.unionByName(truncated), "doc_id", "text",
          minJaccard = 0.5, shingle = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // The portable md5 twin of the shingled variant: the SAME planted
    // last-word-truncated fixture through the SAME banded machinery,
    // with the hash family swapped to md5 prefixes so DuckDB can
    // recompute every signature, band key, candidate pair, and
    // shingle-set Jaccard in SQL — the full-oracle evidence for
    // shingle mode (the xxhash64 entry above stays a production
    // path). Capped at 10 like every benched pair enumerator: replica
    // copies share most shingle band keys (the per-copy text suffix
    // only perturbs trailing shingles), giving ~20-member buckets at
    // 10 copies — the cap must sit BELOW that density for the star
    // fallback to engage (24 sat just above it and the verification
    // join stayed quadratic); the oracle replays the same star rule.
    "q_dedup_minhash_shingled_md5" -> ((s, dir) => {
      val docs = sampledDocs(s, dir).select(col("doc_id"), col("text"))
      val ws = split(col("text"), "\\s+")
      val truncated = docs.select((col("doc_id") + lit(10000000L)).as("doc_id"),
        array_join(slice(ws, lit(1), size(ws) - 1), " ").as("text"))
      Dedup.minhashPairs(docs.unionByName(truncated), "doc_id", "text",
          minJaccard = 0.5, shingle = 3, portable = true, maxBucket = 10)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Flagship training-data prep: language gate -> quality gate ->
    // exact dedup -> MinHash near-dup removal, fully oracle-checked.
    //
    // MEASURED DEAD END (r11): staging this result to disk before the
    // verify ORDER BY is 19% SLOWER at the 100x replica (67.1 -> 79.7 s
    // median, bench_ab_stage_sort_r11.json). The range sampler's
    // second job REUSES the first job's shuffle map outputs, so it
    // never re-runs the signature/banding work behind the band
    // exchange — the re-executed "double compute" is only the narrow
    // anti-join tail, which is cheaper than a corpus-sized DISK_ONLY
    // write. Stage-before-sort pays only when the sort child's narrow
    // tail above the last exchange/materialization is itself expensive
    // (resubmission's broadcast 5-BU fan-out, predictions' triple-
    // window gate table).
    "q_pipeline_corpus" -> ((s, dir) =>
      graft.datapipe.CorpusClean.clean(TestTables.documents(s, dir), "doc_id", "text",
          minQuality = 1.1, minJaccard = 0.8, portableHash = true)
        .select(col("doc_id"), col("lang"), col("lang_detected"), col("quality"))
        .orderBy(col("doc_id"))),

    // Connected-components survivor variant: each component of the
    // verified near-dup graph keeps exactly its minimum id (transitive
    // closure — the standard pretraining-pipeline rule). Oracle is the
    // same DuckDB chain with a recursive-CTE closure for the drop set.
    "q_pipeline_corpus_cc" -> ((s, dir) =>
      graft.datapipe.CorpusClean.cleanCC(TestTables.documents(s, dir), "doc_id", "text",
          minQuality = 1.1, minJaccard = 0.8, portableHash = true)
        .select(col("doc_id"), col("lang"), col("lang_detected"), col("quality"))
        .orderBy(col("doc_id"))),

    // MinHash-LSH with the portable md5 hash family — the full banding
    // pipeline under a value-level DuckDB oracle.
    "q_dedup_minhash_md5" -> ((s, dir) =>
      Dedup.minhashPairs(sampledDocs(s, dir), "doc_id", "text", minJaccard = 0.5, portable = true)
        .orderBy(col("doc_a"), col("doc_b"))),

    // Incremental batch-vs-corpus dedup (portable md5 family, full
    // oracle): the %20==10 docs arrive as a new batch against the
    // %20==0 corpus's band index; output is the per-new-doc drop
    // decision with its matched representative.
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      val corpus = docs.filter(col("doc_id") % 20 === 0)
      val batch = docs.filter(col("doc_id") % 20 === 10)
      val corpusBands = Dedup.minhashBands(corpus, "doc_id", "text", portable = true)
      IncrementalDedup.matchesAgainst(batch, "doc_id", "text", corpusBands, corpus,
          minJaccard = 0.5, maxBucket = 10, portable = true)
        .orderBy(col("new_doc"))
    }),

    // The CAPPED pairs path under the same value-level oracle: cap 20
    // is below the sf0.01 max bucket (28), so oversized-bucket star
    // verification is genuinely exercised by the driver compare.
    "q_dedup_minhash_md5_capped" -> ((s, dir) =>
      Dedup.minhashPairs(sampledDocs(s, dir), "doc_id", "text", minJaccard = 0.5,
          portable = true, maxBucket = 20)
        .orderBy(col("doc_a"), col("doc_b"))),

    // SimHash near-dup pairs (rows-only). maxHamming = 10 → 11 sketch
    // chunks, so every pair within distance 10 shares a chunk
    // (pigeonhole recall guarantee); bucket cap 64 bounds the candidate
    // join against hot chunks (chunk keys are only ~6 bits here).
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(sampledDocs(s, dir), "doc_id", "text", maxHamming = 10,
          maxBucket = 64)
        .orderBy(col("doc_a"), col("doc_b"))),

    // The portable-hash SimHash twin with PLANTED one-word-appended
    // near-dups: full oracle recomputes every 63-bit sketch from md5
    // prefixes in SQL, brute-forces all pairs, and must agree with
    // the pigeonhole-chunk candidate scheme exactly (no cap → the
    // scheme provably loses nothing within the Hamming radius).
    "q_dedup_simhash_md5" -> ((s, dir) => {
      val base = sampledDocs(s, dir).select(col("doc_id"), col("text"))
      val twins = base.select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text"))
      Dedup.simhashPairsMd5(base.unionByName(twins), "doc_id", "text", maxHamming = 10)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Text analysis: token counts, punctuation, stopwords, quality.
    "q_text_stats" -> ((s, dir) =>
      TestTables.documents(s, dir).select(
          col("doc_id"),
          TextAnalysis.tokenCountWs(col("text")).as("n_tokens_ws"),
          TextAnalysis.tokenCountBpeish(col("text")).as("n_tokens_bpe"),
          TextAnalysis.punctCount(col("text")).as("n_punct"),
          TextAnalysis.stopwordCount(col("text")).as("n_stopwords"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    // Marker-based language ID.
    "q_text_langid" -> ((s, dir) =>
      TestTables.documents(s, dir).select(
          col("doc_id"), col("lang").as("lang_labeled"),
          TextAnalysis.langId(col("text")).as("lang_detected"))
        .orderBy(col("doc_id"))),

    // Intra-document repetition metrics (Gopher-style quality
    // filters): duplicate-word fraction, duplicate-trigram fraction,
    // and the share of the single most frequent trigram — all pure
    // Column folds, no explode/shuffle.
    "q_text_repetition" -> ((s, dir) =>
      TestTables.documents(s, dir).select(
          col("doc_id"),
          size(TextAnalysis.words(col("text"))).as("n_words"),
          TextAnalysis.dupWordFraction(col("text")).as("dup_word_frac"),
          TextAnalysis.dupShingleFraction(col("text"), 3).as("dup_trigram_frac"),
          TextAnalysis.topShingleFraction(col("text"), 3).as("top_trigram_frac"))
        .orderBy(col("doc_id"))),

    // PII redaction over planted emails/phones (the synthetic corpus
    // has none, so both engines append a deterministic contact line —
    // the redaction itself is what's under test).
    "q_text_redact" -> ((s, dir) => {
      val planted = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com or 555-123-4567 now"))
      TestTables.documents(s, dir).select(
          col("doc_id"),
          regexp_count(planted, lit(TextAnalysis.emailPattern)).as("n_emails"),
          regexp_count(planted, lit(TextAnalysis.phonePattern)).as("n_phones"),
          TextAnalysis.redactPii(planted).as("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // Validated PII over a planted line carrying every family: a
    // dotted quad whose last octet sometimes exceeds 255 (~15% of
    // docs — exercising octet validation), a 16-digit card that is
    // Luhn-VALID on even doc_ids and Luhn-INVALID on odd ones
    // (exercising the checksum), plus the email/phone pair. Candidate
    // counts vs validated counts per document.
    "q_text_pii_stats" -> ((s, dir) => {
      val planted = piiPlanted
      val ipc = TextAnalysis.candidates(planted, TextAnalysis.ipv4Pattern)
      val ccc = TextAnalysis.candidates(planted, TextAnalysis.ccCandidatePattern)
      TestTables.documents(s, dir).select(
          col("doc_id"),
          regexp_count(planted, lit(TextAnalysis.emailPattern)).as("n_emails"),
          regexp_count(planted, lit(TextAnalysis.phonePattern)).as("n_phones"),
          size(ipc).as("n_ip_candidates"),
          size(filter(ipc, c => TextAnalysis.validIpv4(c))).as("n_ip_valid"),
          size(ccc).as("n_cc_candidates"),
          size(filter(ccc, c => TextAnalysis.luhnValid(c))).as("n_cc_valid"))
        .orderBy(col("doc_id"))
    }),

    // Validated redaction: Luhn-valid cards and range-valid IPs are
    // fold-replaced, invalid ones survive verbatim (an invalid
    // candidate is by definition NOT the PII the tag claims), then the
    // email/phone regexp pair runs — redactPiiStrict's fixed order.
    "q_text_pii_redact" -> ((s, dir) =>
      TestTables.documents(s, dir).select(
          col("doc_id"),
          TextAnalysis.redactPiiStrict(piiPlanted).as("clean_text"))
        .orderBy(col("doc_id"))),

    // Corpus-frequency boilerplate removal (line-level dedup): the
    // synthetic docs are single-line, so both engines plant the same
    // template chrome — a header on every 3rd doc, a footer on every
    // 2nd, and a rare promo line on every 97th (below the 25% document-
    // frequency threshold, so it must SURVIVE). The operator strips the
    // header/footer from every doc and keeps body + promo in order.
    "q_text_boilerplate" -> ((s, dir) => {
      val planted = TestTables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n",
          when(col("doc_id") % 3 === 0, "== corpus header =="),
          col("text"),
          when(col("doc_id") % 2 === 0, "(c) 2026 corpus footer"),
          when(col("doc_id") % 97 === 0, "limited time offer - subscribe now")).as("text"))
      Boilerplate.strip(planted, "doc_id", "text", minDocFrac = 0.25)
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination: corpus docs (doc_id % 25 != 7) scored
    // by trigram overlap against the benchmark slice (doc_id % 25 = 7).
    "q_decontaminate" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      Decontam.overlapReport(
          docs.filter(col("doc_id") % 25 =!= 7), "doc_id", "text",
          docs.filter(col("doc_id") % 25 === 7), "text",
          n = 3, minOverlap = 0.15)
        .orderBy(col("doc"))
    }),

    // Corpus-health report: per (source, lang) rollup of doc/token/
    // char counts, exact-dup docs, and a corpus quality score. All
    // aggregation is over INTEGERS (exact in any order); the only
    // doubles are computed once from the integer totals, so the whole
    // dashboard hash-checks — a double `avg(quality)` would be
    // accumulation-order-dependent and is deliberately avoided.
    "q_corpus_report" -> ((s, dir) => {
      val d = TestTables.documents(s, dir).select(
        col("source"), col("lang"),
        TextAnalysis.tokenCountWs(col("text")).cast("bigint").as("t"),
        TextAnalysis.punctCount(col("text")).cast("bigint").as("p"),
        TextAnalysis.stopwordCount(col("text")).cast("bigint").as("st"),
        length(col("text")).cast("bigint").as("c"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      d.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("t")).as("n_tokens"),
          sum(col("c")).as("n_chars"),
          countDistinct(col("fp")).as("uniq_docs"),
          sum(col("st")).as("n_stop"),
          sum(col("p")).as("n_punct"))
        .withColumn("dup_docs", col("n_docs") - col("uniq_docs"))
        .withColumn("corpus_quality",
          col("n_stop").cast("double") / greatest(col("n_tokens").cast("double"), lit(1.0)) * lit(2.0)
            - col("n_punct").cast("double") / greatest(col("n_chars").cast("double"), lit(1.0)) * lit(4.0))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          col("n_chars"), col("dup_docs"), col("corpus_quality"))
        .orderBy(col("source"), col("lang"))
    }),

    // Heavy hitters in bounded memory: top-8 terms per language via the
    // SpaceSaving sketch aggregate (a custom TypedImperativeAggregate —
    // only capacity-sized summaries ever shuffle, vs materializing the
    // full term-frequency table for a top-8 answer). capacity 64 >= the
    // corpus vocabulary, so counts are exact here and the oracle
    // hash-checks; the saturated regime's error bounds are
    // property-tested in TopKCountSpec.
    "q_corpus_top_terms" -> ((s, dir) =>
      TestTables.documents(s, dir)
        .select(col("lang"), explode(TextAnalysis.words(col("text"))).as("term"))
        .groupBy(col("lang"))
        .agg(graft.functions.TopKCount.of(col("term"), 8, 64).as("tk"))
        .select(col("lang"), posexplode(col("tk")).as(Seq("idx", "e")))
        .select(col("lang"), (col("idx") + 1).as("rank"),
          col("e.term").as("term"), col("e.cnt").as("cnt"))
        .orderBy(col("lang"), col("rank"))),

    // Weighted heavy hitters: top-4 languages per source by TOKEN
    // volume (not doc count) — the topk_sum variant of the sketch.
    "q_corpus_top_langs_by_tokens" -> ((s, dir) =>
      TestTables.documents(s, dir)
        .select(col("source"), col("lang"),
          TextAnalysis.tokenCountWs(col("text")).cast("bigint").as("w"))
        .groupBy(col("source"))
        .agg(graft.functions.TopKSum.of(col("lang"), col("w"), 4, 64).as("tk"))
        .select(col("source"), posexplode(col("tk")).as(Seq("idx", "e")))
        .select(col("source"), (col("idx") + 1).as("rank"),
          col("e.term").as("lang"), col("e.cnt").as("n_tokens"))
        .orderBy(col("source"), col("rank"))),

    // Full pretraining data pipeline in ONE plan: lang gate → quality
    // gate → exact dedup → near-dup removal → benchmark
    // decontamination → context-window chunking with token counts.
    // Every stage is an engine primitive; the composition is what a
    // pretraining-data team actually ships.
    "q_pipeline_pretrain" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      val cleaned = graft.datapipe.CorpusClean.clean(docs, "doc_id", "text",
        minQuality = 1.1, minJaccard = 0.8, portableHash = true)
      val dropIds = Decontam.overlapReport(cleaned, "doc_id", "text",
          docs.filter(col("doc_id") % 25 === 7), "text", n = 3, minOverlap = 0.5)
        .filter(col("contaminated")).select(col("doc").as("doc_id"))
      // No stage-before-sort here: measured 15% SLOWER staged at the
      // 100x replica (68.5 -> 79.1 s) — same shuffle-output-reuse
      // reason as q_pipeline_corpus above (bench_ab_stage_sort_r11
      // .json); the chunk explode tail is narrow but cheap relative
      // to writing the chunk-level result to disk.
      cleaned.join(dropIds, Seq("doc_id"), "left_anti")
        // Bind the word array BEFORE the chunk lambda (r12: an inline
        // words(text) re-splits the doc once per chunk — see
        // TextAnalysis.chunksOfWords).
        .select(col("doc_id"), TextAnalysis.words(col("text")).as("__ws"))
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunksOfWords(col("__ws"), width = 32, stride = 24))
            .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id"),
          TextAnalysis.tokenCountWs(col("chunk")).as("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Corpus collocations: top-20 bigrams by lift (log-free PMI
    // surrogate), min count 5.
    "q_text_collocations" -> ((s, dir) =>
      Keywords.collocations(TestTables.documents(s, dir), "text", k = 20, minCount = 5L)),

    // Context-window chunking: 32-word windows advancing by 24 (8-word
    // overlap) — the pretraining document-splitting op.
    "q_text_chunk" -> ((s, dir) =>
      TestTables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.words(col("text")).as("__ws"))
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunksOfWords(col("__ws"), width = 32, stride = 24))
            .as(Seq("chunk_id", "chunk")))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Per-doc TF-IDF top-3 keywords (log-free idf surrogate keeps the
    // score bit-reproducible — see Keywords scaladoc).
    "q_text_keywords" -> ((s, dir) =>
      Keywords.topTfIdf(TestTables.documents(s, dir), "doc_id", "text", k = 3)
        .orderBy(col("doc"), col("rank"))),

    // Vocabulary induction + OOV coverage: top-100 corpus tokens by
    // frequency (ties lexicographic) as the candidate vocab, then
    // per-doc token/OOV counts against it — the tokenizer-feasibility
    // check. One corpus explode for the vocab, one for the per-doc
    // stats; the induced vocab is top-N so its join is broadcast.
    "q_vocab_coverage" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      val vocab = Vocab.topVocab(docs, col("text"), n = 100)
      Vocab.oovStats(docs, col("doc_id"), col("text"), vocab)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // CCNet-style trigram-LM quality score: the corpus scores itself
    // (train = score set), all-integer quantized conditionals — see
    // LmScore scaladoc.
    "q_text_lm_score" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      LmScore.scoreDocs(docs, "doc_id", "text", docs, "text")
        .orderBy(col("doc"))
    }),

    // Exact substring dedup (Lee-et-al-style): 5-word spans occurring
    // ≥2× corpus-wide are duplicated; report coverage + stripped text.
    "q_text_dup_spans" -> ((s, dir) =>
      DupSpans.report(TestTables.documents(s, dir), "doc_id", "text",
          w = 5, minCount = 2L)
        .orderBy(col("doc"))),

    // HTML → text extraction over synthesized pages: each document is
    // wrapped in a deterministic page (title, style, script, nav links,
    // entities, comment chrome) built with SQL-expressible concat, so
    // the oracle constructs the SAME page and recomputes the whole
    // regex pipeline (RE2 ∩ Java subset — see Html scaladoc).
    "q_text_html_extract" -> ((s, dir) => {
      val page = concat(
        lit("<html><head><title>Doc &amp; "), col("doc_id").cast("string"),
        lit("</title><style>p{color:red}</style></head><body>"),
        lit("<script type=\"text/javascript\">var x=\"<p>no</p>\";</script>"),
        lit("<div class=\"nav\"><a href=\"/home\">Home</a><a href=\"/d?ref=r"),
        col("doc_id").cast("string"), lit("\">Next</a></div><p>"),
        replace(col("text"), lit(" table "), lit(" &lt;table&gt; ")),
        lit("</p><h2>End</h2><p>Tail&nbsp;para</p><!-- chrome --></body></html>"))
      TestTables.documents(s, dir)
        .select(col("doc_id").as("doc"), page.as("html"))
        .select(col("doc"),
          Html.title(col("html")).as("title"),
          Html.extractText(col("html")).as("body_text"),
          array_join(Html.links(col("html")), ",").as("hrefs"),
          size(Html.links(col("html"))).cast("long").as("n_links"),
          Html.textRatio(col("html")).as("text_ratio"))
        .orderBy(col("doc"))
    }),

    // URL decomposition over synthesized crawl URLs (userinfo, optional
    // www, ccTLD-vs-gTLD registered-domain split, port, query, optional
    // fragment) — every field recomputed by the oracle with the same
    // regexes. hostBucket is spec-covered only (DuckDB lacks Spark's
    // seed-42 xxhash64).
    "q_text_url_parse" -> ((s, dir) => {
      val u = concat(
        lit("https://User@"),
        when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
        col("source"),
        when(col("doc_id") % 4 === 0, lit(".example.co.uk")).otherwise(lit(".example.com")),
        lit(":8080/docs/"), col("doc_id").cast("string"),
        lit("/page?x=1&ref=r"), (col("doc_id") % 7).cast("string"),
        when(col("doc_id") % 5 === 0, lit("#sec")).otherwise(lit("")))
      TestTables.documents(s, dir)
        .select(col("doc_id").as("doc"), u.as("u"))
        .select(col("doc"),
          Urls.host(col("u")).as("host"),
          Urls.path(col("u")).as("path"),
          Urls.queryParam(col("u"), "ref").as("ref"),
          Urls.fragment(col("u")).as("frag"),
          Urls.registeredDomain(col("u")).as("domain"),
          Urls.tld(col("u")).as("tld"))
        .orderBy(col("doc"))
    }),

    // Crawl-diversity gate: ≤5 docs per registered domain, best-first
    // by n_chars (doc id breaks ties). The Spark side derives the
    // domain through URL synthesis + the registeredDomain regex; the
    // oracle recomputes it directly from source — cross-checking both
    // the cap AND the domain extraction.
    "q_url_domain_cap" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
        .select(col("doc_id").as("doc"), col("n_chars"),
          concat(lit("https://www."), col("source"), lit(".com/docs/"),
            col("doc_id").cast("string")).as("u"))
      Urls.capPerDomain(docs, "u", col("n_chars"), col("doc"), 5)
        .select(col("doc"), Urls.registeredDomain(col("u")).as("domain"),
          col("n_chars").cast("long").as("n_chars"))
        .orderBy(col("domain"), col("doc"))
    }),

    // BM25 top-5 retrieval: every 50th document's first 8 words as the
    // query set against the full corpus (exact-rational k1=6/5, b=3/4
    // scoring quantized to longs — see Keywords.bm25TopK scaladoc).
    // The query set pins to replica 0 (doc_id < 1e9 — vacuous at every
    // driver SF): a retrieval bench measures a FIXED query set against
    // a growing corpus; letting the fixture's queries grow with the
    // replicas turns the workload quadratic (10× queries × 10×
    // postings = 100×) and benchmarks the fixture, not the engine.
    "q_bm25_topk" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      val qs = docs.filter(col("doc_id") % 50 === 13 && col("doc_id") < 1000000000L)
        .select(col("doc_id").as("q_id"),
          array_join(slice(TextAnalysis.words(col("text")), 1, 8), " ").as("q_text"))
      Keywords.bm25TopK(docs, "doc_id", "text", qs, "q_id", "q_text", k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Exact phrase search: every 100th document's first 3 words as
    // phrases against the full corpus. The engine runs the positional
    // inverted-index conjunctive join; the oracle answers by 3-shingle
    // string equality — structurally different algorithms must agree.
    "q_phrase_search" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      val ph = docs.filter(col("doc_id") % 100 === 17)
        .select(col("doc_id").as("p_id"),
          array_join(slice(TextAnalysis.words(col("text")), 1, 3), " ").as("phrase"))
      Retrieval.phraseSearch(docs, "doc_id", "text", ph, "p_id", "phrase")
        .orderBy(col("p_id"), col("doc"))
    }),

    // Hybrid retrieval: RRF fusion of the BM25 lexical ranking with a
    // brute-force cosine vector ranking over the SAME query doc ids
    // (documents and embeddings share the 0..N id space by fixture
    // design). Integer-quotient contributions keep the fused score an
    // exact long — full oracle.
    "q_hybrid_rrf" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
      val emb = TestTables.embeddings(s, dir)
      // Query sets pinned to replica 0, same rationale as q_bm25_topk.
      val qs = docs.filter(col("doc_id") % 50 === 13 && col("doc_id") < 1000000000L)
        .select(col("doc_id").as("q_id"),
          array_join(slice(TextAnalysis.words(col("text")), 1, 8), " ").as("q_text"))
      val lex = Keywords.bm25TopK(docs, "doc_id", "text", qs, "q_id", "q_text", k = 10)
        .select(col("q_id"), col("doc"), col("rank"))
      val vec = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 50 === 13 && col("vec_id") < 1000000000L),
          emb, "vec_id", "embedding", k = 10)
        .select(col("q_id"), col("n_id").as("doc"), col("rank"))
      Retrieval.rrfFuse(Seq(lex, vec), k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Fingerprints: normalized md5 + order-sensitive rolling chain.
    "q_text_fingerprint" -> ((s, dir) =>
      TestTables.documents(s, dir).select(
          col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          TextAnalysis.rollingFingerprint(col("text")).as("rolling_fp"))
        .orderBy(col("doc_id"))),

    // Brute-force cosine top-3 neighbors for sampled query vectors
    // (query set pinned to replica 0, same rationale as q_bm25_topk).
    "q_sim_bruteforce" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir)
      Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 1000000000L),
          emb, "vec_id", "embedding", k = 3)
        .orderBy(col("q_id"), col("rank"))
    }),

    // LSH-bucketed ANN over planted twin queries. Each query is a
    // ×2-scaled copy of a corpus vector: the power-of-two scaling is
    // IEEE-exact, so the twin shares every hyperplane sign (guaranteed
    // bucket collision in every table) and has cosine ≈ 1.0 with its
    // base — while the strongest NATURAL query-corpus cosine is ≤ 0.46.
    // The top-1 row per query therefore provably equals the brute-force
    // top-1, which the oracle computes closed-form: FULL hash compare.
    "q_sim_lsh_ann" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir)
      Similarity.lshTopK(twinQueries(emb), emb, "vec_id", "embedding",
          k = 1, planesPerTable = 4, tables = 8)
        .orderBy(col("q_id"), col("rank"))
    }),

    // IVF ANN: k-means cells + nprobe search, over the same planted
    // twins — exact scaling preserves every query-to-centroid cosine,
    // so a twin probes exactly the cells its base ranks, including the
    // base's own cell; top-1 is provably the brute-force top-1 and the
    // oracle computes it closed-form: FULL hash compare.
    "q_sim_ivf_ann" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir)
      val centroids = graft.datapipe.Ivf.train(emb, "vec_id", "embedding", k = 16, iters = 2)
      graft.datapipe.Ivf.topK(twinQueries(emb), emb, centroids,
          "vec_id", "embedding", k = 1, nprobe = 4)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Incremental IVF: the SAME planted-twin probe as q_sim_ivf_ann,
    // but the cell-partitioned index is built by three ingestBatch
    // calls against fixed centroids instead of one rebuild — assignment
    // is a pure function of (vector, centroids), so the incremental
    // layout must answer identically, down to the same closed-form
    // brute-force oracle.
    "q_sim_ivf_incremental" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir)
      val centroids = graft.datapipe.Ivf.train(emb, "vec_id", "embedding", k = 16, iters = 2)
      val path = graft.util.TempDirs.scratch("graft_ivf_inc") + "/corpus"
      (0 to 2).foreach(i => graft.datapipe.Ivf.ingestBatch(
        emb.filter(col("vec_id") % 3 === i), centroids, "vec_id", "embedding", path))
      graft.datapipe.Ivf.topKPruned(s, twinQueries(emb), path, centroids,
          "vec_id", "embedding", k = 1, nprobe = 4)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Int8 scalar quantization of the embedding table (full oracle —
    // the affine code arithmetic is fixed-order IEEE, so DuckDB
    // reproduces every code; codes emitted as a joined string since
    // the driver compare is scalar-typed).
    "q_embed_quantize" -> ((s, dir) => {
      val q = Quantize.quantizeTable(
        TestTables.embeddings(s, dir).filter(col("vec_id") % 5 === 0), "vec_id", "embedding")
      q.select(col("vec_id"), col("qmin"), col("qmax"),
          array_join(col("qvec"), ",").as("qcodes"))
        .orderBy(col("vec_id"))
    }),

    // Asymmetric quantized ANN: full-precision planted-twin queries
    // against the int8 corpus. The twin's cosine with its dequantized
    // base is 1 − O(quantization cell) ≈ 0.9999, far above the ≤ 0.47
    // strongest natural pair, so top-1 is provably the base even
    // through the int8 codes — and the oracle replays the fixed-order
    // quantize/dequantize arithmetic exactly: FULL hash compare.
    "q_sim_quantized_ann" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir)
      Quantize.bruteForceTopKQuantized(
          twinQueries(emb),
          Quantize.quantizeTable(emb, "vec_id", "embedding"),
          "vec_id", "embedding", k = 1)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Embedding-cosine near-dup pairs inside LSH buckets. The synthetic
    // embeddings have no natural pair >= 0.9 at small SF (max ≈ 0.41),
    // so, like q_dedup_minhash_shingled, plant a deterministic twin of
    // every sampled vector: positive scaling preserves both the cosine
    // (cos(v, 2v) = 1) and every hyperplane sign, so the output is
    // exactly the planted (vec, twin) pairs — which the oracle's
    // exhaustive ≥ 0.9 pair scan reproduces: FULL hash compare.
    "q_sim_cosine_dedup" -> ((s, dir) => {
      val emb = TestTables.embeddings(s, dir).filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"), col("embedding"))
      val twins = emb.select((col("vec_id") + lit(10000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      Similarity.cosineDedupPairs(emb.unionByName(twins), "vec_id", "embedding",
          minCosine = 0.9)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // The CAPPED cosine-dedup path under a planted HOT bucket: 30
    // power-of-two-scaled copies of one vector form a 31-member
    // cluster sharing every LSH bucket (exact scaling ⇒ identical
    // hyperplane signs); cap 16 forces the star fallback, so the
    // output is exactly the 30 (base, copy) star pairs at cosine 1.0 —
    // the quadratic-blowup defense is what this entry exercises.
    "q_sim_cosine_dedup_capped" -> ((s, dir) => {
      // vec_id < 1e9 pins the fixture to ScaleUp replica 0 (a no-op at
      // plain SFs): replicated tables carry IDENTICAL embeddings under
      // shifted ids, which would overflow EVERY bucket with exact
      // twins and void the "only the planted bucket exceeds the cap"
      // premise this oracle's exactness rests on.
      val emb = TestTables.embeddings(s, dir)
        .filter(col("vec_id") % 10 === 0 && col("vec_id") < 1000000000L)
        .select(col("vec_id"), col("embedding"))
      val copies = emb.filter(col("vec_id") === 0)
        .select(explode(sequence(lit(1), lit(30))).as("i"), col("embedding"))
        .select((lit(20000000L) + col("i")).as("vec_id"),
          transform(col("embedding"), x => x * pow(lit(2.0), col("i")).cast("float")).as("embedding"))
      Similarity.cosineDedupPairs(emb.unionByName(copies), "vec_id", "embedding",
          minCosine = 0.9, maxBucket = 16)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // SemDeDup over a provable fixture: one-hot embeddings in 16
    // orthogonal direction classes (doc_id % 16, scale doc_id+1) make
    // every within-class cosine exactly 1.0 and every cross-class
    // cosine exactly 0.0, so k-means + intra-cell dedup MUST keep
    // exactly the class minima — the oracle recomputes that closed
    // form from the documents table. FULL hash compare, unlike the
    // LSH ANN entries where the candidate set is heuristic. The
    // HEADLINE entry is star-capped (cap 20 < every cell size, ≥31 at
    // sf0.01), so all drops ride the linear star path — the scale-safe
    // default posture; for pure direction-classes the star provably
    // merges the whole class, so the same closed-form oracle applies.
    "q_sem_dedup" -> ((s, dir) => {
      val vecs = TestTables.documents(s, dir).select(col("doc_id").as("id"),
        transform(sequence(lit(0), lit(15)),
          d => when(d === col("doc_id") % 16, (col("doc_id") + 1).cast("double"))
            .otherwise(lit(0.0))).as("vec"))
      SemDedup.dedupReport(vecs, "id", "vec", k = 16, iters = 1,
          minCosine = 0.9, maxCell = 20)
        .orderBy(col("id"))
    }),

    // Same fixture with the cap explicitly DISABLED — the labeled
    // worst-case demonstration of what the star cap buys: within-cell
    // pairs go quadratic on a duplicate-heavy corpus (1.44× of linear
    // at the 10× replica vs 0.21× capped; at the 100× replica it DNF'd
    // a 20-minute bound while the capped default finished in 9.0 s —
    // bench_100x_uncapped_r08.json). The q_demo_ prefix is the
    // quarantine: Bench treats a headline name missing from the
    // registry as an ERROR row, and review treats any q_demo_ name in
    // a headline list the same way — this plan must never re-enter one.
    // doc_id < 1e9 pins the DEMO ITSELF to ScaleUp replica 0 (a no-op
    // at plain SFs): the demonstration needs the all-pairs plan, not
    // an all-pairs plan over a replica-scaled corpus — unpinned, a
    // full-surface Verify at a ≥100× replica must execute a quadratic
    // job that DNFs (round 8), the one registered scale-killer. Pinned,
    // its cost is fixed at the base corpus regardless of replica factor
    // while the exactness demonstration is untouched.
    "q_demo_sem_dedup_uncapped" -> ((s, dir) => {
      val vecs = TestTables.documents(s, dir)
        .filter(col("doc_id") < 1000000000L)
        .select(col("doc_id").as("id"),
        transform(sequence(lit(0), lit(15)),
          d => when(d === col("doc_id") % 16, (col("doc_id") + 1).cast("double"))
            .otherwise(lit(0.0))).as("vec"))
      SemDedup.dedupReport(vecs, "id", "vec", k = 16, iters = 1,
          minCosine = 0.9, maxCell = Int.MaxValue)
        .orderBy(col("id"))
    }),

    // Multimodal metadata algebra: frame sampling + resize, no decode.
    "q_mm_metadata" -> ((s, dir) => {
      val media = Multimodal.asMedia(TestTables.documents(s, dir), "doc_id", "text", "n_chars")
      // Bind the resize struct ONCE: both fields provably come from the
      // same call, and the expression isn't computed twice per row.
      val resized = Multimodal.resizeMeta(col("meta"), 224)
      media.select(
          col("media_id"),
          length(col("content")).cast("bigint").as("n_bytes"),
          size(Multimodal.frameSampleIndexes(col("meta"))).as("n_frames"),
          resized.getField("width").as("resized_w"),
          resized.getField("height").as("resized_h"),
          (col("meta.width").cast("double") / col("meta.height").cast("double")).as("aspect"))
        .orderBy(col("media_id"))
    }),

    // REAL audio roundtrip: synthesize closed-form PCM16 clips, encode
    // to actual RIFF/WAVE bytes, decode them back and extract features.
    // The oracle computes the same features straight from the sample
    // formula in SQL — a header/chunk/byte bug in the codec fails the
    // hash compare.
    "q_mm_wav_roundtrip" -> ((s, dir) => {
      val media = Multimodal.synthWav(
        TestTables.documents(s, dir).select(col("doc_id")), "doc_id")
      Multimodal.decodeWavFeatures(media).orderBy(col("media_id"))
    }),

    // REAL image roundtrip: synthesize closed-form RGB patterns, encode
    // to actual 24bpp BMP bytes (bottom-up rows, 4-byte row padding,
    // BGR order), decode them back and extract features. The oracle
    // computes the same features straight from the pixel formula in
    // SQL — a header, row-order, padding, or channel-order bug in the
    // codec fails the hash compare.
    "q_mm_bmp_roundtrip" -> ((s, dir) => {
      val media = Multimodal.synthBmp(
        TestTables.documents(s, dir).select(col("doc_id")), "doc_id")
      Multimodal.decodeBmpFeatures(media).orderBy(col("media_id"))
    }),

    // REAL video roundtrip: synthesize closed-form RGB frame stacks,
    // encode to actual uncompressed AVI bytes (RIFF chunk tree, raw
    // bottom-up BGR DIB frames), decode them back and extract
    // features. The oracle recomputes the same features from the
    // per-frame pixel formula in SQL — a header, frame-order,
    // row-order, padding, or channel bug fails the hash compare.
    // Sampled docs keep the oracle's unnested pixel table small.
    "q_mm_avi_roundtrip" -> ((s, dir) => {
      val media = Multimodal.synthAvi(
        sampledDocs(s, dir).select(col("doc_id")), "doc_id")
      Multimodal.decodeAviFeatures(media).orderBy(col("media_id"))
    }),

    // Frame sampling over the real AVI path: every 2nd frame of each
    // clip becomes a row with frame-order- and pixel-order-sensitive
    // features — the oracle recomputes them per sampled frame from
    // the same closed form.
    "q_mm_video_frames" -> ((s, dir) => {
      val media = Multimodal.synthAvi(
        sampledDocs(s, dir).select(col("doc_id")), "doc_id")
      Multimodal.sampleAviFrames(media, everyNth = 2)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Frame-level audio analysis over the real codec: 160-sample
    // (20 ms at 8 kHz) frames of each synthesized clip, per frame the
    // exact integer energy / peak / zero-crossing features a VAD pass
    // starts from; the partial tail frame is dropped on both sides.
    // The oracle recomputes every sample from the closed form and
    // replays the framing, the Σs², the max|s|, and the strict
    // sign-product crossing rule.
    // (Sampled on % 7 — a % 10 sample would pin id % 5 = 0 and every
    // clip to the same 400-sample length; % 7 exercises all 5 lengths
    // and tail-drop remainders.)
    "q_mm_audio_frames" -> ((s, dir) => {
      val media = Multimodal.synthWav(
        TestTables.documents(s, dir).filter(col("doc_id") % 7 === 0)
          .select(col("doc_id")), "doc_id")
      Multimodal.wavFrameFeatures(media, frameLen = 160)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Perceptual image hashing over the real codec: every 10th doc
    // yields a closed-form BMP plus a one-pixel retouch; dHash samples
    // a 9×8 gray grid (truncating nearest-neighbor) and bits compare
    // horizontal neighbors. The oracle recomputes every grid sample,
    // comparison, and bit weight from the pixel formula in SQL — a
    // decode, sampling-map, or bit-order bug fails the hash.
    "q_mm_dhash" -> ((s, dir) => {
      val media = Multimodal.synthBmpPair(
        sampledDocs(s, dir).select(col("doc_id")), "doc_id")
      Multimodal.dhashBmp(media).orderBy(col("media_id"))
    }),

    // Image near-dup pass over those hashes: the SimHash pigeonhole
    // candidate machinery (4 chunks ⇒ lossless at Hamming ≤ 3) finds
    // each planted retouch pair; the oracle brute-forces all pairs —
    // the candidate scheme must lose nothing and add nothing. Media
    // set pinned to replica 0 (vacuous at driver SFs): the oracle's
    // brute-force pair term is quadratic in the media count.
    "q_mm_dhash_dedup" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
        .filter(col("doc_id") % 10 === 0 && col("doc_id") < 1000000000L)
      val media = Multimodal.synthBmpPair(docs.select(col("doc_id")), "doc_id")
      Dedup.sketchHammingPairs(
          Multimodal.dhashBmp(media), "media_id", "dhash", maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Per-frame video dHash over the real AVI codec: every frame of
    // each synthesized clip hashes through the same 9×8 integer grid
    // as the image path — the shot-level visual signature a video
    // dedup compares. The oracle recomputes every frame's grid and
    // bit weights from the per-frame pixel formula.
    "q_mm_video_dhash" -> ((s, dir) => {
      val media = Multimodal.synthAvi(
        sampledDocs(s, dir).select(col("doc_id")), "doc_id")
      Multimodal.dhashAviFrames(media, everyNth = 1)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // 64-bit audio fingerprints (Haitsma–Kalker energy deltas on the
    // exact-integer grid): each %7-sampled doc yields a clip and a
    // one-LSB retouch twin; frame energies over 16-sample frames,
    // bit i = energy rises from frame i to i+1. The oracle replays
    // sample synthesis, framing, energies, and bit assembly.
    "q_mm_audio_fingerprint" -> ((s, dir) => {
      val media = Multimodal.synthWavPair(
        TestTables.documents(s, dir).filter(col("doc_id") % 7 === 0)
          .select(col("doc_id")), "doc_id")
      Multimodal.wavFingerprint(media, frameLen = 16)
        .orderBy(col("media_id"))
    }),

    // Audio near-dup pass over those fingerprints: the pigeonhole
    // candidate machinery must find each planted retouch pair — the
    // single-delta retouch cycles into ceil(64/(nFrames−1)) bits, i.e.
    // ≤ 3 apart at this frameLen=16 fixture (hence maxHamming = 3) —
    // and nothing the brute-force oracle doesn't. Pinned to
    // replica 0 — the oracle pair term is quadratic in the media count.
    "q_mm_audio_dedup" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
        .filter(col("doc_id") % 7 === 0 && col("doc_id") < 1000000000L)
      val media = Multimodal.synthWavPair(docs.select(col("doc_id")), "doc_id")
      Dedup.sketchHammingPairs(
          Multimodal.wavFingerprint(media, frameLen = 16),
          "media_id", "fingerprint", maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Clip-level video near-dup: each clip's signature is the bit-XOR
    // of its per-frame dHashes — order-blind by construction (stated,
    // not hidden: XOR is the piece-combining trick of set signatures),
    // and a one-pixel one-frame retouch moves at most 2 signature
    // bits, so the planted pairs ride the same pigeonhole machinery as
    // every other sketch family. Oracle: recompute every frame hash
    // from the pixel formula, XOR per clip, brute-force pairs. Pinned
    // to replica 0 — the oracle pair term is quadratic.
    "q_mm_video_dedup" -> ((s, dir) => {
      val docs = TestTables.documents(s, dir)
        .filter(col("doc_id") % 10 === 0 && col("doc_id") < 1000000000L)
      val media = Multimodal.synthAviPair(docs.select(col("doc_id")), "doc_id")
      val sigs = Multimodal.dhashAviFrames(media, everyNth = 1)
        .groupBy(col("media_id"))
        .agg(expr("bit_xor(dhash)").as("sig"))
      Dedup.sketchHammingPairs(sigs, "media_id", "sig", maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // REAL COMPRESSED-format roundtrip — closes the boundary the
    // earlier rounds stubbed: synthesize closed-form grayscale
    // patterns built to force BOTH RLE8 token families (constant runs
    // and per-pixel-noise rows), encode to actual BI_RLE8 BMP bytes,
    // decode the token stream back and extract features. The oracle
    // recomputes the features from the pixel formula in SQL — a
    // run-boundary, absolute-pad, EOL, or row-order bug in either
    // codec direction fails the hash compare.
    "q_mm_rle_roundtrip" -> ((s, dir) => {
      val media = Multimodal.synthRleBmp(
        sampledDocs(s, dir).select(col("doc_id")), "doc_id")
      Multimodal.decodeRleFeatures(media)
        .select(col("media_id"), col("width"), col("height"), col("n_px"),
          col("sum_px"), col("px_weighted"), col("mean_px"))
        .orderBy(col("media_id"))
    }),
  )

  private val stopwordsIn = TextAnalysis.stopwords.map(w => s"'$w'").mkString(", ")

  /** DuckDB twin of TextAnalysis.tokenCountWs over the `text` column. */
  private val tokensWsSqlData: String =
    """len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))"""

  /** DuckDB twin of TextAnalysis.words over the `text` column. */
  private val wordsSql: String =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  /** DuckDB twin of TextAnalysis.shingles(_, n) over a word-list column
    * (short docs collapse to one whole-document shingle, like the
    * Column version).
    */
  private def shinglesSql(ws: String, n: Int = 3): String =
    s"CASE WHEN len($ws) <= ${n - 1} THEN [array_to_string($ws, ' ')] " +
      s"ELSE list_transform(range(1, len($ws) - ${n - 2}), i -> array_to_string(list_slice($ws, i, i + ${n - 1}), ' ')) END"

  private def langHitsSql(markers: Seq[String]): String =
    markers.map { m =>
      val esc = m.replace("'", "''")
      s"(length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', '$esc', ''))) / ${m.length}"
    }.mkString(" + ")

  /** md5-minhash CTE chain over a source CTE named `src` (must expose
    * doc_id, text): 16 min-hash aggregates, 4 band keys, band
    * self-join, true-Jaccard verification into CTE `verified` —
    * generated so the hash indices stay in lockstep with
    * Dedup.minhashBands. `shingle >= 2` switches the hashing unit (and
    * the verification sets) from words to word n-gram shingles,
    * mirroring Dedup.units.
    */
  // Word mode keeps its historical inline token SQL; shingle mode
  // unnests the shingle list (already empty-word-free: shingles are
  // built from the filtered word list).
  private def minhashUnitRows(src: String, shingle: Int): String =
    if (shingle >= 2)
      s"""SELECT DISTINCT doc_id AS doc, w
         |  FROM $src, unnest(${shinglesSql(wordsSql, shingle)}) AS t(w)""".stripMargin
    else
      s"""SELECT DISTINCT doc_id AS doc, w
         |  FROM $src, unnest(string_split_regex(lower(text), '\\s+')) AS t(w) WHERE w <> ''""".stripMargin

  private def minhashUnitSet(shingle: Int): String =
    if (shingle >= 2) s"list_distinct(${shinglesSql(wordsSql, shingle)})"
    else "list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))"

  /** The hash-family-independent back half of the minhash-pairs
    * oracle: candidate pairs out of a `bands(doc, band, band_key)`
    * CTE (with the capped star rule when `maxBucket` is set), then
    * true-Jaccard verification into CTE `verified` — shared by the
    * md5 and xxh64 chains so the two families can never drift.
    */
  private def minhashVerifyCtes(src: String, minJaccard: Double, maxBucket: Option[Int],
                                starPairs: Boolean, shingle: Int): String = {
    val unitSet = minhashUnitSet(shingle)
    val candSrc = maxBucket match {
      case Some(cap) =>
        // The dedup is an explicit outer DISTINCT over UNION ALL, never
        // a bare UNION: these CTEs also run inside the xxh64 chains'
        // WITH RECURSIVE statements, where DuckDB 1.0 treats any CTE
        // with a top-level UNION as recursive-CTE syntax and SKIPS the
        // union's deduplication (reproduced: WITH RECURSIVE t AS
        // (SELECT 1 UNION SELECT 1) yields 2 rows) — that silently
        // duplicated capped star pairs at sf0.1.
        val starCand =
          if (starPairs)
            """
              |    UNION ALL
              |    SELECT keep_doc AS doc_a, b.doc AS doc_b FROM bands b
              |    JOIN bsz USING (band, band_key) WHERE n > %CAP% AND b.doc <> keep_doc""".stripMargin
          else ""
        s"""bsz AS (
           |  SELECT band, band_key, count(*) AS n, min(doc) AS keep_doc
           |  FROM bands GROUP BY band, band_key),
           |small AS (
           |  SELECT b.doc, b.band, b.band_key FROM bands b
           |  JOIN bsz USING (band, band_key) WHERE n <= $cap),
           |big_drops AS (
           |  SELECT DISTINCT b.doc FROM bands b
           |  JOIN bsz USING (band, band_key) WHERE n > $cap AND b.doc <> keep_doc),
           |cand AS (
           |  SELECT DISTINCT doc_a, doc_b FROM (
           |    SELECT a.doc AS doc_a, b.doc AS doc_b
           |    FROM small a JOIN small b
           |      ON a.band = b.band AND a.band_key = b.band_key AND a.doc < b.doc${starCand.replace("%CAP%", cap.toString)}) u),""".stripMargin
      case None =>
        """cand AS (
          |  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
          |  FROM bands a JOIN bands b
          |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc < b.doc),""".stripMargin
    }
    s"""$candSrc
       |ws AS (
       |  SELECT doc_id AS doc, $unitSet AS w
       |  FROM $src),
       |verified AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(wa.w, wb.w)) AS DOUBLE)
       |      / CAST(len(list_distinct(list_concat(wa.w, wb.w))) AS DOUBLE) AS jaccard
       |  FROM cand JOIN ws wa ON wa.doc = doc_a JOIN ws wb ON wb.doc = doc_b
       |  WHERE CAST(len(list_intersect(wa.w, wb.w)) AS DOUBLE)
       |      / CAST(len(list_distinct(list_concat(wa.w, wb.w))) AS DOUBLE) >= $minJaccard)""".stripMargin
  }

  private def minhashMd5Ctes(src: String, minJaccard: Double, maxBucket: Option[Int] = None,
                             starPairs: Boolean = false, shingle: Int = 0): String = {
    val unitRows = minhashUnitRows(src, shingle)
    val minAggs = (0 until 16)
      .map(i => s"min(substr(md5('$i' || '|' || w), 1, 15)) AS h$i").mkString(",\n  ")
    val bandRows = (0 until 4).map { b =>
      val hs = (b * 4 until (b + 1) * 4).map(i => s"h$i").mkString(" || '|' || ")
      s"SELECT doc, $b AS band, md5($hs) AS band_key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""tok AS (
       |  $unitRows),
       |sigs AS (SELECT doc,
       |  $minAggs
       |  FROM tok GROUP BY doc),
       |bands AS (
       |  $bandRows),
       |${minhashVerifyCtes(src, minJaccard, maxBucket, starPairs, shingle)}""".stripMargin
  }

  /** The PRODUCTION xxhash64 minhash chain (seeded signatures + band
    * keys), replayed value-exactly by the generated DuckDB stages in
    * [[graft.oracle.PortableHashSql]]. Same unit rows, same star rule,
    * same verification tail as the md5 twin. The caller's query MUST
    * open with `WITH RECURSIVE` (the XXH64 stripe walk recurses).
    */
  private def minhashXxhCtes(src: String, minJaccard: Double, maxBucket: Option[Int] = None,
                             starPairs: Boolean = false, shingle: Int = 0): String = {
    import graft.oracle.{PortableHashSql, Xxh64Ref}
    val unitRows = minhashUnitRows(src, shingle)
    val seeds = (0 until 16).map(i => Xxh64Ref.hashInt(i, 42L))
    val minAggs = (0 until 16).map(i => s"min(h.h$i) AS h$i").mkString(",\n  ")
    val groups = (0 until 4).map(b => (s"bk$b", (b * 4 until (b + 1) * 4).map(i => s"h$i")))
    val bandRows = (0 until 4)
      .map(b => s"SELECT doc, $b AS band, bk$b AS band_key FROM bxk")
      .mkString("\n  UNION ALL ")
    s"""tok AS MATERIALIZED (
       |  $unitRows),
       |uw AS MATERIALIZED (SELECT DISTINCT w FROM tok),
       |${PortableHashSql.wordHashCtes("wx", "uw", seeds)},
       |sigs AS MATERIALIZED (SELECT doc,
       |  $minAggs
       |  FROM tok JOIN wxh h USING (w) GROUP BY doc),
       |${PortableHashSql.chainLongsCtes("bx", "sigs", groups)},
       |bands AS MATERIALIZED (
       |  $bandRows),
       |${minhashVerifyCtes(src, minJaccard, maxBucket, starPairs, shingle)}""".stripMargin
  }

  /** Prefixed tok/sigs/bands CTE chain — lets one query band two
    * independent sources (the incremental batch-vs-corpus match).
    */
  private def minhashBandsCtes(prefix: String, src: String): String = {
    val minAggs = (0 until 16)
      .map(i => s"min(substr(md5('$i' || '|' || w), 1, 15)) AS h$i").mkString(",\n  ")
    val bandRows = (0 until 4).map { b =>
      val hs = (b * 4 until (b + 1) * 4).map(i => s"h$i").mkString(" || '|' || ")
      s"SELECT doc, $b AS band, md5($hs) AS band_key FROM ${prefix}sigs"
    }.mkString("\n  UNION ALL ")
    s"""${prefix}tok AS (
       |  SELECT DISTINCT doc_id AS doc, w
       |  FROM $src, unnest(string_split_regex(lower(text), '\\s+')) AS t(w) WHERE w <> ''),
       |${prefix}sigs AS (SELECT doc,
       |  $minAggs
       |  FROM ${prefix}tok GROUP BY doc),
       |${prefix}bands AS (
       |  $bandRows)""".stripMargin
  }

  private def incrementalDedupOracle: String =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
       |batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 10),
       |${minhashBandsCtes("c_", "corpus")},
       |${minhashBandsCtes("b_", "batch")},
       |bsz AS (
       |  SELECT band, band_key, count(*) AS n, min(doc) AS keep_doc
       |  FROM c_bands GROUP BY band, band_key),
       |idx AS (
       |  SELECT c.doc, c.band, c.band_key FROM c_bands c
       |  JOIN bsz USING (band, band_key) WHERE n <= 10 OR c.doc = keep_doc),
       |cand AS (
       |  SELECT DISTINCT b.doc AS new_doc, i.doc AS corpus_doc
       |  FROM b_bands b JOIN idx i ON b.band = i.band AND b.band_key = i.band_key),
       |bws AS (
       |  SELECT doc_id AS doc,
       |    list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
       |  FROM batch),
       |cws AS (
       |  SELECT doc_id AS doc,
       |    list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
       |  FROM corpus),
       |verified AS (
       |  SELECT new_doc, corpus_doc,
       |    CAST(len(list_intersect(bws.w, cws.w)) AS DOUBLE)
       |      / CAST(len(list_distinct(list_concat(bws.w, cws.w))) AS DOUBLE) AS jaccard
       |  FROM cand JOIN bws ON bws.doc = new_doc JOIN cws ON cws.doc = corpus_doc
       |  WHERE CAST(len(list_intersect(bws.w, cws.w)) AS DOUBLE)
       |      / CAST(len(list_distinct(list_concat(bws.w, cws.w))) AS DOUBLE) >= 0.5),
       |picked AS (
       |  SELECT new_doc, corpus_doc, jaccard,
       |    row_number() OVER (PARTITION BY new_doc ORDER BY corpus_doc) AS rn
       |  FROM verified)
       |SELECT new_doc, corpus_doc AS matched_corpus, jaccard FROM picked WHERE rn = 1
       |ORDER BY new_doc""".stripMargin

  private def minhashMd5Oracle: String =
    s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
       |${minhashMd5Ctes("docs", 0.5)}
       |SELECT doc_a, doc_b, jaccard FROM verified ORDER BY doc_a, doc_b""".stripMargin

  private def minhashMd5CappedOracle: String =
    s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
       |${minhashMd5Ctes("docs", 0.5, maxBucket = Some(20), starPairs = true)}
       |SELECT doc_a, doc_b, jaccard FROM verified ORDER BY doc_a, doc_b""".stripMargin

  /** Shingle-mode oracle: the planted last-word-truncated twins, then
    * the md5 chain with 3-gram shingle units. The twin text transcribes
    * the Spark fixture exactly: split on whitespace (no lowering, no
    * empty-filter), drop the last element, rejoin with single spaces.
    */
  private def minhashShingledMd5Oracle: String =
    s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
       |docs AS (
       |  SELECT doc_id, text FROM base
       |  UNION ALL
       |  SELECT doc_id + 10000000,
       |    array_to_string(list_slice(string_split_regex(text, '\\s+'), 1,
       |      len(string_split_regex(text, '\\s+')) - 1), ' ')
       |  FROM base),
       |${minhashMd5Ctes("docs", 0.5, maxBucket = Some(10), starPairs = true, shingle = 3)}
       |SELECT doc_a, doc_b, jaccard FROM verified ORDER BY doc_a, doc_b""".stripMargin

  /** Full oracle for the PRODUCTION xxhash64 word-mode entry
    * (`q_dedup_minhash`: cap 64, star pairs) — the DuckDB chain
    * recomputes every seeded xxhash64 signature and band key
    * bit-for-bit via [[graft.oracle.PortableHashSql]].
    */
  private def minhashXxhOracle: String =
    s"""WITH RECURSIVE docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
       |${minhashXxhCtes("docs", 0.5, maxBucket = Some(64), starPairs = true)}
       |SELECT doc_a, doc_b, jaccard FROM verified ORDER BY doc_a, doc_b""".stripMargin

  /** Full oracle for the PRODUCTION xxhash64 shingle-mode entry
    * (`q_dedup_minhash_shingled`: planted last-word-truncated twins,
    * 3-gram shingles, uncapped).
    */
  private def minhashShingledXxhOracle: String =
    s"""WITH RECURSIVE base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
       |docs AS (
       |  SELECT doc_id, text FROM base
       |  UNION ALL
       |  SELECT doc_id + 10000000,
       |    array_to_string(list_slice(string_split_regex(text, '\\s+'), 1,
       |      len(string_split_regex(text, '\\s+')) - 1), ' ')
       |  FROM base),
       |${minhashXxhCtes("docs", 0.5, shingle = 3)}
       |SELECT doc_a, doc_b, jaccard FROM verified ORDER BY doc_a, doc_b""".stripMargin

  /** Full oracle for the PRODUCTION SimHash entry (`q_dedup_simhash`):
    * replays the FNV-1a/splitmix64 word hash, the per-bit votes, the
    * 63-bit sketch, the pigeonhole chunk candidates (11 chunks for
    * maxHamming 10), the bucket-64 star rule, and Hamming
    * verification — the same machinery [[Dedup.simhashPairs]] plans.
    */
  private def simhashXxhOracle: String = {
    val numChunks = 11
    val widths = Array.tabulate(numChunks)(i => 64 / numChunks + (if (i < 64 % numChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val chunkVals = (0 until numChunks).map { i =>
      val mask = (1L << widths(i)) - 1L
      s"($i, ${offsets(i)}, $mask)"
    }.mkString(", ")
    val pw = (0 until 63).map(b => s"($b, CAST(${BigInt(1) << b} AS HUGEINT))").mkString(", ")
    s"""WITH RECURSIVE docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
       |wmul AS MATERIALIZED (
       |  SELECT doc_id AS doc, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
       |  FROM docs),
       |uw AS MATERIALIZED (SELECT DISTINCT w FROM wmul),
       |${graft.oracle.PortableHashSql.fnvWordHashCtes("fx", "uw")},
       |hh AS (SELECT doc, hv FROM wmul JOIN fxh USING (w)),
       |pw(b, p) AS (VALUES $pw),
       |bits AS (SELECT doc, b, CASE WHEN (hv // p) % 2 = 1 THEN 1 ELSE -1 END AS v FROM hh, pw),
       |votes AS (SELECT doc, b, CAST(sum(v) AS BIGINT) AS vote FROM bits GROUP BY 1, 2),
       |sig AS (SELECT doc, CAST(sum(CASE WHEN vote > 0 THEN p ELSE 0 END) AS BIGINT) AS sh
       |        FROM votes JOIN pw USING (b) GROUP BY doc),
       |ck AS (SELECT doc, sh, c.chunk, (sh >> c.o) & c.mk AS key
       |       FROM sig, (VALUES $chunkVals) c(chunk, o, mk)),
       |bsz AS (SELECT chunk, key, count(*) AS n, min(doc) AS keep_doc, arg_min(sh, doc) AS keep_sh
       |        FROM ck GROUP BY 1, 2),
       |small AS (SELECT ck.doc, ck.sh, ck.chunk, ck.key FROM ck JOIN bsz USING (chunk, key) WHERE n <= 64),
       |cand AS (
       |  -- outer DISTINCT over UNION ALL, not bare UNION: under WITH
       |  -- RECURSIVE, DuckDB 1.0 parses a top-level UNION in any CTE
       |  -- as recursive syntax and skips its deduplication
       |  SELECT DISTINCT doc_a, sh_a, doc_b, sh_b FROM (
       |    SELECT a.doc AS doc_a, a.sh AS sh_a, b.doc AS doc_b, b.sh AS sh_b
       |    FROM small a JOIN small b ON a.chunk = b.chunk AND a.key = b.key AND a.doc < b.doc
       |    UNION ALL
       |    SELECT keep_doc, keep_sh, c.doc, c.sh FROM ck c JOIN bsz USING (chunk, key)
       |    WHERE n > 64 AND c.doc <> keep_doc) u)
       |SELECT DISTINCT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 10
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // Single shared renderer — see TextAnalysis.qualityScoreSql (three
  // hand-copied variants once risked silent formula drift).
  private val qualitySql: String = TextAnalysis.qualityScoreSql

  /** The corpus-cleaning oracle: language gate → quality gate → exact
    * dedup → minhash near-dup removal, mirroring CorpusClean stage for
    * stage. `ccSurvivor = false` drops the higher id of each verified
    * pair (greedy, CorpusClean.clean); `true` computes the transitive
    * closure with a recursive CTE and drops every non-minimum component
    * member (CorpusClean.cleanCC).
    */
  private def corpusCleanOracle: String = corpusCleanOracle(ccSurvivor = false)

  private def corpusCleanOracle(ccSurvivor: Boolean): String =
    s"""WITH RECURSIVE ${corpusCleanCtes(ccSurvivor)}
       |SELECT doc_id, lang, lang_detected, quality FROM exact_kept
       |WHERE doc_id NOT IN (SELECT doc FROM drops)
       |ORDER BY doc_id""".stripMargin

  /** The corpus-clean CTE chain (through `exact_kept` and `drops`) —
    * shared by the clean oracles and the full-pipeline composition.
    */
  private def corpusCleanCtes(ccSurvivor: Boolean): String = {
    val hits = TextAnalysis.langMarkers.map { case (lang, ms) => lang -> langHitsSql(ms) }
    val hitCols = hits.map { case (lang, h) => s"($h) AS hit_$lang" }.mkString(",\n  ")
    val best = "greatest(" + hits.map(h => s"hit_${h._1}").mkString(", ") + ")"
    val langCase = "CASE WHEN __best <= 0 THEN 'und' " +
      hits.map { case (lang, _) => s"WHEN hit_$lang = __best THEN '$lang'" }.mkString(" ") +
      " ELSE 'und' END"
    val dropsCtes =
      if (!ccSurvivor)
        // DISTINCT over UNION ALL, not bare UNION: these statements run
        // under WITH RECURSIVE, where DuckDB 1.0 skips a top-level
        // UNION's dedup (benign here — drops feeds NOT IN — but the
        // shape is banned repo-wide after the q_dedup_minhash sf0.1
        // duplicate-pair incident).
        """drops AS (
          |  SELECT DISTINCT doc FROM (
          |    SELECT doc_b AS doc FROM verified UNION ALL SELECT doc FROM big_drops) u)""".stripMargin
      else
        // Transitive closure of the verified-pair graph: every node
        // reachable from `root`; component = min reachable node (the
        // edge list is symmetrized, so reachability = connectivity).
        """edges AS (
          |  SELECT doc_a AS a, doc_b AS b FROM verified
          |  UNION ALL SELECT doc_b, doc_a FROM verified),
          |reach(node, root) AS (
          |  SELECT a, a FROM edges
          |  UNION
          |  SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node),
          |comp AS (SELECT node, min(root) AS root FROM reach GROUP BY node),
          |drops AS (
          |  SELECT DISTINCT doc FROM (
          |    SELECT node AS doc FROM comp WHERE root <> node
          |    UNION ALL SELECT doc FROM big_drops) u)""".stripMargin
    s"""hitted AS (
       |  SELECT doc_id, text, lang,
       |  $hitCols,
       |  $qualitySql AS quality
       |  FROM documents),
       |scored AS (SELECT *, $best AS __best FROM hitted),
       |gated AS (
       |  SELECT doc_id, text, lang, quality, $langCase AS lang_detected FROM scored
       |  WHERE $langCase <> 'und' AND quality >= 1.1),
       |exact_kept AS (
       |  SELECT doc_id, text, lang, quality, lang_detected FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
       |      ORDER BY doc_id) AS rn
       |    FROM gated) t WHERE rn = 1),
       |${minhashMd5Ctes("exact_kept", 0.8, maxBucket = Some(100))},
       |$dropsCtes""".stripMargin
  }

  /** Full pretraining composition oracle: corpus clean → benchmark
    * decontamination (vs the doc_id%25=7 slice) → 32/24 chunking with
    * per-chunk token counts.
    */
  private def pretrainOracle: String =
    s"""WITH RECURSIVE ${corpusCleanCtes(ccSurvivor = false)},
       |kept AS (
       |  SELECT doc_id, text FROM exact_kept
       |  WHERE doc_id NOT IN (SELECT doc FROM drops)),
       |bw AS (SELECT doc_id, $wordsSql AS ws FROM documents WHERE doc_id % 25 = 7),
       |bsh AS (SELECT DISTINCT g FROM bw, unnest(${shinglesSql("ws")}) AS t(g)),
       |kw AS (SELECT doc_id, $wordsSql AS ws FROM kept),
       |ksh AS (SELECT doc_id, unnest(list_distinct(${shinglesSql("ws")})) AS g FROM kw),
       |ov AS (
       |  SELECT doc_id, count(*) AS n,
       |    count(*) FILTER (g IN (SELECT g FROM bsh)) AS m
       |  FROM ksh GROUP BY doc_id),
       |decon_drop AS (
       |  SELECT doc_id FROM ov
       |  WHERE CAST(m AS DOUBLE) / CAST(n AS DOUBLE) >= CAST(0.5 AS DOUBLE)),
       |final AS (SELECT doc_id, ws FROM kw
       |          WHERE doc_id NOT IN (SELECT doc_id FROM decon_drop)),
       |ch AS (SELECT doc_id, ws,
       |  CAST(ceil(CAST(greatest(len(ws) - 32, 0) AS DOUBLE) / CAST(24.0 AS DOUBLE)) AS INT) + 1 AS nch
       |  FROM final)
       |SELECT doc_id, CAST(i AS INT) AS chunk_id,
       |  len(list_filter(list_slice(ws, i * 24 + 1, i * 24 + 32), x -> x <> '')) AS n_tokens
       |FROM ch, unnest(range(0, nch)) AS t(i)
       |ORDER BY doc_id, chunk_id""".stripMargin

  /** Shared by q_graph_pagerank and its bucketed-edge twin: storage
    * layout must not change a single grid unit of the fixed point.
    */
  private val pagerankOracle: String = {
      val S = "1000000000000"
      def iter(i: Int) =
        s"""r$i AS (
           |  SELECT nodes.node,
           |    (15 * $S) // (100 * (SELECT c FROM nn)) + coalesce(s.s, 0) AS r
           |  FROM nodes LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum((p.r * 85) // (100 * d.deg)) AS BIGINT) AS s
           |    FROM r${i - 1} p JOIN edges e ON p.node = e.src JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) s ON nodes.node = s.node)""".stripMargin
      s"""WITH nodes AS (SELECT doc_id AS node FROM documents),
         |nn AS (SELECT count(*) AS c FROM nodes),
         |edges AS (
         |  SELECT doc_id AS src, (doc_id * 31 + 97 * k.k) % (SELECT c FROM nn) AS dst
         |  FROM documents, (SELECT unnest([1, 2, 3]) AS k) k
         |  WHERE k.k <= 1 + doc_id % 3),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT node, $S // (SELECT c FROM nn) AS r FROM nodes),
         |${(1 to 10).map(iter).mkString(",\n")}
         |SELECT node, r FROM r10 ORDER BY node""".stripMargin
  }

  /** Closed-form dHash recompute shared by both q_mm_dhash oracles:
    * per (doc, variant) media, the 9×8 nearest-neighbor gray grid from
    * the synthBmpPair pixel formula, horizontal-neighbor comparison
    * bits, and the 64-bit assembly (bit 63 spelled as the min-long
    * literal — DuckDB refuses `1 << 63`). Yields CTE `dmedia`
    * (media_id, width, height, dhash).
    */
  private def dhashOracleCtes(pinned: Boolean): String = {
    val pin = if (pinned) " AND doc_id < 1000000000" else ""
    val grayChannel = (c: Int) =>
      s"(CASE WHEN v = 1 AND sx = 0 AND sy = 0 THEN (id * 13 + $c * 5) % 256 " +
        s"ELSE (id * 31 + ((sy * w + sx) * 3 + $c) * 7) % 256 END)"
    s"""dm AS (
       |  SELECT doc_id AS id, vv.v FROM documents, (SELECT unnest([0, 1]) AS v) vv
       |  WHERE doc_id % 10 = 0$pin),
       |ddims AS (SELECT id, v, 8 + id % 9 AS w, 8 + id % 7 AS h FROM dm),
       |dcells AS (
       |  SELECT id, v, w, h, xx.gx, yy.gy, (xx.gx * w) // 9 AS sx, (yy.gy * h) // 8 AS sy
       |  FROM ddims, (SELECT unnest(range(0, 9)) AS gx) xx,
       |    (SELECT unnest(range(0, 8)) AS gy) yy),
       |dgray AS (
       |  SELECT id, v, gx, gy,
       |    ${grayChannel(0)} + ${grayChannel(1)} + ${grayChannel(2)} AS g
       |  FROM dcells),
       |dbits AS (
       |  SELECT l.id, l.v, l.gy * 8 + l.gx AS idx,
       |    CASE WHEN r.g > l.g THEN 1 ELSE 0 END AS bit
       |  FROM dgray l JOIN dgray r
       |    ON r.id = l.id AND r.v = l.v AND r.gy = l.gy AND r.gx = l.gx + 1
       |  WHERE l.gx < 8),
       |dmedia AS (
       |  SELECT id * 2 + v AS media_id,
       |    CAST(8 + id % 9 AS INT) AS width, CAST(8 + id % 7 AS INT) AS height,
       |    CAST(sum(CASE WHEN bit = 0 THEN 0
       |      WHEN idx = 63 THEN -9223372036854775808
       |      ELSE (CAST(1 AS BIGINT) << CAST(idx AS INT)) END) AS BIGINT) AS dhash
       |  FROM dbits GROUP BY id, v)""".stripMargin
  }

  private val audioFramesOracle: String =
    """WITH am AS (
      |  SELECT doc_id AS id, 400 + (doc_id % 5) * 200 AS n
      |  FROM documents WHERE doc_id % 7 = 0),
      |sidx AS (
      |  SELECT id, ii.i FROM am, (SELECT unnest(range(0, 1200)) AS i) ii
      |  WHERE ii.i < n),
      |smp AS (
      |  SELECT id, i, ((id * 31 + i * 7) % 2048) - 1024 AS s, i // 160 AS f
      |  FROM sidx),
      |full_frames AS (
      |  SELECT id, f FROM smp GROUP BY id, f HAVING count(*) = 160),
      |feats AS (
      |  SELECT s.id, s.f,
      |    CAST(sum(s.s * s.s) AS BIGINT) AS sum_sq,
      |    CAST(max(abs(s.s)) AS BIGINT) AS peak,
      |    CAST(sum(CASE WHEN p.s * s.s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zc
      |  FROM smp s LEFT JOIN smp p ON p.id = s.id AND p.i = s.i - 1 AND p.f = s.f
      |  GROUP BY s.id, s.f)
      |SELECT t.id AS media_id, CAST(t.f AS INT) AS frame_idx,
      |  t.sum_sq, t.peak, t.n_zc
      |FROM feats t JOIN full_frames k ON k.id = t.id AND k.f = t.f
      |ORDER BY media_id, frame_idx""".stripMargin

  /** Closed-form per-frame video dHash recompute: the synthAvi pixel
    * formula through the same 9×8 grid and bit assembly as the image
    * oracle.
    */
  private val videoDhashOracle: String = {
    val grayChannel = (c: Int) =>
      s"(id * 31 + f * 11 + ((sy * w + sx) * 3 + $c) * 7) % 256"
    s"""WITH vm AS (
       |  SELECT doc_id AS id, 8 + doc_id % 6 AS w, 6 + doc_id % 5 AS h,
       |    2 + doc_id % 4 AS nf
       |  FROM documents WHERE doc_id % 10 = 0),
       |vf AS (
       |  SELECT id, w, h, ff.f FROM vm, (SELECT unnest(range(0, 6)) AS f) ff
       |  WHERE ff.f < nf),
       |vc AS (
       |  SELECT id, w, h, f, xx.gx, yy.gy, (xx.gx * w) // 9 AS sx, (yy.gy * h) // 8 AS sy
       |  FROM vf, (SELECT unnest(range(0, 9)) AS gx) xx,
       |    (SELECT unnest(range(0, 8)) AS gy) yy),
       |vg AS (
       |  SELECT id, f, gx, gy,
       |    ${grayChannel(0)} + ${grayChannel(1)} + ${grayChannel(2)} AS g
       |  FROM vc),
       |vb AS (
       |  SELECT l.id, l.f, l.gy * 8 + l.gx AS idx,
       |    CASE WHEN r.g > l.g THEN 1 ELSE 0 END AS bit
       |  FROM vg l JOIN vg r
       |    ON r.id = l.id AND r.f = l.f AND r.gy = l.gy AND r.gx = l.gx + 1
       |  WHERE l.gx < 8)
       |SELECT id AS media_id, CAST(f AS INT) AS frame_idx,
       |  CAST(sum(CASE WHEN bit = 0 THEN 0
       |    WHEN idx = 63 THEN -9223372036854775808
       |    ELSE (CAST(1 AS BIGINT) << CAST(idx AS INT)) END) AS BIGINT) AS dhash
       |FROM vb GROUP BY id, f
       |ORDER BY media_id, frame_idx""".stripMargin
  }

  /** Clip-signature near-dup oracle: the synthAviPair pixel formula
    * (variant 1 retouches pixel (0,0) of frame 0) through the 9×8
    * grid, per-frame hash assembly, per-clip bit-XOR signature, and a
    * brute-force Hamming-pair scan.
    */
  private val videoDedupOracle: String = {
    val grayChannel = (c: Int) =>
      s"(CASE WHEN v = 1 AND f = 0 AND sx = 0 AND sy = 0 THEN (id * 17 + $c * 3) % 256 " +
        s"ELSE (id * 31 + f * 11 + ((sy * w + sx) * 3 + $c) * 7) % 256 END)"
    s"""WITH vm AS (
       |  SELECT doc_id AS id, vv.v, 8 + doc_id % 6 AS w, 6 + doc_id % 5 AS h,
       |    2 + doc_id % 4 AS nf
       |  FROM documents, (SELECT unnest([0, 1]) AS v) vv
       |  WHERE doc_id % 10 = 0 AND doc_id < 1000000000),
       |vf AS (
       |  SELECT id, v, w, h, ff.f FROM vm, (SELECT unnest(range(0, 6)) AS f) ff
       |  WHERE ff.f < nf),
       |vc AS (
       |  SELECT id, v, w, h, f, xx.gx, yy.gy, (xx.gx * w) // 9 AS sx, (yy.gy * h) // 8 AS sy
       |  FROM vf, (SELECT unnest(range(0, 9)) AS gx) xx,
       |    (SELECT unnest(range(0, 8)) AS gy) yy),
       |vg AS (
       |  SELECT id, v, f, gx, gy,
       |    ${grayChannel(0)} + ${grayChannel(1)} + ${grayChannel(2)} AS g
       |  FROM vc),
       |vb AS (
       |  SELECT l.id, l.v, l.f, l.gy * 8 + l.gx AS idx,
       |    CASE WHEN r.g > l.g THEN 1 ELSE 0 END AS bit
       |  FROM vg l JOIN vg r
       |    ON r.id = l.id AND r.v = l.v AND r.f = l.f AND r.gy = l.gy AND r.gx = l.gx + 1
       |  WHERE l.gx < 8),
       |vh AS (
       |  SELECT id, v, f,
       |    CAST(sum(CASE WHEN bit = 0 THEN 0
       |      WHEN idx = 63 THEN -9223372036854775808
       |      ELSE (CAST(1 AS BIGINT) << CAST(idx AS INT)) END) AS BIGINT) AS dhash
       |  FROM vb GROUP BY id, v, f),
       |vsig AS (
       |  SELECT id * 2 + v AS media_id, CAST(bit_xor(dhash) AS BIGINT) AS sig
       |  FROM vh GROUP BY id, v)
       |SELECT a.media_id AS doc_a, b.media_id AS doc_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       |FROM vsig a JOIN vsig b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Closed-form audio-fingerprint CTE chain shared by the fingerprint
    * and dedup oracles: sample synthesis (with the variant's one-LSB
    * retouch on sample 0), 16-sample framing, full-frame energies, and
    * the energy-delta bit assembly. Yields CTE `afp`
    * (media_id, n_frames, fingerprint). Clips with fewer than 2 frames
    * have no deltas: the engine emits fingerprint 0 for them, so the
    * oracle carries an explicit nf < 2 branch doing the same (and the
    * afb delta join is guarded against the nf = 1 modulo-by-zero) —
    * the fixture (n ≥ 400, frameLen 16) never produces such clips, but
    * a frameLen change must not make oracle and engine silently
    * disagree.
    */
  private def audioFpCtes(pinned: Boolean): String = {
    val pin = if (pinned) " AND doc_id < 1000000000" else ""
    s"""afm AS (
       |  SELECT doc_id AS id, vv.v, 400 + (doc_id % 5) * 200 AS n
       |  FROM documents, (SELECT unnest([0, 1]) AS v) vv
       |  WHERE doc_id % 7 = 0$pin),
       |afs AS (
       |  SELECT id, v, ii.i FROM afm, (SELECT unnest(range(0, 1200)) AS i) ii
       |  WHERE ii.i < n),
       |afsm AS (
       |  SELECT id, v, i,
       |    ((id * 31 + i * 7) % 2048) - 1024
       |      + CASE WHEN v = 1 AND i = 0 THEN 1 ELSE 0 END AS s,
       |    i // 16 AS f
       |  FROM afs),
       |afe AS (
       |  SELECT id, v, f, CAST(sum(s * s) AS BIGINT) AS e
       |  FROM afsm GROUP BY 1, 2, 3 HAVING count(*) = 16),
       |afnf AS (SELECT id, v, n // 16 AS nf FROM afm),
       |afd AS (
       |  SELECT a.id, a.v, a.f AS d, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
       |  FROM afe a JOIN afe b ON b.id = a.id AND b.v = a.v AND b.f = a.f + 1),
       |afb AS (
       |  SELECT f.id, f.v, bb.i, d.bit
       |  FROM afnf f
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) bb
       |  JOIN afd d ON d.id = f.id AND d.v = f.v AND d.d = bb.i % (f.nf - 1)
       |  WHERE f.nf >= 2),
       |afp AS (
       |  SELECT nf.id * 2 + nf.v AS media_id,
       |    CAST(nf.nf AS INT) AS n_frames,
       |    CAST(sum(CASE WHEN b.bit = 0 THEN 0
       |      WHEN b.i = 63 THEN -9223372036854775808
       |      ELSE (CAST(1 AS BIGINT) << CAST(b.i AS INT)) END) AS BIGINT) AS fingerprint
       |  FROM afnf nf JOIN afb b ON b.id = nf.id AND b.v = nf.v
       |  GROUP BY nf.id, nf.v, nf.nf
       |  UNION ALL
       |  SELECT id * 2 + v, CAST(nf AS INT), CAST(0 AS BIGINT)
       |  FROM afnf WHERE nf < 2)""".stripMargin
  }

  private val audioFingerprintOracle: String =
    s"""WITH ${audioFpCtes(pinned = false)}
       |SELECT media_id, n_frames, fingerprint FROM afp ORDER BY media_id""".stripMargin

  private val audioDedupOracle: String =
    s"""WITH ${audioFpCtes(pinned = true)}
       |SELECT a.media_id AS doc_a, b.media_id AS doc_b,
       |  CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT) AS hamming
       |FROM afp a JOIN afp b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  private val dhashOracle: String =
    s"""WITH ${dhashOracleCtes(pinned = false)}
       |SELECT media_id, width, height, dhash FROM dmedia ORDER BY media_id""".stripMargin

  private val dhashDedupOracle: String =
    s"""WITH ${dhashOracleCtes(pinned = true)}
       |SELECT a.media_id AS doc_a, b.media_id AS doc_b,
       |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
       |FROM dmedia a JOIN dmedia b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  private val ssspOracle: String = {
    def round(i: Int) =
      s"""d$i AS (
         |  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
         |    SELECT node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, p.dist + e.w AS dist
         |    FROM d${i - 1} p JOIN edges e ON p.node = e.src)
         |  GROUP BY node)""".stripMargin
    s"""WITH nn AS (SELECT count(*) AS c FROM documents),
       |edges AS (
       |  SELECT src, dst, 1 + (src + dst) % 7 AS w FROM (
       |    SELECT doc_id AS src, (doc_id * 31 + 97 * k.k) % (SELECT c FROM nn) AS dst
       |    FROM documents, (SELECT unnest([1, 2, 3]) AS k) k
       |    WHERE k.k <= 1 + doc_id % 3)),
       |d0 AS (SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist
       |  FROM documents WHERE doc_id % 50 = 0),
       |${(1 to 4).map(round).mkString(",\n")}
       |SELECT node, dist FROM d4 ORDER BY node""".stripMargin
  }

  /** The unigram-LM fixture corpus: each document's text plus its
    * fused-bigram compound words (space-stripped adjacent word pairs),
    * enriching the 31-word synthetic dictionary with a few hundred
    * compounds whose optimal segmentation is their constituent words.
    * [[unigramDocsSql]] replays the plant verbatim.
    */
  private def unigramDocs(s: SparkSession, dir: String): DataFrame =
    TestTables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        TextAnalysis.words(col("text")).as("__ws"))
      .select(col("doc_id"),
        concat(col("text"), lit(" "),
          array_join(transform(Dsir.bigrams(col("__ws")),
            g => replace(g, lit(" "), lit(""))), " ")).as("text"))

  private val unigramDocsSql: String =
    """SELECT doc_id, text || ' ' || coalesce(array_to_string(
      |    list_transform(range(1, len(ws)), i -> ws[i] || ws[i+1]), ' '), '') AS text
      |FROM (SELECT doc_id, text,
      |        list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
      |      FROM documents) t""".stripMargin

  /** Planted PII line shared by the q_text_pii_* pair, replayed
    * verbatim by [[piiPlantedSql]]: a dotted quad whose last octet
    * ranges over [0, 300) (invalid above 255), a card that is
    * Luhn-valid iff doc_id is even, a phone, an email.
    */
  private def piiPlanted: Column =
    concat(col("text"),
      lit(" ip 10."), (col("doc_id") % 256).cast("string"),
      lit("."), ((col("doc_id") * 7) % 256).cast("string"),
      lit("."), ((col("doc_id") * 13) % 300).cast("string"),
      lit(" card "),
      when(col("doc_id") % 2 === 0, lit("4111111111111111"))
        .otherwise(lit("4111111111111112")),
      lit(" tel 555-123-4567 mail u"), col("doc_id").cast("string"),
      lit("@example.org"))

  private val piiPlantedSql: String =
    "text || ' ip 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.' || " +
      "((doc_id * 13) % 300) || ' card ' || " +
      "CASE WHEN doc_id % 2 = 0 THEN '4111111111111111' ELSE '4111111111111112' END || " +
      "' tel 555-123-4567 mail u' || doc_id || '@example.org'"

  /** DuckDB replay of [[TextAnalysis.luhnValid]] over candidate `c`
    * (range(1, n+1) is end-exclusive = Spark's inclusive sequence(1, n)).
    */
  private def luhnSql(c: String): String = {
    val d = s"CAST(substring(reverse($c), i, 1) AS INT)"
    s"list_sum(list_transform(range(1, len($c) + 1), i -> " +
      s"CASE WHEN i % 2 = 0 THEN CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END " +
      s"ELSE $d END)) % 10 = 0"
  }

  /** DuckDB replay of [[TextAnalysis.validIpv4]] (string_split's
    * separator is a plain string where Spark's split takes a regex —
    * both cut on the literal dot).
    */
  private def ipOkSql(c: String): String =
    s"list_aggregate(list_transform(string_split($c, '.'), o -> CAST(o AS INT) <= 255), 'bool_and')"

  def oracleSql: Map[String, String] = Map(
    "q_unigram_vocab" ->
      UnigramLm.oracleSql(unigramDocsSql, 200, 8, 2, 100, "vocab"),
    "q_unigram_segment" ->
      UnigramLm.oracleSql(unigramDocsSql, 200, 8, 2, 100, "segment"),
    "q_unigram_tokens" ->
      UnigramLm.oracleSql(unigramDocsSql, 200, 8, 2, 100, "tokens"),

    "q_text_pii_stats" ->
      s"""WITH p AS (SELECT doc_id, $piiPlantedSql AS t FROM documents),
         |c AS (SELECT doc_id, t,
         |  regexp_extract_all(t, '${TextAnalysis.ipv4Pattern}') AS ipc,
         |  regexp_extract_all(t, '${TextAnalysis.ccCandidatePattern}') AS ccc FROM p)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '${TextAnalysis.emailPattern}')) AS n_emails,
         |  len(regexp_extract_all(t, '${TextAnalysis.phonePattern}')) AS n_phones,
         |  len(ipc) AS n_ip_candidates,
         |  len(list_filter(ipc, c -> ${ipOkSql("c")})) AS n_ip_valid,
         |  len(ccc) AS n_cc_candidates,
         |  len(list_filter(ccc, c -> ${luhnSql("c")})) AS n_cc_valid
         |FROM c ORDER BY doc_id""".stripMargin,

    "q_text_pii_redact" ->
      s"""WITH p AS (SELECT doc_id, $piiPlantedSql AS t FROM documents),
         |v AS (SELECT doc_id, t,
         |  list_filter(regexp_extract_all(t, '${TextAnalysis.ccCandidatePattern}'), c -> ${luhnSql("c")}) AS ccv,
         |  list_filter(regexp_extract_all(t, '${TextAnalysis.ipv4Pattern}'), c -> ${ipOkSql("c")}) AS ipv FROM p),
         |r1 AS (SELECT doc_id, ipv,
         |  list_reduce(list_prepend(t, ccv), (acc, x) -> replace(acc, x, '[CC]')) AS t FROM v),
         |r2 AS (SELECT doc_id,
         |  list_reduce(list_prepend(t, ipv), (acc, x) -> replace(acc, x, '[IP]')) AS t FROM r1)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(t, '${TextAnalysis.emailPattern}', '[EMAIL]', 'g'),
         |                 '${TextAnalysis.phonePattern}', '[PHONE]', 'g') AS clean_text
         |FROM r2 ORDER BY doc_id""".stripMargin,

    "q_graph_pagerank" -> pagerankOracle,
    "q_graph_pagerank_bucketed" -> pagerankOracle,
    "q_graph_sssp" -> ssspOracle,
    "q_mm_dhash" -> dhashOracle,
    "q_mm_dhash_dedup" -> dhashDedupOracle,
    "q_mm_audio_frames" -> audioFramesOracle,
    "q_mm_video_dhash" -> videoDhashOracle,
    "q_mm_video_dedup" -> videoDedupOracle,

    "q_text_dict_match" ->
      """WITH d AS (
        |  SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    list_sort(list_filter(
        |      ['the', 'and', 'data', 'system', 'error', 'lo', 'lorem',
        |       'or', 'qual', 'ipsum dolor'],
        |      p -> contains(t, p))) AS ms
        |  FROM d)
        |SELECT doc_id, coalesce(array_to_string(ms, ','), '') AS matched,
        |  CAST(len(ms) AS INT) AS n_matched
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_mm_audio_fingerprint" -> audioFingerprintOracle,
    "q_mm_audio_dedup" -> audioDedupOracle,
    "q_dedup_minhash" -> minhashXxhOracle,
    "q_dedup_minhash_shingled" -> minhashShingledXxhOracle,
    "q_dedup_simhash" -> simhashXxhOracle,
    "q_dedup_minhash_md5" -> minhashMd5Oracle,
    "q_dedup_minhash_md5_capped" -> minhashMd5CappedOracle,
    "q_dedup_minhash_shingled_md5" -> minhashShingledMd5Oracle,
    "q_dedup_incremental" -> incrementalDedupOracle,
    "q_pipeline_corpus" -> corpusCleanOracle,
    "q_pipeline_corpus_cc" -> corpusCleanOracle(ccSurvivor = true),
    "q_pipeline_pretrain" -> pretrainOracle,

    "q_pipeline_curriculum" -> {
      val scoreSql = Classifier.scoreDocsSql(Classifier.syntheticWeights(64), "cls0", 0L)
      s"""WITH scored AS (SELECT doc_id, score, keep FROM ($scoreSql)),
         |kept AS (SELECT doc_id, score FROM scored WHERE keep),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM kept),
         |ranked AS (
         |  SELECT doc_id, score, row_number() OVER (ORDER BY score, doc_id) - 1 AS rank
         |  FROM kept),
         |tiered AS (
         |  SELECT doc_id, score, rank * 10 // (SELECT n FROM nn) AS decile FROM ranked),
         |cop AS (
         |  SELECT doc_id, score, decile,
         |    CASE WHEN decile >= 8 THEN 2 WHEN decile >= 4 THEN 1
         |         WHEN substr(md5('cur' || '|' || CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
         |           THEN 1 ELSE 0 END AS copies
         |  FROM tiered)
         |SELECT doc_id, score, decile, CAST(t.i AS BIGINT) AS epoch
         |FROM cop, unnest(range(0, copies)) AS t(i)
         |ORDER BY doc_id, epoch""".stripMargin
    },

    "q_score_ranks" -> {
      val scoreSql = Classifier.scoreDocsSql(Classifier.syntheticWeights(64), "cls0", 0L)
      s"""WITH scored AS (SELECT doc_id, score FROM ($scoreSql)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
         |ranked AS (
         |  SELECT doc_id, score,
         |    row_number() OVER (ORDER BY score, doc_id) - 1 AS rank
         |  FROM scored)
         |SELECT doc_id, score, rank,
         |  rank * 10000 // ((SELECT n FROM nn) - 1) AS pct_bp,
         |  rank * 10 // (SELECT n FROM nn) AS decile
         |FROM ranked ORDER BY doc_id""".stripMargin
    },

    "q_negative_sample" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |a AS (SELECT doc_id AS anchor, md5(text) AS a_fp FROM documents),
        |c AS (SELECT doc_id AS neg_id, md5(text) AS n_fp FROM documents),
        |draws AS (
        |  SELECT anchor, a_fp, j,
        |    CAST(('0x' || substr(md5('neg0' || '|' || CAST(anchor AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
        |      % (SELECT n FROM nn) AS cand
        |  FROM a, (SELECT unnest(range(0, 8)) AS j) r),
        |surv AS (
        |  SELECT d.anchor, d.j, c.neg_id,
        |    row_number() OVER (PARTITION BY d.anchor ORDER BY d.j) AS neg_rank
        |  FROM draws d JOIN c ON d.cand = c.neg_id
        |  WHERE c.neg_id <> d.anchor AND c.n_fp <> d.a_fp)
        |SELECT anchor, CAST(neg_rank AS INT) AS neg_rank, CAST(j AS INT) AS j, neg_id
        |FROM surv WHERE neg_rank <= 4
        |ORDER BY anchor, neg_rank""".stripMargin,

    "q_mm_avi_transcode" ->
      """WITH d AS (
        |  SELECT doc_id, 8 + doc_id % 6 AS w, 6 + doc_id % 5 AS h,
        |    (2 + doc_id % 4 + 1) // 2 AS nf2
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, f.f, j.j,
        |    (doc_id * 31 + (f.f * 2) * 11 + j.j * 7) % 256 AS v
        |  FROM d,
        |  LATERAL (SELECT unnest(range(0, d.nf2)) AS f) f,
        |  LATERAL (SELECT unnest(range(0, d.w * d.h * 3)) AS j) j),
        |agg AS (
        |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS sum_px,
        |    CAST(sum((f + 1) * v) AS BIGINT) AS frame_weighted,
        |    CAST(sum(v * (j % 251)) AS BIGINT) AS px_weighted
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(6 AS INT) AS fps, CAST(nf2 AS INT) AS n_frames,
        |  CAST(w * h * nf2 AS BIGINT) AS n_px, sum_px, frame_weighted, px_weighted,
        |  CAST(sum_px AS DOUBLE) / CAST(w * h * 3 * nf2 AS DOUBLE) AS mean_px
        |FROM d JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY media_id""".stripMargin,

    "q_mm_bmp_resize" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        |px AS (
        |  SELECT doc_id, j,
        |    (doc_id * 31
        |      + ((((j // 3) // 4) * h // 4 * w + ((j // 3) % 4) * w // 4) * 3 + (j % 3)) * 7) % 256 AS v
        |  FROM d, (SELECT unnest(range(0, 48)) AS j) r),
        |agg AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN j % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
        |    CAST(sum(CASE WHEN j % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
        |    CAST(sum(CASE WHEN j % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
        |    CAST(sum(v * (j % 251)) AS BIGINT) AS px_weighted
        |  FROM px GROUP BY doc_id)
        |SELECT doc_id AS media_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
        |  CAST(16 AS BIGINT) AS n_px, sum_r, sum_g, sum_b, px_weighted,
        |  CAST(sum_r + sum_g + sum_b AS DOUBLE) / CAST(48 AS DOUBLE) AS mean_px
        |FROM agg ORDER BY media_id""".stripMargin,

    "q_mm_wav_transcode" ->
      """WITH d AS (SELECT doc_id, 400 + (doc_id % 5) * 200 AS n FROM documents),
        |s AS (SELECT doc_id, n, i, ((doc_id * 31 + i * 7) % 2048) - 1024 AS v
        |      FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d)),
        |blk AS (
        |  SELECT doc_id, n, i // 2 AS j, CAST(sum(v) AS BIGINT) AS block_sum
        |  FROM s GROUP BY doc_id, n, i // 2),
        |proc AS (
        |  SELECT doc_id, n,
        |    greatest(-32768, least(32767,
        |      CAST(floor(CAST(floor(block_sum / 2.0) AS BIGINT) * 81 / 2.0) AS BIGINT))) AS w
        |  FROM blk),
        |agg AS (SELECT doc_id, n, max(abs(w)) AS peak,
        |               CAST(sum(w * w) AS BIGINT) AS sum_sq
        |        FROM proc GROUP BY doc_id, n)
        |SELECT doc_id AS media_id, CAST(4000 AS INT) AS sample_rate,
        |  n // 2 AS n_samples, (n // 2) * 1000 // 4000 AS duration_ms, peak, sum_sq,
        |  sqrt(CAST(sum_sq AS DOUBLE) / CAST(n // 2 AS DOUBLE)) AS rms
        |FROM agg ORDER BY media_id""".stripMargin,

    "q_linkage_resolve" ->
      """WITH probe AS (
        |  SELECT c_custkey AS probe_key, substr(c_name, 1, length(c_name) - 1) AS typo
        |  FROM customer WHERE c_custkey <= 300),
        |cand AS (
        |  SELECT pr.probe_key, pr.typo, c.c_custkey AS match_key, c.c_name,
        |    CAST(levenshtein(pr.typo, c.c_name) AS INT) AS dist
        |  FROM probe pr JOIN customer c ON levenshtein(pr.typo, c.c_name) <= 1)
        |SELECT probe_key, typo, match_key AS resolved_key, c_name AS resolved_name, dist
        |FROM cand
        |QUALIFY row_number() OVER (PARTITION BY probe_key ORDER BY dist, match_key) = 1
        |ORDER BY probe_key""".stripMargin,

    "q_dedup_simhash_md5" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |docs AS (SELECT doc_id, text FROM base
        |         UNION ALL SELECT doc_id + 10000000, text || ' extraword' FROM base),
        |w AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS w
        |      FROM docs),
        |h AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS h FROM w),
        |bits AS (
        |  SELECT doc_id, r.b, CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END AS v
        |  FROM h, (SELECT unnest(range(0, 63)) AS b) r),
        |votes AS (SELECT doc_id, b, CAST(sum(v) AS BIGINT) AS vote FROM bits GROUP BY 1, 2),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sh
        |  FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 10
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_containment" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |docs AS (SELECT doc_id, text FROM base
        |         UNION ALL SELECT doc_id + 10000000, substr(text, 1, 200) FROM base),
        |wl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws FROM docs),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |       ELSE list_transform(range(1, len(ws) - 1), j -> ws[j] || ' ' || ws[j+1] || ' ' || ws[j+2]) END AS sg
        |  FROM wl),
        |tok AS (SELECT DISTINCT doc_id AS doc, unnest(sg) AS w FROM sh),
        |keep AS (SELECT w FROM tok GROUP BY w HAVING count(*) <= 1000),
        |tk AS (SELECT * FROM tok WHERE w IN (SELECT w FROM keep)),
        |cand AS (
        |  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        |  FROM tk a JOIN tk b ON a.w = b.w AND a.doc < b.doc),
        |sizes AS (SELECT doc_id AS doc, CAST(len(list_distinct(sg)) AS BIGINT) AS n FROM sh),
        |inter AS (
        |  SELECT ta.doc AS doc_a, tb.doc AS doc_b, count(*) AS c
        |  FROM cand JOIN tok ta ON ta.doc = cand.doc_a
        |            JOIN tok tb ON tb.doc = cand.doc_b AND tb.w = ta.w
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, c, sa.n AS na, sb.n AS nb,
        |  (c * 5 >= 4 * sa.n) AS a_in_b, (c * 5 >= 4 * sb.n) AS b_in_a
        |FROM inter JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
        |WHERE (c * 5 >= 4 * sa.n) OR (c * 5 >= 4 * sb.n)
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_gopher_rules" -> {
      val fixtureSql =
        """CASE WHEN doc_id % 13 = 0 THEN '- alpha beta' || chr(10) || '- gamma delta' || chr(10) || '- epsilon zeta'
          |     WHEN doc_id % 13 = 1 THEN 'a aa b bb c cc d dd e ee'
          |     WHEN doc_id % 13 = 2 THEN '1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 the of'
          |     ELSE (CASE WHEN doc_id % 3 = 0 THEN '# # # # #' || chr(10) ELSE '' END) ||
          |       (CASE WHEN doc_id % 7 = 0 THEN 'trailing thought...' || chr(10) || 'another one…' || chr(10) ELSE '' END) ||
          |       (CASE WHEN doc_id % 11 <> 0 THEN 'the story goes that we have to be of and with them' || chr(10) ELSE '' END) ||
          |       (CASE WHEN doc_id % 2 = 0 THEN text ELSE substr(text, 1, 120) END)
          |END""".stripMargin
      s"""WITH m AS (SELECT doc_id, $fixtureSql AS txt FROM documents)
         |${Gopher.rulesSql("m", "doc_id", Gopher.Config(minWords = 50))}
         |ORDER BY doc_id""".stripMargin
    },

    "q_text_nfc" ->
      """WITH r AS (
        |  SELECT doc_id, substr(text, 1, 16) || ' e' || chr(769) || ' ' || chr(233)
        |    || ' A' || chr(778) || ' ' || chr(4352) || chr(4449) AS raw
        |  FROM documents)
        |SELECT doc_id, CAST(length(raw) AS BIGINT) AS raw_len,
        |  nfc_normalize(raw) AS norm,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS norm_len
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_quality_classifier" ->
      Classifier.scoreDocsSql(Classifier.syntheticWeights(64), salt = "cls0", threshold = 0L),
    "q_classifier_train" -> Classifier.trainOracleSql(
      """SELECT doc_id,
        |    coalesce(text, '') || CASE WHEN doc_id % 2 = 0
        |      THEN ' qualgood qualgood qualgood' ELSE ' qualbad qualbad qualbad' END AS text,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS y
        |  FROM documents""".stripMargin,
      dim = 64, salt = "clstr", iters = 6),
    "q_classifier_train_gate" -> Classifier.trainGateOracleSql(
      """SELECT doc_id,
        |    coalesce(text, '') || CASE WHEN doc_id % 2 = 0
        |      THEN ' qualgood qualgood qualgood' ELSE ' qualbad qualbad qualbad' END AS text,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS y
        |  FROM documents""".stripMargin,
      dim = 64, salt = "clstr", iters = 6),
    "q_bpe_learn" -> Bpe.oracleSql(10, mergeTable = true),
    "q_bpe_apply" -> Bpe.oracleSql(10, mergeTable = false),

    "q_pipeline_tokenize" -> {
      val vocabValues = subwordVocab.map(p => s"('$p')").mkString(",")
      s"""WITH RECURSIVE vocab(piece) AS (SELECT * FROM (VALUES $vocabValues) v),
         |words AS (
         |  SELECT DISTINCT w FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
         |  WHERE w <> ''),
         |steps AS (
         |  SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS pieces, false AS fail FROM words
         |  UNION ALL
         |  SELECT s.w,
         |    CASE WHEN m.stem IS NULL THEN length(s.w) + 1 ELSE s.pos + length(m.stem) END,
         |    CASE WHEN m.stem IS NULL THEN ['[UNK]'] ELSE array_append(s.pieces, m.piece) END,
         |    (m.stem IS NULL)
         |  FROM steps s
         |  LEFT JOIN LATERAL (
         |    SELECT piece, stem FROM (
         |      SELECT v.piece, CASE WHEN s.pos = 1 THEN v.piece ELSE substr(v.piece, 3) END AS stem
         |      FROM vocab v WHERE ((s.pos = 1) = (v.piece NOT LIKE '##%'))) vv
         |    WHERE substr(s.w, s.pos, length(vv.stem)) = vv.stem
         |    ORDER BY length(vv.stem) DESC, vv.piece LIMIT 1) m ON true
         |  WHERE s.pos <= length(s.w) AND NOT s.fail),
         |toks AS (SELECT w, pieces FROM steps WHERE pos > length(w)),
         |counts AS (
         |  SELECT dw.doc_id, CAST(sum(len(t.pieces)) AS BIGINT) AS n_tokens
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) dw
         |  JOIN toks t ON dw.w = t.w
         |  WHERE dw.w <> '' GROUP BY dw.doc_id),
         |b AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(('0x' || substr(md5('tokpack' || '|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS bucket
         |  FROM counts),
         |c AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM b)
         |SELECT doc_id, bucket, CAST(floor((cum - n_tokens) / 256) AS BIGINT) AS bin, n_tokens
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "q_text_subword" -> {
      val vocabValues = subwordVocab.map(p => s"('$p')").mkString(",")
      s"""WITH RECURSIVE vocab(piece) AS (SELECT * FROM (VALUES $vocabValues) v),
         |words AS (
         |  SELECT DISTINCT w FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
         |  WHERE w <> ''),
         |steps AS (
         |  SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS pieces, false AS fail FROM words
         |  UNION ALL
         |  SELECT s.w,
         |    CASE WHEN m.stem IS NULL THEN length(s.w) + 1 ELSE s.pos + length(m.stem) END,
         |    CASE WHEN m.stem IS NULL THEN ['[UNK]'] ELSE array_append(s.pieces, m.piece) END,
         |    (m.stem IS NULL)
         |  FROM steps s
         |  LEFT JOIN LATERAL (
         |    SELECT piece, stem FROM (
         |      SELECT v.piece, CASE WHEN s.pos = 1 THEN v.piece ELSE substr(v.piece, 3) END AS stem
         |      FROM vocab v WHERE ((s.pos = 1) = (v.piece NOT LIKE '##%'))) vv
         |    WHERE substr(s.w, s.pos, length(vv.stem)) = vv.stem
         |    ORDER BY length(vv.stem) DESC, vv.piece LIMIT 1) m ON true
         |  WHERE s.pos <= length(s.w) AND NOT s.fail),
         |toks AS (SELECT w, pieces, fail FROM steps WHERE pos > length(w)),
         |docw AS (
         |  SELECT doc_id, unnest(ws) AS w, unnest(range(1, length(ws) + 1)) AS i
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d)
         |SELECT d.doc_id,
         |  count(*) AS n_words,
         |  CAST(sum(length(t.pieces)) AS BIGINT) AS n_pieces,
         |  CAST(sum(CASE WHEN t.fail THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
         |  string_agg(array_to_string(t.pieces, ' '), ' ' ORDER BY d.i) AS piece_text
         |FROM docw d JOIN toks t ON d.w = t.w
         |WHERE d.w <> ''
         |GROUP BY d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    "q_text_markdown" -> {
      val nl = "' || chr(10) || '"
      val md = ("'# Doc ' || doc_id || " +
        s"'$nl$nl**' || lang || '** and *' || source || " +
        s"'*$nl$nl> a quote$nl$nl- item [link](http://ex.com/' || doc_id || " +
        s"')$nl$nl" + "```" + s"${nl}code body$nl" + "```" + s"$nl$nl---$nl$nl' || text")
      s"""WITH m AS (SELECT doc_id, $md AS md FROM documents)
         |SELECT doc_id, ${graft.datapipe.Markdown.toTextSql("md")} AS clean
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "q_graph_degrees" ->
      """WITH nn AS (SELECT count(*) AS c FROM documents),
        |edges AS (
        |  SELECT doc_id AS src, (doc_id * 31 + 97 * k.k) % (SELECT c FROM nn) AS dst
        |  FROM documents, (SELECT unnest([1, 2, 3]) AS k) k
        |  WHERE k.k <= 1 + doc_id % 3),
        |d AS (
        |  SELECT 'out' AS kind, src AS node, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 2
        |  UNION ALL
        |  SELECT 'in', dst, CAST(count(*) AS BIGINT) FROM edges GROUP BY 2)
        |SELECT kind, deg, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM d GROUP BY kind, deg ORDER BY kind, deg""".stripMargin,

    "q_centroid_similarity" ->
      """WITH comp AS (
        |  SELECT vec_id % 4 AS grp, r.j AS dim,
        |    CAST(sum(CAST(floor(CAST(embedding[r.j + 1] AS DOUBLE) * 1048576.0) AS BIGINT)) AS BIGINT) AS q
        |  FROM embeddings, (SELECT unnest(range(0, 64)) AS j) r
        |  GROUP BY 1, 2),
        |norms AS (SELECT grp, CAST(sum(q * q) AS BIGINT) AS norm_q FROM comp GROUP BY 1),
        |dots AS (
        |  SELECT a.grp AS grp_a, b.grp AS grp_b, CAST(sum(a.q * b.q) AS BIGINT) AS dot_q
        |  FROM comp a JOIN comp b ON a.dim = b.dim AND a.grp < b.grp
        |  GROUP BY 1, 2)
        |SELECT grp_a, grp_b, dot_q, na.norm_q AS norm_a, nb.norm_q AS norm_b,
        |  CAST(dot_q AS DOUBLE) / (sqrt(CAST(na.norm_q AS DOUBLE)) * sqrt(CAST(nb.norm_q AS DOUBLE))) AS cosine
        |FROM dots JOIN norms na ON na.grp = grp_a JOIN norms nb ON nb.grp = grp_b
        |ORDER BY grp_a, grp_b""".stripMargin,

    "q_graph_khop" ->
      """WITH nn AS (SELECT count(*) AS c FROM documents),
        |e1 AS (
        |  SELECT DISTINCT doc_id AS src, (doc_id * 31 + 97 * k.k) % (SELECT c FROM nn) AS dst
        |  FROM documents, (SELECT unnest([1, 2, 3]) AS k) k
        |  WHERE k.k <= 1 + doc_id % 3),
        |e2 AS (SELECT DISTINCT a.src, b.dst FROM e1 a JOIN e1 b ON a.dst = b.src),
        |e3 AS (SELECT DISTINCT a.src, b.dst FROM e2 a JOIN e1 b ON a.dst = b.src),
        |r AS (SELECT src, dst FROM e1 UNION SELECT src, dst FROM e2 UNION SELECT src, dst FROM e3)
        |SELECT src, CAST(count(*) AS BIGINT) AS n_reachable
        |FROM r GROUP BY src ORDER BY src""".stripMargin,

    "q_graph_triangles" ->
      """WITH nn AS (SELECT count(*) AS c FROM documents),
        |raw AS (
        |  SELECT doc_id AS s, (doc_id + 1) % (SELECT c FROM nn) AS d FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id + 2) % (SELECT c FROM nn) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 31 + 97) % (SELECT c FROM nn) FROM documents),
        |e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s <> d),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |corners AS (
        |  SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri)
        |SELECT d.doc_id AS node, CAST(coalesce(t.n, 0) AS BIGINT) AS n_triangles
        |FROM documents d
        |LEFT JOIN (SELECT node, count(*) AS n FROM corners GROUP BY node) t
        |  ON d.doc_id = t.node
        |ORDER BY node""".stripMargin,

    "q_fuzzy_join" ->
      """WITH probe AS (
        |  SELECT p_partkey AS probe_key,
        |    substr(p_name, 1, 7) || substr(p_name, 9) AS typo
        |  FROM part WHERE p_partkey <= 200)
        |SELECT pr.probe_key, pr.typo, p.p_partkey AS match_key, p.p_name,
        |  CAST(levenshtein(pr.typo, p.p_name) AS INT) AS dist
        |FROM probe pr JOIN part p ON levenshtein(pr.typo, p.p_name) <= 1
        |ORDER BY pr.probe_key, match_key""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS kept_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    // Candidates meet through the df-pruned index; the reported
    // jaccard is the TRUE intersection over the full word sets (the
    // engine verifies candidates, pruning never changes a score).
    "q_dedup_jaccard" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |tok AS (
        |  SELECT DISTINCT doc_id AS doc, w
        |  FROM docs, unnest(string_split_regex(lower(text), '\s+')) AS t(w) WHERE w <> ''),
        |keep AS (SELECT w FROM tok GROUP BY w HAVING count(*) <= 1000),
        |tk AS (SELECT * FROM tok WHERE w IN (SELECT w FROM keep)),
        |cand AS (
        |  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        |  FROM tk a JOIN tk b ON a.w = b.w AND a.doc < b.doc),
        |inter AS (
        |  SELECT ta.doc AS doc_a, tb.doc AS doc_b, count(*) AS c
        |  FROM cand JOIN tok ta ON ta.doc = cand.doc_a
        |            JOIN tok tb ON tb.doc = cand.doc_b AND tb.w = ta.w
        |  GROUP BY ta.doc, tb.doc),
        |sizes AS (
        |  SELECT doc_id AS doc, len(list_distinct(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS n
        |  FROM docs)
        |SELECT doc_a, doc_b, CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc = doc_a
        |JOIN sizes sb ON sb.doc = doc_b
        |WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_text_stats" ->
      s"""SELECT doc_id,
         |  len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens_ws,
         |  len(regexp_extract_all(text, '${TextAnalysis.bpeishPattern}')) AS n_tokens_bpe,
         |  len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
         |  len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w IN ($stopwordsIn))) AS n_stopwords,
         |  ${TextAnalysis.qualityScoreSql} AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_langid" -> {
      val hits = TextAnalysis.langMarkers.map { case (lang, ms) => lang -> langHitsSql(ms) }
      val best = "greatest(" + hits.map(h => s"(${h._2})").mkString(", ") + ")"
      val cases = hits.map { case (lang, h) => s"WHEN ($h) = __best THEN '$lang'" }.mkString(" ")
      s"""SELECT doc_id, lang AS lang_labeled,
         |  CASE WHEN __best <= 0 THEN 'und' $cases ELSE 'und' END AS lang_detected
         |FROM (SELECT doc_id, lang, text, $best AS __best FROM documents) t
         |ORDER BY doc_id""".stripMargin
    },

    "q_langid_confusion" -> {
      val hits = TextAnalysis.langMarkers.map { case (lang, ms) => lang -> langHitsSql(ms) }
      val best = "greatest(" + hits.map(h => s"(${h._2})").mkString(", ") + ")"
      val cases = hits.map { case (lang, h) => s"WHEN ($h) = __best THEN '$lang'" }.mkString(" ")
      s"""WITH p AS (
         |  SELECT lang AS actual,
         |    CASE WHEN __best <= 0 THEN 'und' $cases ELSE 'und' END AS predicted
         |  FROM (SELECT lang, text, $best AS __best FROM documents) t)
         |SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
         |FROM p GROUP BY actual, predicted
         |ORDER BY actual, predicted""".stripMargin
    },

    "q_text_repetition" ->
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |sh AS (SELECT doc_id, ws, ${shinglesSql("ws")} AS sg FROM w),
         |top AS (
         |  SELECT doc_id, max(c) AS top_c FROM (
         |    SELECT doc_id, g, count(*) AS c FROM sh, unnest(sg) AS t(g) GROUP BY doc_id, g)
         |  GROUP BY doc_id)
         |SELECT sh.doc_id, len(ws) AS n_words,
         |  CASE WHEN len(ws) = 0 THEN CAST(0.0 AS DOUBLE)
         |       ELSE CAST(1.0 AS DOUBLE) - CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE) END AS dup_word_frac,
         |  CAST(1.0 AS DOUBLE) - CAST(len(list_distinct(sg)) AS DOUBLE) / CAST(len(sg) AS DOUBLE) AS dup_trigram_frac,
         |  CAST(top_c AS DOUBLE) / CAST(len(sg) AS DOUBLE) AS top_trigram_frac
         |FROM sh JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_text_redact" -> {
      val planted = s"text || ' contact user' || doc_id || '@example.com or 555-123-4567 now'"
      s"""SELECT doc_id,
         |  len(regexp_extract_all($planted, '${TextAnalysis.emailPattern}')) AS n_emails,
         |  len(regexp_extract_all($planted, '${TextAnalysis.phonePattern}')) AS n_phones,
         |  regexp_replace(regexp_replace($planted, '${TextAnalysis.emailPattern}', '[EMAIL]', 'g'),
         |                 '${TextAnalysis.phonePattern}', '[PHONE]', 'g') AS clean_text
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_mm_bmp_roundtrip" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        |px AS (SELECT doc_id, w, h, i, (doc_id * 31 + i * 7) % 256 AS v
        |       FROM (SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS i FROM d)),
        |agg AS (SELECT doc_id, w, h,
        |          CAST(sum(v) FILTER (i % 3 = 0) AS BIGINT) AS sum_r,
        |          CAST(sum(v) FILTER (i % 3 = 1) AS BIGINT) AS sum_g,
        |          CAST(sum(v) FILTER (i % 3 = 2) AS BIGINT) AS sum_b,
        |          CAST(sum(v * (i % 251)) AS BIGINT) AS px_weighted,
        |          CAST(sum(v) AS BIGINT) AS sum_all
        |        FROM px GROUP BY doc_id, w, h)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_px, sum_r, sum_g, sum_b, px_weighted,
        |  CAST(sum_all AS DOUBLE) / CAST(w * h * 3 AS DOUBLE) AS mean_px
        |FROM agg ORDER BY media_id""".stripMargin,

    "q_mm_rle_roundtrip" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |           FROM documents WHERE doc_id % 10 = 0),
        |px AS (SELECT doc_id, w, h, i, i // w AS y, i % w AS x
        |       FROM (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM d)),
        |v AS (SELECT doc_id, w, h, i,
        |        CASE WHEN y % 3 = 2 THEN (doc_id + y + 13 * x) % 256
        |             ELSE (doc_id * 31 + 7 * y + x // 4) % 256 END AS v
        |      FROM px),
        |agg AS (SELECT doc_id, w, h,
        |          CAST(sum(v) AS BIGINT) AS sum_px,
        |          CAST(sum(v * (i % 251)) AS BIGINT) AS px_weighted
        |        FROM v GROUP BY doc_id, w, h)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_px, sum_px, px_weighted,
        |  CAST(sum_px AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_px
        |FROM agg ORDER BY media_id""".stripMargin,

    "q_mm_avi_roundtrip" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 6 AS w, 6 + doc_id % 5 AS h, 2 + doc_id % 4 AS nf
        |           FROM documents WHERE doc_id % 10 = 0),
        |fr AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f FROM d),
        |px AS (SELECT doc_id, w, h, nf, f, j, (doc_id * 31 + f * 11 + j * 7) % 256 AS v
        |       FROM (SELECT doc_id, w, h, nf, f, unnest(range(0, w * h * 3)) AS j FROM fr)),
        |agg AS (SELECT doc_id, w, h, nf,
        |          CAST(sum(v) AS BIGINT) AS sum_px,
        |          CAST(sum((f + 1) * v) AS BIGINT) AS frame_weighted,
        |          CAST(sum(v * (j % 251)) AS BIGINT) AS px_weighted
        |        FROM px GROUP BY doc_id, w, h, nf)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(12 AS INT) AS fps, CAST(nf AS INT) AS n_frames,
        |  CAST(w * h * nf AS BIGINT) AS n_px, sum_px, frame_weighted, px_weighted,
        |  CAST(sum_px AS DOUBLE) / CAST(w * h * 3 * nf AS DOUBLE) AS mean_px
        |FROM agg ORDER BY media_id""".stripMargin,

    "q_mm_video_frames" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 6 AS w, 6 + doc_id % 5 AS h, 2 + doc_id % 4 AS nf
        |           FROM documents WHERE doc_id % 10 = 0),
        |fr AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM d),
        |sel AS (SELECT * FROM fr WHERE f % 2 = 0),
        |px AS (SELECT doc_id, w, h, f, j, (doc_id * 31 + f * 11 + j * 7) % 256 AS v
        |       FROM (SELECT doc_id, w, h, f, unnest(range(0, w * h * 3)) AS j FROM sel)),
        |agg AS (SELECT doc_id, w, h, f,
        |          CAST(sum(v) AS BIGINT) AS f_sum,
        |          CAST(sum(v * (j % 251)) AS BIGINT) AS f_weighted
        |        FROM px GROUP BY doc_id, w, h, f)
        |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height, f_sum, f_weighted
        |FROM agg ORDER BY media_id, frame_idx""".stripMargin,

    "q_mm_wav_roundtrip" ->
      """WITH d AS (SELECT doc_id, 400 + (doc_id % 5) * 200 AS n FROM documents),
        |s AS (SELECT doc_id, n, ((doc_id * 31 + i * 7) % 2048) - 1024 AS v
        |      FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d)),
        |agg AS (SELECT doc_id, n, max(abs(v)) AS peak,
        |               CAST(sum(v * v) AS BIGINT) AS sum_sq
        |        FROM s GROUP BY doc_id, n)
        |SELECT doc_id AS media_id, CAST(8000 AS INT) AS sample_rate,
        |  n AS n_samples, n * 1000 // 8000 AS duration_ms, peak, sum_sq,
        |  sqrt(CAST(sum_sq AS DOUBLE) / CAST(n AS DOUBLE)) AS rms
        |FROM agg ORDER BY media_id""".stripMargin,

    "q_text_boilerplate" ->
      """WITH planted AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    CASE WHEN doc_id % 3 = 0 THEN '== corpus header ==' END,
        |    text,
        |    CASE WHEN doc_id % 2 = 0 THEN '(c) 2026 corpus footer' END,
        |    CASE WHEN doc_id % 97 = 0 THEN 'limited time offer - subscribe now' END) AS text
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, generate_subscripts(l, 1) AS ord, unnest(l) AS line
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM planted)),
        |hashed AS (SELECT doc_id, ord, line, md5(trim(lower(line))) AS h FROM lines),
        |bp AS (
        |  SELECT h FROM hashed WHERE trim(line) <> '' GROUP BY h
        |  HAVING CAST(count(DISTINCT doc_id) AS DOUBLE)
        |         >= (SELECT CAST(count(*) AS DOUBLE) FROM documents) * CAST(0.25 AS DOUBLE)),
        |kept AS (SELECT * FROM hashed WHERE h NOT IN (SELECT h FROM bp)),
        |clean AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(c.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN clean c ON d.doc_id = c.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_decontaminate" ->
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |sh AS (SELECT doc_id, ${shinglesSql("ws")} AS sg FROM w),
         |bench AS (SELECT DISTINCT g FROM sh, unnest(sg) AS t(g) WHERE doc_id % 25 = 7),
         |corp AS (SELECT doc_id AS doc, unnest(list_distinct(sg)) AS g FROM sh WHERE doc_id % 25 <> 7),
         |ov AS (
         |  SELECT doc, count(*) AS n_shingles,
         |    count(*) FILTER (g IN (SELECT g FROM bench)) AS n_matched
         |  FROM corp GROUP BY doc)
         |SELECT doc, n_shingles, n_matched,
         |  CAST(n_matched AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS overlap,
         |  CAST(n_matched AS DOUBLE) / CAST(n_shingles AS DOUBLE) >= CAST(0.15 AS DOUBLE) AS contaminated
         |FROM ov ORDER BY doc""".stripMargin,

    "q_corpus_report" ->
      s"""WITH d AS (
         |  SELECT source, lang,
         |    CAST($tokensWsSqlData AS BIGINT) AS t,
         |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS p,
         |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w IN ($stopwordsIn))) AS BIGINT) AS st,
         |    CAST(length(text) AS BIGINT) AS c,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |g AS (
         |  SELECT source, lang, count(*) AS n_docs,
         |    CAST(sum(t) AS BIGINT) AS n_tokens, CAST(sum(c) AS BIGINT) AS n_chars,
         |    count(DISTINCT fp) AS uniq_docs,
         |    CAST(sum(st) AS BIGINT) AS n_stop, CAST(sum(p) AS BIGINT) AS n_punct
         |  FROM d GROUP BY source, lang)
         |SELECT source, lang, n_docs, n_tokens, n_chars, n_docs - uniq_docs AS dup_docs,
         |  CAST(n_stop AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(2.0 AS DOUBLE)
         |    - CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(4.0 AS DOUBLE) AS corpus_quality
         |FROM g ORDER BY source, lang""".stripMargin,

    "q_corpus_top_terms" ->
      s"""WITH w AS (SELECT lang, unnest($wordsSql) AS term FROM documents),
         |counts AS (SELECT lang, term, count(*) AS cnt FROM w GROUP BY lang, term),
         |r AS (SELECT lang, term, cnt,
         |  CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS INT) AS rank
         |  FROM counts)
         |SELECT lang, rank, term, cnt FROM r WHERE rank <= 8
         |ORDER BY lang, rank""".stripMargin,

    "q_corpus_top_langs_by_tokens" ->
      s"""WITH d AS (SELECT source, lang, CAST($tokensWsSqlData AS BIGINT) AS w FROM documents),
         |c AS (SELECT source, lang, CAST(sum(w) AS BIGINT) AS n_tokens FROM d GROUP BY source, lang),
         |r AS (SELECT source, lang, n_tokens,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY n_tokens DESC, lang) AS INT) AS rank
         |  FROM c)
         |SELECT source, rank, lang, n_tokens FROM r WHERE rank <= 4
         |ORDER BY source, rank""".stripMargin,

    "q_text_collocations" ->
      s"""WITH wl AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |w AS (SELECT unnest(ws) AS w FROM wl),
         |uni AS (SELECT w, count(*) AS c FROM w GROUP BY w),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni),
         |bi0 AS (SELECT unnest(${shinglesSql("ws", 2)}) AS bigram FROM wl),
         |bi AS (SELECT bigram, count(*) AS c_ab FROM bi0 GROUP BY bigram HAVING count(*) >= 5),
         |b2 AS (SELECT bigram, c_ab, string_split(bigram, ' ') AS parts FROM bi),
         |b3 AS (SELECT bigram, c_ab, parts[1] AS wa, parts[2] AS wb FROM b2 WHERE len(parts) = 2)
         |SELECT bigram, c_ab, ua.c AS c_a, ub.c AS c_b,
         |  (CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE))
         |    / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS lift
         |FROM b3 JOIN uni ua ON ua.w = wa JOIN uni ub ON ub.w = wb, tot
         |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin,

    "q_text_chunk" ->
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |c AS (SELECT doc_id, ws,
         |  CAST(ceil(CAST(greatest(len(ws) - 32, 0) AS DOUBLE) / CAST(24.0 AS DOUBLE)) AS INT) + 1 AS nch
         |  FROM w)
         |SELECT doc_id, CAST(i AS INT) AS chunk_id,
         |  array_to_string(list_slice(ws, i * 24 + 1, i * 24 + 32), ' ') AS chunk
         |FROM c, unnest(range(0, nch)) AS t(i)
         |ORDER BY doc_id, chunk_id""".stripMargin,

    "q_text_lm_score" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE text IS NOT NULL),
        |tri AS (SELECT doc_id, substr(t, CAST(i AS INT), 3) AS g
        |        FROM (SELECT doc_id, t, unnest(range(1, length(t) - 1)) AS i FROM d)),
        |big AS (SELECT substr(t, CAST(i AS INT), 2) AS g
        |        FROM (SELECT t, unnest(range(1, length(t))) AS i FROM d)),
        |uni AS (SELECT substr(t, CAST(i AS INT), 1) AS ch
        |        FROM (SELECT t, unnest(range(1, length(t) + 1)) AS i FROM d)),
        |c3 AS (SELECT g, count(*) AS c3 FROM tri GROUP BY g),
        |c2 AS (SELECT g, count(*) AS c2 FROM big GROUP BY g),
        |a AS (SELECT count(DISTINCT ch) AS alpha FROM uni),
        |sc AS (SELECT tri.doc_id,
        |         (1000000000 * (coalesce(c3.c3, 0) + 1)) // (coalesce(c2.c2, 0) + alpha) AS q
        |       FROM tri LEFT JOIN c3 USING (g)
        |         LEFT JOIN c2 ON substr(tri.g, 1, 2) = c2.g
        |         CROSS JOIN a),
        |agg AS (SELECT doc_id, count(*) AS n_tri, sum(q) AS lm_q FROM sc GROUP BY doc_id)
        |SELECT doc_id AS doc, CAST(n_tri AS BIGINT) AS n_tri, CAST(lm_q AS BIGINT) AS lm_q,
        |  CAST(lm_q AS DOUBLE) / CAST(n_tri AS DOUBLE) / CAST(1000000000 AS DOUBLE) AS lm_mean
        |FROM agg ORDER BY doc""".stripMargin,

    "q_text_dup_spans" ->
      s"""WITH base AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |b AS (SELECT doc_id, ws, len(ws) AS nw FROM base),
         |sh AS (SELECT doc_id, CAST(i AS INT) AS pos,
         |         array_to_string(list_slice(ws, CAST(i + 1 AS INT), CAST(i + 5 AS INT)), ' ') AS g
         |       FROM b, unnest(range(0, greatest(nw - 4, 0))) t(i)),
         |cnts AS (SELECT g, count(*) AS c FROM sh GROUP BY g),
         |dup AS (SELECT doc_id, pos FROM sh JOIN cnts USING (g) WHERE c >= 2),
         |spans AS (SELECT doc_id, count(*) AS n_dup_spans FROM dup GROUP BY doc_id),
         |cov AS (SELECT DISTINCT doc_id, CAST(p AS INT) AS p
         |        FROM dup, unnest(range(pos, pos + 5)) t(p)),
         |covn AS (SELECT doc_id, count(*) AS covered FROM cov GROUP BY doc_id),
         |wordpos AS (SELECT doc_id, CAST(j AS INT) AS j,
         |              list_extract(ws, CAST(j + 1 AS INT)) AS wd
         |            FROM b, unnest(range(0, nw)) t(j)),
         |keep AS (SELECT wp.doc_id, wp.j, wp.wd FROM wordpos wp
         |         ANTI JOIN cov ON wp.doc_id = cov.doc_id AND wp.j = cov.p),
         |clean AS (SELECT doc_id, string_agg(wd, ' ' ORDER BY j) AS clean_text
         |          FROM keep GROUP BY doc_id)
         |SELECT b.doc_id AS doc, CAST(b.nw AS BIGINT) AS n_words,
         |  CAST(greatest(b.nw - 4, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(s.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
         |  CAST(coalesce(cn.covered, 0) AS BIGINT) AS covered_tokens,
         |  CASE WHEN b.nw = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(coalesce(cn.covered, 0) AS DOUBLE) / CAST(b.nw AS DOUBLE) END AS dup_frac,
         |  coalesce(c.clean_text, '') AS clean_text
         |FROM b LEFT JOIN spans s USING (doc_id)
         |  LEFT JOIN covn cn USING (doc_id)
         |  LEFT JOIN clean c USING (doc_id)
         |ORDER BY doc""".stripMargin,

    "q_text_html_extract" ->
      """WITH h AS (SELECT doc_id AS doc,
        |  '<html><head><title>Doc &amp; ' || CAST(doc_id AS VARCHAR) ||
        |  '</title><style>p{color:red}</style></head><body>' ||
        |  '<script type="text/javascript">var x="<p>no</p>";</script>' ||
        |  '<div class="nav"><a href="/home">Home</a><a href="/d?ref=r' || CAST(doc_id AS VARCHAR) ||
        |  '">Next</a></div><p>' ||
        |  replace(text, ' table ', ' &lt;table&gt; ') ||
        |  '</p><h2>End</h2><p>Tail&nbsp;para</p><!-- chrome --></body></html>' AS html
        |FROM documents),
        |s1 AS (SELECT doc, html, regexp_replace(regexp_replace(regexp_replace(html,
        |  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |  '(?is)<title[^>]*>.*?</title>', ' ', 'g') AS t FROM h),
        |s2 AS (SELECT doc, html, regexp_replace(t,
        |  '(?i)<br[^>]*>|</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote)>', ' ', 'g') AS t FROM s1),
        |s3 AS (SELECT doc, html, regexp_replace(regexp_replace(t,
        |  '(?s)<!--.*?-->', ' ', 'g'), '<[^>]*>', ' ', 'g') AS t FROM s2),
        |s4 AS (SELECT doc, html, replace(replace(replace(replace(replace(replace(t,
        |  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '),
        |  '&amp;', '&') AS t FROM s3),
        |s5 AS (SELECT doc, html, trim(regexp_replace(t, '\s+', ' ', 'g')) AS body_text FROM s4),
        |ti AS (SELECT doc, trim(replace(replace(replace(replace(replace(replace(
        |  regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1),
        |  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '),
        |  '&amp;', '&')) AS title FROM h),
        |lk AS (SELECT doc, regexp_extract_all(html, '(?i)href="([^"]*)"', 1) AS ls FROM h)
        |SELECT h.doc, ti.title, s5.body_text,
        |  array_to_string(lk.ls, ',') AS hrefs,
        |  CAST(len(lk.ls) AS BIGINT) AS n_links,
        |  CASE WHEN length(h.html) = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(length(s5.body_text) AS DOUBLE) / CAST(length(h.html) AS DOUBLE)
        |  END AS text_ratio
        |FROM h JOIN ti USING (doc) JOIN s5 USING (doc) JOIN lk USING (doc)
        |ORDER BY doc""".stripMargin,

    "q_url_domain_cap" ->
      """WITH u0 AS (SELECT doc_id AS doc, n_chars, source || '.com' AS domain FROM documents),
        |r AS (SELECT doc, domain, n_chars,
        |        row_number() OVER (PARTITION BY domain ORDER BY n_chars DESC, doc ASC) AS rn
        |      FROM u0)
        |SELECT doc, domain, CAST(n_chars AS BIGINT) AS n_chars
        |FROM r WHERE rn <= 5 ORDER BY domain, doc""".stripMargin,

    "q_phrase_search" ->
      s"""WITH b AS (SELECT doc_id, $wordsSql AS ws FROM documents),
         |ph AS (SELECT doc_id AS p_id, array_to_string(list_slice(ws, 1, 3), ' ') AS phrase
         |       FROM b WHERE doc_id % 100 = 17),
         |sh AS (SELECT doc_id AS doc,
         |         array_to_string(list_slice(ws, CAST(i + 1 AS INT), CAST(i + 3 AS INT)), ' ') AS g
         |       FROM (SELECT doc_id, ws, len(ws) AS nw FROM b) bb,
         |         unnest(range(0, greatest(nw - 2, 0))) t(i))
         |SELECT ph.p_id, sh.doc, CAST(count(*) AS BIGINT) AS n_hits
         |FROM ph JOIN sh ON sh.g = ph.phrase
         |GROUP BY ph.p_id, sh.doc ORDER BY p_id, doc""".stripMargin,

    "q_sem_dedup" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS id,
        |  CAST(count(*) - 1 AS BIGINT) AS n_dropped
        |FROM documents GROUP BY doc_id % 16 ORDER BY id""".stripMargin,

    "q_demo_sem_dedup_uncapped" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS id,
        |  CAST(count(*) - 1 AS BIGINT) AS n_dropped
        |FROM documents WHERE doc_id < 1000000000
        |GROUP BY doc_id % 16 ORDER BY id""".stripMargin,

    "q_text_url_parse" ->
      """WITH u0 AS (SELECT doc_id AS doc,
        |  'https://User@' ||
        |  CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
        |  source ||
        |  CASE WHEN doc_id % 4 = 0 THEN '.example.co.uk' ELSE '.example.com' END ||
        |  ':8080/docs/' || CAST(doc_id AS VARCHAR) ||
        |  '/page?x=1&ref=r' || CAST(doc_id % 7 AS VARCHAR) ||
        |  CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END AS u
        |FROM documents),
        |f AS (SELECT doc,
        |  regexp_extract(lower(u), '^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)', 1) AS host,
        |  regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
        |  regexp_extract(u, '[?&]ref=([^&#]*)', 1) AS ref,
        |  regexp_extract(u, '#(.*)$', 1) AS frag
        |FROM u0)
        |SELECT doc, host, path, ref, frag,
        |  CASE WHEN regexp_extract(host, '([^.]+\.(?:co|com|net|org|ac|gov|edu)\.[a-z][a-z])$', 1) <> ''
        |       THEN regexp_extract(host, '([^.]+\.(?:co|com|net|org|ac|gov|edu)\.[a-z][a-z])$', 1)
        |       ELSE regexp_extract(host, '([^.]+\.[^.]+)$', 1)
        |  END AS domain,
        |  regexp_extract(host, '\.([^.]+)$', 1) AS tld
        |FROM f ORDER BY doc""".stripMargin,

    "q_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
        |  FROM documents),
        |t2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, count(*) AS c FROM t2 GROUP BY 1
        |    ORDER BY c DESC, token LIMIT 100))
        |SELECT t2.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |FROM t2 LEFT JOIN vocab v ON t2.token = v.token
        |GROUP BY t2.doc_id ORDER BY doc_id""".stripMargin,

    "q_text_keywords" ->
      s"""WITH w AS (SELECT doc_id AS doc, unnest($wordsSql) AS term FROM documents),
         |tf AS (SELECT doc, term, count(*) AS tf FROM w GROUP BY doc, term),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc, term, tf, df,
         |    CAST(tf AS DOUBLE) * ((CAST(n_docs AS DOUBLE) + CAST(1.0 AS DOUBLE))
         |      / (CAST(df AS DOUBLE) + CAST(1.0 AS DOUBLE))) AS score
         |  FROM tf JOIN dfreq USING (term), n),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc ORDER BY score DESC, term) AS INT) AS rank
         |      FROM scored)
         |SELECT doc, rank, term, tf, df, score FROM r WHERE rank <= 3
         |ORDER BY doc, rank""".stripMargin,

    // Parenthesization in the score expression mirrors
    // Keywords.bm25TopK token for token — IEEE-identical by contract.
    "q_bm25_topk" ->
      s"""WITH w AS (SELECT doc_id AS doc, unnest($wordsSql) AS term FROM documents),
         |tf AS (SELECT doc, term, count(*) AS tf FROM w GROUP BY doc, term),
         |dl AS (SELECT doc, sum(tf) AS dl FROM tf GROUP BY doc),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
         |              (SELECT COALESCE(sum(tf), 0) FROM tf) AS l_total),
         |q AS (SELECT doc_id AS q_id, list_distinct(list_slice($wordsSql, 1, 8)) AS qts
         |      FROM documents WHERE doc_id % 50 = 13 AND doc_id < 1000000000),
         |qt AS (SELECT q_id, unnest(qts) AS term FROM q),
         |cand AS (SELECT qt.q_id, tf.doc, tf.tf, dfreq.df, dl.dl
         |         FROM qt JOIN tf USING (term) JOIN dfreq USING (term)
         |         JOIN dl ON dl.doc = tf.doc),
         |contrib AS (SELECT q_id, doc,
         |  CAST(floor(((((CAST(n_docs AS DOUBLE) + 1.0) * 22.0) * (CAST(tf AS DOUBLE) * CAST(l_total AS DOUBLE)))
         |    / ((CAST(df AS DOUBLE) + 1.0) * (((10.0 * CAST(tf AS DOUBLE)) * CAST(l_total AS DOUBLE))
         |        + ((3.0 * CAST(l_total AS DOUBLE)) + ((9.0 * CAST(dl AS DOUBLE)) * CAST(n_docs AS DOUBLE))))))
         |    * 1000000.0) AS BIGINT) AS c
         |  FROM cand, st),
         |sc AS (SELECT q_id, doc, CAST(sum(c) AS BIGINT) AS score FROM contrib GROUP BY q_id, doc),
         |r AS (SELECT q_id, doc, score,
         |      CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc) AS INT) AS rank FROM sc)
         |SELECT q_id, rank, doc, score FROM r WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // BM25 chain (identical to q_bm25_topk) + brute-force cosine chain
    // (identical to q_sim_bruteforce, query ids % 50 = 13) fused with
    // integer-quotient RRF — see Retrieval.rrfFuse scaladoc.
    "q_hybrid_rrf" ->
      s"""WITH w AS (SELECT doc_id AS doc, unnest($wordsSql) AS term FROM documents),
         |tf AS (SELECT doc, term, count(*) AS tf FROM w GROUP BY doc, term),
         |dl AS (SELECT doc, sum(tf) AS dl FROM tf GROUP BY doc),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
         |              (SELECT COALESCE(sum(tf), 0) FROM tf) AS l_total),
         |q AS (SELECT doc_id AS q_id, list_distinct(list_slice($wordsSql, 1, 8)) AS qts
         |      FROM documents WHERE doc_id % 50 = 13 AND doc_id < 1000000000),
         |qt AS (SELECT q_id, unnest(qts) AS term FROM q),
         |cand AS (SELECT qt.q_id, tf.doc, tf.tf, dfreq.df, dl.dl
         |         FROM qt JOIN tf USING (term) JOIN dfreq USING (term)
         |         JOIN dl ON dl.doc = tf.doc),
         |contrib AS (SELECT q_id, doc,
         |  CAST(floor(((((CAST(n_docs AS DOUBLE) + 1.0) * 22.0) * (CAST(tf AS DOUBLE) * CAST(l_total AS DOUBLE)))
         |    / ((CAST(df AS DOUBLE) + 1.0) * (((10.0 * CAST(tf AS DOUBLE)) * CAST(l_total AS DOUBLE))
         |        + ((3.0 * CAST(l_total AS DOUBLE)) + ((9.0 * CAST(dl AS DOUBLE)) * CAST(n_docs AS DOUBLE))))))
         |    * 1000000.0) AS BIGINT) AS c
         |  FROM cand, st),
         |sc AS (SELECT q_id, doc, CAST(sum(c) AS BIGINT) AS score FROM contrib GROUP BY q_id, doc),
         |lr AS (SELECT q_id, doc, CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc) AS INT) AS rank FROM sc),
         |lex AS (SELECT q_id, doc, rank FROM lr WHERE rank <= 10),
         |vq AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
         |       FROM embeddings WHERE vec_id % 50 = 13 AND vec_id < 1000000000),
         |vc AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
         |vs AS (SELECT q_id, n_id,
         |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cosine
         |  FROM vc CROSS JOIN vq WHERE q_id <> n_id),
         |vr AS (SELECT q_id, n_id AS doc,
         |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank FROM vs),
         |vec AS (SELECT q_id, doc, rank FROM vr WHERE rank <= 10),
         |u AS (SELECT q_id, doc, CAST(floor(1000000000.0 / (60.0 + CAST(rank AS DOUBLE))) AS BIGINT) AS c FROM lex
         |      UNION ALL
         |      SELECT q_id, doc, CAST(floor(1000000000.0 / (60.0 + CAST(rank AS DOUBLE))) AS BIGINT) AS c FROM vec),
         |f AS (SELECT q_id, doc, CAST(sum(c) AS BIGINT) AS score, count(*) AS n_systems FROM u GROUP BY q_id, doc),
         |fr AS (SELECT q_id, doc, score, n_systems,
         |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc) AS INT) AS rank FROM f)
         |SELECT q_id, rank, doc, score, n_systems FROM fr WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |  CASE WHEN len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) = 0 THEN NULL
        |       ELSE list_reduce(
        |              list_prepend('', list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')),
        |              (x, y) -> md5(x || y)) END AS rolling_fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_embed_quantize" ->
      """SELECT vec_id, mn AS qmin, mx AS qmax,
        |  CASE WHEN mx = mn THEN array_to_string(list_transform(emb, x -> 0), ',')
        |       ELSE array_to_string(list_transform(emb, x ->
        |              least(255, CAST(floor((CAST(x AS DOUBLE) - mn) * CAST(255.0 AS DOUBLE) / (mx - mn)) AS INT))), ',')
        |  END AS qcodes
        |FROM (SELECT vec_id, embedding AS emb,
        |        CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
        |        CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx
        |      FROM embeddings WHERE vec_id % 5 = 0) t
        |ORDER BY vec_id""".stripMargin,

    "q_sim_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 1000000000),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |scored AS (
        |  SELECT q_id, n_id,
        |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cosine
        |  FROM c CROSS JOIN q WHERE q_id <> n_id)
        |SELECT q_id, n_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
        |  FROM scored) t
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // LSH top-1 equals brute-force top-1 by the planted-twin guarantee:
    // each twin (×2-scaled, IEEE-exact) collides with its base in every
    // table and scores cosine ≈ 1.0 there, while the strongest natural
    // query-corpus cosine is ≤ 0.46 (measured) — so the heuristic
    // candidate set provably contains the global argmax and this oracle
    // is exact, not approximate.
    "q_sim_lsh_ann" ->
      """WITH q AS (
        |  SELECT vec_id + 10000000 AS q_id,
        |         CAST(list_transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 1000000000),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |scored AS (
        |  SELECT q_id, n_id,
        |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cosine
        |  FROM c CROSS JOIN q WHERE q_id <> n_id)
        |SELECT q_id, n_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
        |  FROM scored) t
        |WHERE rank <= 1 ORDER BY q_id, rank""".stripMargin,

    // IVF top-1: the twin's query-to-centroid cosines equal its base's
    // (exact scaling), and probe rank 1 (cos desc, cell asc) is exactly
    // the cell argmax the base was assigned to (same tie-break), so the
    // base's cell is always probed and top-1 = brute-force top-1 — the
    // same closed form as the LSH entry.
    "q_sim_ivf_ann" ->
      """WITH q AS (
        |  SELECT vec_id + 10000000 AS q_id,
        |         CAST(list_transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 1000000000),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |scored AS (
        |  SELECT q_id, n_id,
        |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cosine
        |  FROM c CROSS JOIN q WHERE q_id <> n_id)
        |SELECT q_id, n_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
        |  FROM scored) t
        |WHERE rank <= 1 ORDER BY q_id, rank""".stripMargin,

    "q_sim_ivf_incremental" ->
      """WITH q AS (
        |  SELECT vec_id + 10000000 AS q_id,
        |         CAST(list_transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 1000000000),
        |c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |scored AS (
        |  SELECT q_id, n_id,
        |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cosine
        |  FROM c CROSS JOIN q WHERE q_id <> n_id)
        |SELECT q_id, n_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
        |  FROM scored) t
        |WHERE rank <= 1 ORDER BY q_id, rank""".stripMargin,

    // Asymmetric quantized top-1: full-precision twins against the
    // dequantized int8 corpus. The dequantization replays Quantize's
    // fixed-order affine arithmetic (code = least(255, floor(((x−mn)·
    // 255)/(mx−mn))), back via mn + ((code+0.5)·(mx−mn))/255), so
    // every corpus vector — and hence every cosine — is reproduced
    // bit-for-bit; twin-vs-base scores ≈ 0.9999 vs ≤ 0.47 natural, so
    // top-1 is closed-form.
    "q_sim_quantized_ann" ->
      """WITH q AS (
        |  SELECT vec_id + 10000000 AS q_id,
        |         CAST(list_transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 1000000000),
        |qz AS (SELECT vec_id AS n_id,
        |         CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
        |         CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx,
        |         embedding AS emb
        |       FROM embeddings),
        |dq AS (SELECT n_id,
        |         CASE WHEN mx = mn THEN list_transform(emb, x -> mn)
        |              ELSE list_transform(emb, x ->
        |                CASE WHEN least(255, CAST(floor(((CAST(x AS DOUBLE) - mn) * CAST(255.0 AS DOUBLE)) / (mx - mn)) AS INT)) = 255 THEN mx
        |                     ELSE mn + ((CAST(least(255, CAST(floor(((CAST(x AS DOUBLE) - mn) * CAST(255.0 AS DOUBLE)) / (mx - mn)) AS INT)) AS DOUBLE) + CAST(0.5 AS DOUBLE)) * (mx - mn)) / CAST(255.0 AS DOUBLE) END)
        |         END AS nv
        |       FROM qz),
        |scored AS (
        |  SELECT q_id, n_id,
        |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cosine
        |  FROM dq CROSS JOIN q WHERE q_id <> n_id)
        |SELECT q_id, n_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
        |  FROM scored) t
        |WHERE rank <= 1 ORDER BY q_id, rank""".stripMargin,

    // Every pair with cosine ≥ 0.9 is a planted (base, twin) pair —
    // twins collide with their base in every LSH table (exact scaling
    // preserves all hyperplane signs) and all natural/cross cosines are
    // ≤ 0.46 (measured) — so the exhaustive pair scan below equals the
    // engine's bucketed candidate set exactly.
    "q_sim_cosine_dedup" ->
      """WITH s AS (SELECT vec_id AS doc, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id % 10 = 0),
        |t AS (SELECT vec_id + 10000000 AS doc,
        |        CAST(list_transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id % 10 = 0),
        |u AS (SELECT * FROM s UNION ALL SELECT * FROM t),
        |p AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
        |        list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
        |      FROM u a JOIN u b ON a.doc < b.doc)
        |SELECT doc_a, doc_b, cosine FROM p WHERE cosine >= CAST(0.9 AS DOUBLE)
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Star-fallback closed form: the 31-member planted cluster (base
    // vec 0 + 30 exact power-of-two copies) shares every bucket, always
    // exceeds the cap, and its bucket minimum is provably vec 0 — so
    // the engine emits exactly the (0, copy) star pairs and never a
    // copy-copy pair (the quadratic edge the cap suppresses). The
    // oracle mirrors that by excluding copy-copy pairs from the
    // exhaustive scan; all other pairs are ≤ 0.46 and filtered.
    "q_sim_cosine_dedup_capped" ->
      """WITH s AS (SELECT vec_id AS doc, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 1000000000),
        |cp AS (SELECT 20000000 + i AS doc,
        |         CAST(list_transform(e.embedding, x -> x * CAST(power(CAST(2.0 AS DOUBLE), CAST(i AS DOUBLE)) AS FLOAT)) AS DOUBLE[]) AS v
        |       FROM (SELECT unnest(range(1, 31)) AS i) ids,
        |            (SELECT embedding FROM embeddings WHERE vec_id = 0) e),
        |u AS (SELECT * FROM s UNION ALL SELECT * FROM cp),
        |p AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
        |        list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
        |      FROM u a JOIN u b ON a.doc < b.doc
        |      WHERE NOT (a.doc >= 20000000 AND b.doc >= 20000000))
        |SELECT doc_a, doc_b, cosine FROM p WHERE cosine >= CAST(0.9 AS DOUBLE)
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_mm_metadata" ->
      """SELECT doc_id AS media_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  CAST(n_chars % 60 + 1 AS INT) AS n_frames,
        |  CAST((CAST(doc_id % 640 + 32 AS BIGINT) * 224) // greatest(CAST(doc_id % 640 + 32 AS BIGINT), CAST(doc_id % 480 + 32 AS BIGINT)) AS INT) AS resized_w,
        |  CAST((CAST(doc_id % 480 + 32 AS BIGINT) * 224) // greatest(CAST(doc_id % 640 + 32 AS BIGINT), CAST(doc_id % 480 + 32 AS BIGINT)) AS INT) AS resized_h,
        |  CAST(doc_id % 640 + 32 AS DOUBLE) / CAST(doc_id % 480 + 32 AS DOUBLE) AS aspect
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
