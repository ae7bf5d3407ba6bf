package graft.datapipe

import graft.util.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous-ingest near-duplicate gating: match a new batch of
  * documents against the EXISTING corpus without re-hashing the corpus.
  *
  * The corpus is represented by its persisted MinHash band index (the
  * `Dedup.minhashBands` output, written once and appended to on every
  * ingest). A new batch hashes only itself — O(|batch|) work — and
  * candidates meet the index through shared band buckets, an ordinary
  * equi-join against a table that parquet prunes by band. This is the
  * 100-TB shape for "is this new document already in the training
  * set": per-batch cost scales with the batch, never the corpus.
  *
  * Oversized index buckets (an ultra-common signature — the corpus is
  * redundant en masse there) are represented by their minimum doc id
  * only: a new doc verifies against the representative instead of the
  * whole cluster, bounding per-bucket work at |batch ∩ bucket| × 1.
  */
object IncrementalDedup {

  /** Verified matches of `batch` against the corpus index: one row per
    * dropped new doc — `(new_doc, matched_corpus, jaccard)` with the
    * smallest matching corpus doc as the reported representative.
    * `corpusDocs` supplies text for true-Jaccard verification and is
    * read only for candidate-matched ids (semi-join pruned).
    */
  def matchesAgainst(batch: DataFrame, idCol: String, textCol: String,
                     corpusBands: DataFrame, corpusDocs: DataFrame,
                     minJaccard: Double, maxBucket: Int = 100,
                     numHashes: Int = 16, bands: Int = 4,
                     portable: Boolean = false, shingle: Int = 0): DataFrame = {
    val batchBands = Dedup.minhashBands(batch, idCol, textCol, numHashes, bands, portable, shingle)
    val sized = corpusBands.join(
      corpusBands.groupBy(col("band"), col("band_key"))
        .agg(count(lit(1)).as("__n"), min(col("doc")).as("__keep")),
      Seq("band", "band_key"))
    val index = sized.filter(col("__n") <= maxBucket || col("doc") === col("__keep"))
      .select(col("doc"), col("band"), col("band_key"))
    val cand = batchBands.as("b")
      .join(index.as("c"),
        col("b.band") === col("c.band") && col("b.band_key") === col("c.band_key"))
      .select(col("b.doc").as("new_doc"), col("c.doc").as("corpus_doc")).distinct()
    val bws = batch.select(col(idCol).as("new_doc"),
      array_distinct(Dedup.units(col(textCol), shingle)).as("bw"))
    val cws = corpusDocs
      .join(cand.select(col("corpus_doc")).distinct()
        .withColumnRenamed("corpus_doc", idCol), Seq(idCol), "left_semi")
      .select(col(idCol).as("corpus_doc"),
        array_distinct(Dedup.units(col(textCol), shingle)).as("cw"))
    cand.join(bws, Seq("new_doc")).join(cws, Seq("corpus_doc"))
      .withColumn("jaccard",
        size(array_intersect(col("bw"), col("cw"))).cast("double") /
          size(array_union(col("bw"), col("cw"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .groupBy(col("new_doc"))
      .agg(min(col("corpus_doc")).as("matched_corpus"),
        min_by(col("jaccard"), col("corpus_doc")).as("jaccard"))
  }

  /** One ingest step: returns (survivors, survivorBands). Survivors are
    * batch docs that match nothing in the index; their band rows are
    * what the caller appends to the persisted index (e.g. via
    * `Sinks.append` partitioned by band) so the next batch sees them.
    * Re-ingesting the same batch therefore drops every doc — the
    * idempotence that makes replayed ingest jobs safe.
    */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
             corpusBands: DataFrame, corpusDocs: DataFrame,
             minJaccard: Double, maxBucket: Int = 100,
             numHashes: Int = 16, bands: Int = 4,
             portable: Boolean = false, shingle: Int = 0): (DataFrame, DataFrame) = {
    val matched = matchesAgainst(batch, idCol, textCol, corpusBands, corpusDocs,
      minJaccard, maxBucket, numHashes, bands, portable, shingle)
    val survivors = batch.join(
      matched.select(col("new_doc").as(idCol)), Seq(idCol), "left_anti")
    val survivorBands = Dedup.minhashBands(survivors, idCol, textCol,
      numHashes, bands, portable, shingle)
    (survivors, survivorBands)
  }

  /** Continuous corpus ingest: each micro-batch of documents dedups
    * against the PERSISTED corpus (`docsPath` + `bandsPath` parquet
    * tables) and appends its survivors plus their band rows — the
    * streaming face of `ingest`.
    *
    * Exactly-once without a transactional table format: a replayed
    * micro-batch (checkpoint committed, sink crashed mid-append) finds
    * its own survivors already in the index and drops every doc, so
    * the docs table CONVERGES — ingest idempotence is the dedup sink's
    * exactly-once story, like key-idempotence is `upsertSink`'s. Band
    * rows are appended BEFORE docs: a crash between the two can only
    * leave bands whose doc text is missing, which the verification
    * join ignores (and the replay then re-appends both) — the reverse
    * order would re-admit a document whose bands were lost. Batch-
    * internal duplicates are the caller's concern (compose a corpus
    * clean upstream); this operator is strictly batch-vs-corpus.
    */
  def ingestSink(batches: DataFrame, idCol: String, textCol: String,
                 docsPath: String, bandsPath: String, checkpointDir: String,
                 minJaccard: Double, maxBucket: Int = 100,
                 numHashes: Int = 16, bands: Int = 4,
                 portable: Boolean = false, shingle: Int = 0): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // Resolve existence through the path's OWN filesystem (HDFS,
        // S3A, file:) — a java.io.File probe is local-only and would
        // silently route every batch down the no-corpus branch on a
        // real cluster, appending wholesale with no dedup.
        val docsHPath = new org.apache.hadoop.fs.Path(docsPath)
        val haveCorpus = docsHPath
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(docsHPath)
        val survivorPair =
          if (!haveCorpus) (batch, Dedup.minhashBands(batch, idCol, textCol, numHashes, bands, portable, shingle))
          else ingest(batch, idCol, textCol,
            spark.read.parquet(bandsPath), spark.read.parquet(docsPath),
            minJaccard, maxBucket, numHashes, bands, portable, shingle)
        // Materialize before appending: the survivors' lineage reads
        // the same paths the appends write to.
        val survivors = Materialize.once(survivorPair._1)
        val survivorBands = Materialize.once(survivorPair._2)
        graft.sink.Sinks.append(survivorBands, bandsPath)
        graft.sink.Sinks.append(survivors, docsPath)
      }
      .start()
}
