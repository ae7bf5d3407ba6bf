package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary induction + out-of-vocabulary coverage — the
  * pre-tokenizer feasibility check of a training-data pipeline: before
  * committing to a tokenizer vocabulary, measure what fraction of the
  * corpus a candidate top-N vocabulary actually covers, per document
  * (docs with high OOV rates are the ones a vocab change would break).
  *
  * Tokenization is the deterministic lowercase-alpha split shared with
  * the oracle (`[^a-z]+` on lowercased text) — both engines run the
  * same RE2∩Java regex, so token streams agree byte-for-byte.
  *
  * Scale shape: ONE corpus explode feeds the vocabulary count (token
  * shuffle with map-side partials); the induced vocab is top-N by
  * construction, so joining it back per-token is always a broadcast —
  * the per-doc OOV aggregation is the only other shuffle, keyed by
  * doc id. No driver collect of corpus data.
  */
object Vocab {

  /** Lowercase-alpha token array; empty tokens (leading/consecutive
    * separators) removed. Pure narrow Column.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), t => t =!= "")

  /** Top-`n` tokens by corpus frequency, ties broken lexicographically
    * — the deterministic cut every engine agrees on. Output: (token,
    * freq).
    */
  def topVocab(docs: DataFrame, text: Column, n: Int): DataFrame =
    docs.select(explode(tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(n)

  /** Per-document token/OOV counts against `vocab` (a (token, …) table;
    * top-N by construction, so the join is broadcast). Documents whose
    * text yields zero tokens drop out (both engines explode the same
    * way). Output: (id, n_tokens, n_oov).
    */
  def oovStats(docs: DataFrame, id: Column, text: Column, vocab: DataFrame): DataFrame = {
    val toks = docs.select(id.as("id"), explode(tokens(text)).as("token"))
    val v = broadcast(vocab.select(col("token"), lit(1).as("__in_v")))
    toks.join(v, Seq("token"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
  }
}
