package graft.datapipe

import graft.functions.WordShingles
import graft.util.Materialize
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Byte-pair-encoding merge learning (Sennrich 2016) — TRAINING the
  * subword vocab that [[graft.functions.SubwordTokenize]] applies.
  *
  * Classic BPE scale shape: merges are learned on the word-FREQUENCY
  * dictionary, never the corpus. The corpus contributes exactly one
  * explode+aggregate shuffle (words → (word, freq)); every one of the
  * `nMerges` iterations then runs on the vocab-bounded dict —
  * pair-count aggregate, 1-row arg-max, literal replace — so learning
  * cost is O(merges × vocab), independent of corpus size. The only
  * driver traffic is one (pair, weight) row per merge.
  *
  * Symbolization is a TWO-space-delimited symbol string padded with
  * two spaces ("  k  e  y  "), so applying a merge is the codegen'd
  * literal `replace(sym, " a  b ", " ab ")`: the pattern consumes one
  * space from each side of a boundary, leaving the other for the
  * neighboring occurrence — adjacent matches never overlap, so plain
  * left-to-right non-overlapping replacement merges EVERY occurrence
  * in one pass ("a b a b" → "ab ab") while staying greedy on
  * self-overlap ("a a a" → "aa a"). A single-space encoding would
  * share the boundary space between matches and silently skip every
  * other occurrence. Each
  * iteration's dict is materialized once (vocab-sized), keeping step
  * i's lineage O(1) instead of O(i).
  *
  * Merge selection is fully deterministic: heaviest pair by summed
  * word frequency, ties broken by the pair string ascending.
  */
object Bpe {

  /** One learned merge step. */
  final case class Merge(step: Int, pair: String, merged: String, weight: Long)

  /** Learn `nMerges` merges from the corpus; returns the merge table
    * and the final per-word symbolization (word, freq, sym).
    */
  def learn(docs: DataFrame, textCol: String, nMerges: Int): (Seq[Merge], DataFrame) = {
    var dict = Materialize.once(
      docs.select(explode(TextAnalysis.words(col(textCol))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .withColumn("sym",
          concat(lit("  "), trim(regexp_replace(col("word"), "(.)", "$1  ")), lit("  "))))
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      // Adjacent symbol pairs weighted by word frequency. Words down to
      // one symbol contribute none (WordShingles would collapse a
      // 1-element array to a whole-word "shingle", which is not a pair).
      val syms = split(trim(col("sym")), "  ")
      val top = dict
        .filter(size(syms) >= 2)
        .select(col("freq"), explode(WordShingles.of(syms, 2)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val merged = pair.replace(" ", "")
        merges += Merge(step, pair, merged, top(0).getLong(1))
        dict = Materialize.once(dict.withColumn("sym",
          replace(col("sym"), lit(" " + pair.replace(" ", "  ") + " "), lit(s" $merged "))))
        step += 1
      }
    }
    (merges.result(),
      dict.select(col("word"), col("freq"),
        regexp_replace(trim(col("sym")), "  ", " ").as("sym")))
  }

  /** The merge table as a DataFrame (driver-side `nMerges` rows). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.map(m => Row(m.step, m.pair, m.merged, m.weight)), 1),
      StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField("pair", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("weight", LongType, nullable = false))))

  /** DuckDB oracle for [[learn]]: the SAME `nMerges` iterations
    * unrolled as chained CTEs — per step an adjacent-pair weighted
    * count, a LIMIT-1 arg-max with the identical tie-break, and the
    * identical padded-string replace. Generated here so engine and
    * oracle can only diverge on semantics, never on the fixture.
    * `select` picks the merge table or the final symbolization.
    */
  def oracleSql(nMerges: Int, mergeTable: Boolean): String = {
    def stage(i: Int): String =
      s"""p$i AS MATERIALIZED (
         |  SELECT t.syms[r.j] || ' ' || t.syms[r.j + 1] AS pair, t.freq
         |  FROM (SELECT freq, string_split(trim(sym), '  ') AS syms FROM s${i - 1}) t,
         |       LATERAL (SELECT unnest(range(1, len(t.syms))) AS j) r),
         |m$i AS MATERIALIZED (
         |  SELECT $i AS step, pair, replace(pair, ' ', '') AS merged, CAST(sum(freq) AS BIGINT) AS weight
         |  FROM p$i GROUP BY pair ORDER BY sum(freq) DESC, pair LIMIT 1),
         |s$i AS MATERIALIZED (
         |  SELECT word, freq,
         |    replace(sym,
         |      coalesce(' ' || replace((SELECT pair FROM m$i), ' ', '  ') || ' ', chr(1)),
         |      coalesce(' ' || (SELECT merged FROM m$i) || ' ', chr(1))) AS sym
         |  FROM s${i - 1})""".stripMargin
    val out =
      if (mergeTable)
        (1 to nMerges).map(i => s"SELECT step, pair, merged, weight FROM m$i")
          .mkString("", "\nUNION ALL\n", "\nORDER BY step")
      else s"SELECT word, freq, replace(trim(sym), '  ', ' ') AS sym FROM s$nMerges ORDER BY word"
    s"""WITH s0 AS MATERIALIZED (
       |  SELECT w AS word, count(*) AS freq,
       |    '  ' || trim(regexp_replace(w, '(.)', '\\1  ', 'g')) || '  ' AS sym
       |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
       |        FROM documents) t
       |  GROUP BY w),
       |${(1 to nMerges).map(stage).mkString(",\n")}
       |$out""".stripMargin
  }
}
