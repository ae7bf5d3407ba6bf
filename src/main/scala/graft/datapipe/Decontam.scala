package graft.datapipe

import graft.ops.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose word
  * n-grams overlap an evaluation/benchmark set. The standard pre-train
  * hygiene pass — a corpus document sharing enough shingles with a
  * benchmark question leaks the benchmark into training.
  *
  * Shape for 100 TB: the benchmark side collapses to its DISTINCT
  * shingle set once (eval suites are millions of shingles at most, vs
  * billions of corpus docs) and is broadcast only on measured evidence
  * (`Joins.broadcastIfSmall`); the corpus explodes to per-doc distinct
  * shingles, left-joins the benchmark set, and aggregates back to one
  * row per doc — one shuffle on doc id, no corpus-side distinct over
  * the global shingle space. At extreme benchmark sizes the string
  * join key can be swapped for `xxhash64(shingle)` on both sides; the
  * raw-string join keeps the operator oracle-checkable.
  */
object Decontam {

  /** Per-document overlap report: `(doc, n_shingles, n_matched,
    * overlap, contaminated)` where `overlap` is the fraction of the
    * doc's distinct `n`-gram shingles that occur anywhere in the
    * benchmark corpus, and `contaminated` flags `overlap >=
    * minOverlap`. Every corpus doc appears exactly once.
    */
  def overlapReport(corpus: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 3, minOverlap: Double = 0.5): DataFrame = {
    // Materialize the distinct shingle set once: broadcastIfSmall's
    // evidence count and the broadcast itself would otherwise each
    // re-run the explode+distinct.
    val benchShingles = Joins.broadcastIfSmall(graft.util.Materialize.once(
      benchmark
        .select(explode(array_distinct(TextAnalysis.shingles(col(benchTextCol), n))).as("shingle"))
        .distinct()))
    corpus
      .select(col(idCol).as("doc"),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("shingle"))
      .join(benchShingles.withColumn("__hit", lit(1)), Seq("shingle"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_matched"))
      .withColumn("overlap", col("n_matched").cast("double") / col("n_shingles").cast("double"))
      .withColumn("contaminated", col("overlap") >= lit(minOverlap))
  }
}
