package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical dictionary encoding (label encoding) — string categories
  * to dense integer codes plus a reusable vocab table, the feature-
  * engineering primitive in front of any model input.
  *
  * Codes are assigned lexicographically (deterministic across runs and
  * engines), via [[GlobalIndex]] over the DISTINCT value set — NOT a
  * `dense_rank()` over the full table, whose global window would
  * funnel every row through one task. The distinct set is
  * vocabulary-sized; the join back to the data is an ordinary equi-join
  * that AQE broadcasts when the vocab measures small. Unseen-at-encode
  * values are the caller's contract (join is left; they surface as
  * null codes, the standard "new category" signal).
  */
object Encodings {

  /** (encoded df with `codeCol` attached, vocab table (value, code)).
    *
    * NULL categories are excluded from the vocab: a NULL value can
    * never equi-join back to its code anyway (it surfaces with a null
    * code like any unseen value), and keeping it would make the code
    * numbering depend on the engine's null-sort convention (Spark asc
    * is nulls-first, most SQL row_number defaults nulls-last — an
    * off-by-one on every real category's code).
    */
  def dictionaryEncode(df: DataFrame, valueCol: String,
                       codeCol: String): (DataFrame, DataFrame) = {
    val vocab = GlobalIndex.withGlobalIndex(
      df.select(col(valueCol)).filter(col(valueCol).isNotNull).distinct(),
      Seq(col(valueCol)), outCol = codeCol)
    val encoded = df.join(vocab, Seq(valueCol), "left")
    (encoded, vocab)
  }

  /** Leave-one-out target encoding with Laplace smoothing — the
    * leakage-safe category→rate feature: each row's code excludes its
    * OWN target, `(sum(cat) − t_row + priorNum) / (n(cat) − 1 +
    * priorDen)`. The code ships as an exact integer rational
    * (code_num, code_den), never a pre-divided IEEE value — downstream
    * chooses its precision, and any engine reproduces the pair
    * bit-for-bit. One category-sized aggregation joined back; AQE
    * broadcasts it when small.
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
                      priorNum: Long, priorDen: Long): DataFrame = {
    val stats = df.groupBy(col(catCol)).agg(
      sum(col(targetCol)).as("__sum"), count(lit(1)).as("__n"))
      .withColumnRenamed(catCol, "__cat")
    // Null-safe join: groupBy DOES produce a null-category stats row,
    // but a plain equi-join can never match it — every null-category
    // row would silently vanish from the feature table. <=> treats the
    // null group like any other unseen-at-apply-time category.
    df.join(stats, col(catCol) <=> col("__cat"))
      .withColumn("code_num", col("__sum") - col(targetCol) + lit(priorNum))
      .withColumn("code_den", col("__n") - 1 + lit(priorDen))
      .drop("__cat", "__sum", "__n")
  }
}
