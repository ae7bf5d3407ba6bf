package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization: per-vector min/max affine
  * mapping of each component onto 0..255. At 100 TB the embedding
  * column dominates storage and shuffle width — 8-bit codes cut both
  * 4× against float32 (the corpus-side win that makes billion-vector
  * ANN shuffles tractable), at the price of ~0.4 % per-component
  * error, which the recall spec bounds end-to-end.
  *
  * All arithmetic is plain double IEEE ops in a fixed order, so any
  * engine reproduces the codes bit-for-bit — the quantization itself
  * is oracle-checkable, not just its downstream effects.
  */
object Quantize {

  /** Quantization bounds: (array_min, array_max) as doubles. */
  private def bounds(vec: Column): (Column, Column) =
    (array_min(vec).cast("double"), array_max(vec).cast("double"))

  /** 0..255 codes for a float/double vector; constant vectors (max =
    * min) collapse to all-zero codes. Codes are INT in the DataFrame
    * (parquet dictionary-encodes them; a BinaryType packing is a
    * storage-level refinement this operator stays above).
    */
  def codes(vec: Column): Column = {
    val (mn, mx) = bounds(vec)
    when(mx === mn, transform(vec, _ => lit(0)))
      .otherwise(transform(vec, x =>
        least(lit(255), floor((x.cast("double") - mn) * lit(255.0) / (mx - mn)).cast("int"))))
  }

  /** Reconstructed double vector from codes + stored bounds: the
    * center of each quantization cell (code + 0.5 scaled back) — for
    * codes 0..254, which each cover a 1/255-width cell of [qmin,
    * qmax). Code 255 is reached only at the very top of the range —
    * x = qmax, give or take an ulp of rounding in the affine (the
    * least() clamp guards fp overshoot) — so it reconstructs as qmax
    * itself; the center formula would return qmax + Δ/510, OUTSIDE
    * the stored bounds, doubling that component's error for every
    * vector's maximum.
    */
  def dequantize(codes: Column, qmin: Column, qmax: Column): Column =
    when(qmax === qmin, transform(codes, _ => qmin))
      .otherwise(transform(codes, c =>
        when(c === 255, qmax)
          .otherwise(qmin + (c.cast("double") + lit(0.5)) * (qmax - qmin) / lit(255.0))))

  /** Quantize an embedding table: id, qmin, qmax, qvec. */
  def quantizeTable(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (mn, mx) = bounds(col(vecCol))
    df.select(col(idCol), mn.as("qmin"), mx.as("qmax"), codes(col(vecCol)).as("qvec"))
  }

  /** Asymmetric brute-force top-k: full-precision queries scored
    * against the quantized corpus (codes are dequantized inline — the
    * corpus is never re-read at full width). Same shape as
    * Similarity.bruteForceTopK: corpus-side scan × broadcast queries,
    * per-query top-k via window.
    */
  def bruteForceTopKQuantized(queries: DataFrame, quantized: DataFrame,
                              idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
      Similarity.asDouble(col(vecCol)).as("q_vec"))
    val c = quantized.select(col(idCol).as("n_id"),
      dequantize(col("qvec"), col("qmin"), col("qmax")).as("n_vec"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cosine", Similarity.cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("__rn").as("rank"))
  }
}
