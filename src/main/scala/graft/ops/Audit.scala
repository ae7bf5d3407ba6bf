package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Migration/consistency audit: orderless per-column table
  * fingerprints.
  *
  * The operational question after any copy, engine migration, or
  * re-partition of a 100 TB table is "is it still the same data?" —
  * and the answer can't be a sort (no global order survives a
  * distributed copy) or a row-by-row diff (a second 100 TB join). A
  * fingerprint built only from COMMUTATIVE aggregates is
  * partition-order- and row-order-independent by construction, costs
  * one scan with map-side partial aggregation, and emits one row per
  * column — any two systems that can hash strings can compare.
  *
  * Per column: row count, null count, and two orderless checksums of
  * `md5(cast(value as string))` — a 60-bit XOR fold (overflow-free at
  * any row count, but blind to even-multiplicity duplicates) and a
  * modular SUM (duplicate-sensitive, safe to ~9e12 rows at the 1e6
  * modulus). Together a mismatch in either column pinpoints which
  * column diverged. md5-over-canonical-string is deliberately chosen
  * over engine-native hashes (xxhash64 etc.): every warehouse speaks
  * md5, which is what makes the fingerprint CROSS-ENGINE comparable —
  * the DuckDB oracle recomputes it token for token.
  */
object Audit {

  /** 60-bit integer of the md5 prefix of the value's canonical string
    * form. NULLs hash to NULL and are skipped by the aggregates (they
    * are counted separately).
    */
  private def h60(c: String): Column =
    expr(s"cast(conv(substring(md5(cast(`$c` as string)), 1, 15), 16, 10) as bigint)")

  /** One row per requested column: `column_name, n_rows, n_nulls,
    * xor_check, sum_check`. Columns whose values are all NULL carry
    * NULL checksums (matching SQL aggregate semantics everywhere).
    *
    * Canonical-form caveat: fingerprints compare across engines only
    * for types with a canonical text form (integers, strings, dates).
    * Floating point renders differently across engines — fingerprint
    * doubles via an explicit quantization column instead.
    */
  def columnFingerprints(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnFingerprints needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls__$c"),
        expr(s"bit_xor(cast(conv(substring(md5(cast(`$c` as string)), 1, 15), 16, 10) as bigint))")
          .as(s"__xor__$c"),
        sum(h60(c) % 1000000L).as(s"__sum__$c"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        col(s"__nulls__$c").as("n_nulls"),
        col(s"__xor__$c").as("xor_check"),
        col(s"__sum__$c").as("sum_check"))): _*)).as("f"))
      .select("f.*")
  }

  /** True iff two tables carry identical fingerprints over `cols` —
    * the migration-validation predicate. Both sides aggregate to
    * #cols rows before the comparison join, so the check itself is
    * scale-free.
    */
  def fingerprintsMatch(a: DataFrame, b: DataFrame, cols: Seq[String]): Boolean = {
    val fa = columnFingerprints(a, cols)
    val fb = columnFingerprints(b, cols)
    fa.unionByName(fb).distinct().count() == cols.length
  }
}
