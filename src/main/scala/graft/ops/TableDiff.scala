package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level symmetric diff of two table snapshots — the companion of
  * [[Audit]]'s column fingerprints: the fingerprint answers "did the
  * copy drift?", this answers "WHICH rows drifted, and how?" after a
  * migration, a CDC replay, or an upsert batch (the reference's
  * MERGE-loaded warehouse makes exactly this reconciliation question
  * routine).
  *
  * Each side collapses to key granularity carrying an md5 row hash of
  * the compared columns in a LENGTH-PREFIXED canonical form
  * (`v<len>:<text>;` per value, `n;` for NULL — prefix-free, so no
  * concatenation collision, and every warehouse can recompute it,
  * same portability argument as [[Audit]]); a full outer join then
  * labels each key `added` / `removed` / `changed`, and unchanged
  * keys are filtered before anything materializes.
  *
  * Shape at scale: ONE hash shuffle per side (the groupBy to key
  * granularity, with the duplicate-key guard riding it), and the
  * full outer join REUSES both sides' hash partitioning — no third
  * exchange; output is violation-sized, never table-sized. Duplicate
  * keys and NULL keys fail loud: a diff keyed on a non-key would
  * otherwise compare garbage (and NULL keys never equi-join, so a
  * silent pass would double-count them as added+removed).
  *
  * Float caveat (same as Audit): canonical text forms differ across
  * engines for doubles — diff floating-point measures via an explicit
  * quantization column.
  */
object TableDiff {

  /** `v<len>:<text>;` / `n;` canonical encoding of one column. */
  private def canonical(c: String): Column = {
    val s = col(c).cast("string")
    when(col(c).isNull, lit("n;"))
      .otherwise(concat(lit("v"), length(s).cast("string"), lit(":"), s, lit(";")))
  }

  /** The same encoding rendered for DuckDB, so oracles replay the hash
    * token for token.
    */
  def rowHashSql(cols: Seq[String]): String = {
    val parts = cols.map { c =>
      s"CASE WHEN $c IS NULL THEN 'n;' " +
        s"ELSE 'v' || length(CAST($c AS VARCHAR)) || ':' || CAST($c AS VARCHAR) || ';' END"
    }
    s"md5(${parts.mkString(" || ")})"
  }

  /** Diff `after` against `before` on primary key `keys`, comparing
    * `compareCols`. Returns (keys…, status, hash_before, hash_after)
    * for keys that were added, removed, or changed — never the
    * unchanged bulk.
    */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(compareCols.nonEmpty, "diff needs at least one compared column")
    val rowHash = md5(concat(compareCols.map(canonical): _*))
    def collapse(df: DataFrame, hashName: String): DataFrame = {
      val checkedKeys = keys.map { k =>
        when(col(k).isNotNull, col(k)).otherwise(raise_error(
          lit(s"TableDiff: NULL key $k — a primary key cannot be NULL"))).as(k)
      }
      df.select(checkedKeys :+ rowHash.as("__h"): _*)
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__cnt"), max(col("__h")).as("__hmax"))
        .select(keys.map(col) :+
          when(col("__cnt") === 1L, col("__hmax")).otherwise(raise_error(concat(
            lit(s"TableDiff: duplicate key (${keys.mkString(", ")}) = "),
            concat_ws(",", keys.map(k => col(k).cast("string")): _*),
            lit(" — diff requires unique keys per side")))).as(hashName): _*)
    }
    val a = collapse(before, "hash_before")
    val b = collapse(after, "hash_after")
    a.join(b, keys, "full_outer")
      .withColumn("status",
        when(col("hash_before").isNull, lit("added"))
          .when(col("hash_after").isNull, lit("removed"))
          .when(col("hash_before") =!= col("hash_after"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keys.map(col) :+ col("status") :+ col("hash_before") :+ col("hash_after"): _*)
  }
}
