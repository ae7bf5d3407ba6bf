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

  /** Orderless per-partition fingerprints of the (key, compared-row)
    * content: (partition, n_rows, xor_check, sum_check) — one scan
    * with map-side partials, output = #partitions rows. The same
    * xor + duplicate-sensitive modular sum pairing as
    * [[Audit.columnFingerprints]], over the keyed row encoding.
    */
  def partitionFingerprints(df: DataFrame, partitionCol: String,
                            keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    // Engine-internal rendering (fingerprints compare before-vs-after
    // INSIDE Spark; only the final diff output faces an oracle).
    def canonicalSql(c: String): String =
      s"CASE WHEN `$c` IS NULL THEN 'n;' " +
        s"ELSE concat('v', length(cast(`$c` as string)), ':', cast(`$c` as string), ';') END"
    val rowSql = (keys ++ compareCols).map(canonicalSql).mkString("concat(", ", ", ")")
    val h60Sql = s"cast(conv(substring(md5($rowSql), 1, 15), 16, 10) as bigint)"
    df.groupBy(col(partitionCol))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"bit_xor($h60Sql)").as("xor_check"),
        sum(expr(h60Sql) % 1000000L).as("sum_check"))
  }

  /** [[diff]] with fingerprint pruning — the rsync discipline at
    * warehouse scale: compare cheap per-partition fingerprints first
    * (one scan per side, partition-count-sized output), then run the
    * row-level diff ONLY over partitions whose fingerprints disagree.
    * On DISK-partitioned tables the dirty-set semi-join plans as
    * dynamic partition pruning on the drill scans (spec-locked), so a
    * 10 000-partition table with three touched partitions re-reads
    * three; on a derived partition column the drill still prunes the
    * shuffled/diffed ROWS, just not the I/O. The dirty set rides a
    * broadcast semi-join, never a collect.
    *
    * Pruning is semantically transparent up to fingerprint collision:
    * a clean verdict needs simultaneous 60-bit-xor AND modular-sum AND
    * count agreement on differing content — the same astronomically
    * unlikely class every fingerprint-based sync accepts (documented,
    * not hidden). The oracle story is exactly that transparency: the
    * pruned diff must hash-equal the plain diff.
    */
  def prunedDiff(before: DataFrame, after: DataFrame, partitionCol: String,
                 keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    // A NULL partition value never equi-joins: its rows would pass the
    // fingerprint stage as "dirty" but VANISH from the semi-joined
    // drill-down — the silent-loss class. Fail loud instead.
    def checkedPart(df: DataFrame) = df.withColumn(partitionCol,
      when(col(partitionCol).isNotNull, col(partitionCol)).otherwise(raise_error(
        lit(s"prunedDiff: NULL $partitionCol — partition pruning needs every row placed"))))
    val before2 = checkedPart(before)
    val after2 = checkedPart(after)
    val fb = partitionFingerprints(before2, partitionCol, keys, compareCols)
      .select(col(partitionCol), col("n_rows").as("__nb"),
        col("xor_check").as("__xb"), col("sum_check").as("__sb"))
    val fa = partitionFingerprints(after2, partitionCol, keys, compareCols)
      .select(col(partitionCol), col("n_rows").as("__na"),
        col("xor_check").as("__xa"), col("sum_check").as("__sa"))
    val dirty = fb.join(fa, Seq(partitionCol), "full_outer")
      .filter(!(col("__nb") <=> col("__na")) || !(col("__xb") <=> col("__xa")) ||
        !(col("__sb") <=> col("__sa")))
      .select(col(partitionCol))
    diff(
      before2.join(broadcast(dirty), Seq(partitionCol), "left_semi"),
      after2.join(broadcast(dirty), Seq(partitionCol), "left_semi"),
      keys, compareCols)
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
