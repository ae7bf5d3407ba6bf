package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (SURVEY.md §7.5.7): AQE's skew-join split
  * covers sort-merge joins at runtime, but aggregation skew and
  * broadcast-averse skewed joins still want explicit salting. The
  * per-visit grouping here is the reference's hot spot — visit sizes
  * run 30+ services (Notebooks/predicitions_analysis.ipynb).
  */
object Skew {

  /** Two-phase salted aggregation: a hot key is first split across
    * `buckets` partial groups (key, salt), partially aggregated, then
    * re-aggregated by key. Count and sum re-aggregate losslessly.
    * The salt derives from `saltSrc` (any roughly-unique column), so
    * the result is deterministic.
    */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltSrc: Column, buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(saltSrc), lit(buckets)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as(s"sum_$valueCol"))
  }

  /** Salted join for a skewed fact against a non-broadcastable dim:
    * the fact side gets salt = hash(saltSrc) % buckets; the dim side is
    * replicated once per salt value; the join key becomes (key, salt),
    * splitting each hot key's rows across `buckets` tasks.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSrc: Column, buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // Same guard as Joins.saltedJoin: the dim side is REPLICATED once
    // per salt, so a dim-preserving join type (right/full) would emit
    // every unmatched dim row `buckets` times — silently.
    val allowed = Set("inner", "left", "leftouter", "left_outer",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports fact-preserving join types ${allowed.toSeq.sorted.mkString(", ")}; " +
        s"'$joinType' would emit replicated dim rows")
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltSrc), lit(buckets)))
    val saltedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
