package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Random `rand()` sampling is useless in a 100-TB pipeline: reruns
  * pick different rows (no reproducibility, no incremental joins
  * against yesterday's sample) and the oracle can't check it. Every
  * operator here instead derives its randomness from `md5(salt|key)` —
  * a per-row uniform that is stable across runs, engines, partitionings
  * and cluster sizes, so a sample is a pure function of (data, salt).
  * All selections are narrow Column filters (no shuffle); only the
  * per-group reservoir shuffles, once, on the group key.
  */
object Sampling {

  /** First 8 hex chars of md5(salt|key) — 32 uniform bits as a
    * fixed-width lowercase hex string. Fixed width means lexicographic
    * order == numeric order, so thresholding needs no base conversion.
    */
  def hashHex(key: Column, salt: String): Column =
    substring(md5(concat_ws("|", lit(salt), key.cast("string"))), 1, 8)

  /** Hex threshold selecting `fraction` of the 2^32 hash space via a
    * strict `<` compare. fraction >= 1 returns "g", which sorts after
    * every hex digit (keep all); fraction <= 0 returns "00000000"
    * (keep none). Fractions within 2^-33 of 1.0 ROUND to 2^32, whose
    * hex rendering would be 9 chars — a string the fixed-width
    * lexicographic compare misreads as "starts with 1" (keeping ~1/16
    * of rows instead of ~all) — so the rounded value is clamped to
    * the keep-all sentinel.
    */
  def hexThreshold(fraction: Double): String =
    if (fraction >= 1.0) "g"
    else if (fraction <= 0.0) "00000000"
    else {
      val t = math.round(fraction * 4294967296.0)
      if (t >= 4294967296L) "g" else f"$t%08x"
    }

  /** Uniform double in [0,1) from the same 32 hash bits (for thresholds
    * that vary per row, where a constant hex string can't express the
    * cut).
    */
  def uniform01(key: Column, salt: String): Column =
    conv(hashHex(key, salt), 16, 10).cast("double") / lit(4294967296.0)

  /** Keep a deterministic `fraction` of rows, keyed by `key`. */
  def sampleByHash(df: DataFrame, key: Column, fraction: Double, salt: String = "s0"): DataFrame =
    df.filter(hashHex(key, salt) < lit(hexThreshold(fraction)))

  /** Stratified sample: per-stratum fractions (e.g. per-language quotas
    * for a pretraining mix), `defaultFraction` for unlisted strata.
    */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
                       fractions: Map[String, Double], defaultFraction: Double,
                       salt: String = "s0"): DataFrame = {
    val threshold = fractions.foldLeft(when(lit(false), "")) { case (acc, (s, f)) =>
      acc.when(strata === s, hexThreshold(f))
    }.otherwise(hexThreshold(defaultFraction))
    df.filter(hashHex(key, salt) < threshold)
  }

  /** Weighted sample: keep each row with probability `weight` (a Column
    * in [0,1], e.g. a quality score squashed to a keep-rate). Rows with
    * weight >= 1 are always kept, <= 0 never.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column, salt: String = "s0"): DataFrame =
    df.filter(uniform01(key, salt) < weight)

  /** Deterministic per-group reservoir: exactly min(k, |group|) rows
    * per group, uniformly chosen by hash rank (ties broken by key for
    * full determinism). One shuffle on the group key — the distributed
    * equivalent of reservoir sampling without the sequential scan.
    */
  def reservoirPerGroup(df: DataFrame, group: Column, key: Column, k: Int,
                        salt: String = "s0"): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(group).orderBy(hashHex(key, salt), key)))
      .filter(col("__rn") <= k)
      .drop("__rn")

  /** Domain-mixture rebalance (the pretraining "data mixture" op):
    * deterministically keep floor(weight_d × total) rows per domain,
    * chosen by hash rank — target proportions regardless of each
    * source's natural size. Domains absent from `weights` are dropped;
    * a domain smaller than its quota under-fills (up-sampling by
    * repetition is an epochs decision, not a row-selection one). One
    * shuffle, on the domain column.
    */
  def toMixture(df: DataFrame, domain: Column, key: Column,
                weights: Map[String, Double], total: Long,
                salt: String = "mix"): DataFrame = {
    val quota = weights.toSeq.sortBy(_._1).foldLeft(when(lit(false), 0L)) {
      case (acc, (d, w)) => acc.when(domain === d, lit(math.floor(w * total).toLong))
    }.otherwise(lit(0L))
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(domain).orderBy(hashHex(key, salt), key)))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Temperature-flattened mixture (T = 2): per-domain quotas
    * proportional to sqrt(n_d) instead of caller-fixed weights — the
    * standard move for multilingual/multi-source pretraining mixes
    * (sampling p_d ∝ n_d^(1/T) up-weights small domains without
    * letting any one giant source dominate). T is fixed at 2 because
    * IEEE sqrt is correctly rounded — every engine computes the
    * identical weight, which a general pow(n, 1/T) cannot promise.
    *
    * All arithmetic after the sqrt is integer-exact: weights quantize
    * to floor(sqrt(n_d)·1e6) longs and each quota is
    * wq_d · total ÷ Σwq (integer division), so the selected set is
    * engine-reproducible. Plan shape: one count aggregation (domain
    * cardinality bounded), quotas derived over that tiny table with an
    * unpartitioned window (bounded rows), broadcast-joined back, and
    * ONE corpus shuffle for the per-domain hash rank — the same cost
    * as `toMixture`.
    */
  def temperatureMixture(df: DataFrame, domain: Column, key: Column,
                         total: Long, salt: String = "mixT"): DataFrame = {
    val counts = df.groupBy(domain.as("__d")).agg(count(lit(1)).as("__n"))
    val wq = counts.withColumn("__wq", floor(sqrt(col("__n")) * lit(1e6)).cast("long"))
    // Σwq over a bounded-cardinality table: the unpartitioned window is
    // safe here and keeps the whole quota derivation in one small stage.
    // The product wq·total overflows Long at the engine's advertised
    // scale (wq ≈ 1e12 for a 1e12-row domain, so total ≥ ~9.2e6 wraps
    // negative and the quota silently zeroes the domain). Route the
    // product through DECIMAL(38,0) — exact to 1e38, far past
    // max(wq)·max(total) — and let IntegralDivide bring it back to
    // Long. Same floor-division result wherever Long arithmetic was
    // already correct.
    val quotas = wq.withColumn("__sumwq", sum(col("__wq")).over(Window.partitionBy()))
      .select(col("__d"),
        expr(s"(CAST(__wq AS DECIMAL(38,0)) * ${total}L) div __sumwq").as("__quota"))
    df.join(broadcast(quotas), domain === col("__d"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("__d")).orderBy(hashHex(key, salt), key)))
      .filter(col("__rn") <= col("__quota"))
      .drop("__d", "__quota", "__rn")
  }

  /** Fractional-epoch up-sampling — the other half of data mixing:
    * where `toMixture` down-selects oversized domains, this repeats
    * rows of prized domains `epochs` times (e.g. 2.3 epochs ⇒ every
    * row twice, a deterministic hash-chosen 30% a third time). Output
    * carries `epoch` (0-based copy index) so downstream shuffling can
    * interleave copies. Pure narrow op: explode of a per-row sequence,
    * no shuffle, no driver state.
    */
  def withEpochs(df: DataFrame, key: Column, epochs: Double,
                 salt: String = "epoch"): DataFrame = {
    // Up-sampling only: epochs < 1 is sampleByHash's job (sequence()
    // would otherwise DESCEND for zero copies and fabricate rows).
    require(epochs >= 1.0, "epochs must be >= 1; use sampleByHash to down-sample")
    val whole = math.floor(epochs).toLong
    val frac = epochs - whole
    val copies = lit(whole) +
      when(uniform01(key, salt) < lit(frac), 1L).otherwise(0L)
    df.withColumn("epoch", explode(sequence(lit(0L), copies - 1)))
  }

  /** Leakage-safe train/validation split: the assignment is a pure
    * function of the GROUP key, so every row of a group (all chunks of
    * one document, all documents of one source) lands in the same
    * split — near-duplicates inside a group can never straddle the
    * train/val boundary. Zero shuffle: the split is a narrow Column.
    */
  def groupSplit(df: DataFrame, group: Column, valFraction: Double,
                 salt: String = "split"): DataFrame =
    df.withColumn("split",
      when(hashHex(group, salt) < lit(hexThreshold(valFraction)), "val").otherwise("train"))

  /** Keep rows whose `metric` is at or above the exact `p`-th
    * percentile (type-7 linear interpolation — identical in Spark's
    * `percentile` and DuckDB's `quantile_cont`). The threshold is a
    * 1-row aggregate broadcast to the filter: two passes over the
    * metric column, no full sort. At 100 TB use `percentileGateApprox`
    * below — same plan shape, bounded-memory sketch threshold.
    */
  def percentileGate(df: DataFrame, metric: Column, p: Double): DataFrame = {
    val thr = df.agg(percentile(metric, lit(p)).as("__thr"))
    df.join(broadcast(thr)).filter(metric >= col("__thr")).drop("__thr")
  }

  /** The 100-TB form of `percentileGate`: the threshold comes from
    * `approx_percentile` (Greenwald-Khanna), whose sketch merges in
    * bounded memory instead of collecting per-group value arrays the
    * way exact `percentile` does. Same two-pass plan shape; `accuracy`
    * bounds the rank error to `n / accuracy` rows around the cut — the
    * kept fraction is (1 − p) ± 1/accuracy, NOT exact, which is fine
    * for a quality gate and property-tested in SamplingSpec.
    */
  def percentileGateApprox(df: DataFrame, metric: Column, p: Double,
                           accuracy: Int = 10000): DataFrame = {
    val thr = df.agg(approx_percentile(metric, lit(p), lit(accuracy)).as("__thr"))
    df.join(broadcast(thr)).filter(metric >= col("__thr")).drop("__thr")
  }

  /** Token-budget sequence packing (pretraining batch construction):
    * assign each document to a (bucket, bin) so every bin holds a
    * contiguous run of documents with ~`budget` total tokens.
    *
    * Documents are hash-bucketed (`buckets` ways), then packed
    * greedily within each bucket in key order: a document starts in
    * bin floor((cumsum − tokens) / budget), so a bin may overflow the
    * budget by at most one document's length (the streaming-pack rule;
    * first-fit-decreasing is inherently sequential and not worth a
    * driver loop). Buckets are independent — the window sort is
    * per-bucket, so parallelism is `buckets`-wide and no global sort
    * exists anywhere.
    */
  def packSequences(df: DataFrame, key: Column, tokens: Column,
                    budget: Long, buckets: Int, salt: String = "pack"): DataFrame = {
    val bucket = conv(hashHex(key, salt), 16, 10).cast("bigint") % buckets
    val w = Window.partitionBy(col("bucket")).orderBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(key.as("key"), tokens.cast("bigint").as("n_tokens"), bucket.as("bucket"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      // floor() in both engines — a DOUBLE→BIGINT cast truncates in
      // Spark but rounds in DuckDB, so the cast alone is not portable.
      .withColumn("bin", floor((col("__cum") - col("n_tokens")) / budget))
      .select(col("key"), col("bucket"), col("bin"), col("n_tokens"))
  }
}
