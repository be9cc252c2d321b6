package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.functions.aggregates

/** Deterministic sampling for training-data pipelines.
  *
  * `perKeyDeterministic` keeps the k rows with the smallest
  * md5-derived hash per key: uniform over rows, reproducible (same
  * input ⇒ same sample, no RNG state), and bounded-memory — the
  * TopKByScore aggregate carries at most k rows per partition per key
  * into the exchange, so this is the reservoir-sample replacement
  * that actually parallelizes at 100 TB (a row_number window would
  * sort every row of every key cluster-wide).
  *
  * The hash is the first 13 hex chars (52 bits) of md5: small enough
  * to be EXACTLY representable in the aggregate's double-typed score,
  * so ordering matches an engine comparing the integer hash —
  * ties (≈2⁻⁵² per pair) break by id ascending on both sides.
  */
object Sampling {

  /** 52-bit uniform deterministic hash of a column's string form. */
  def hash52(c: Column): Column =
    F.conv(F.substring(F.md5(c.cast("string").cast("binary")), 1, 13), 16, 10).cast("long")

  /** Deterministic dataset split: rows whose hash falls under
    * `numer/denom` of the hash space get `trainLabel`, the rest
    * `holdoutLabel`. Map-only (no shuffle, no RNG), stable across
    * re-runs and engines — the train/val split that stays consistent
    * when the corpus is re-processed incrementally: a document's split
    * never changes because OTHER documents arrived.
    */
  def splitByHash(df: DataFrame, idCol: String, numer: Int, denom: Int,
                  trainLabel: String = "train", holdoutLabel: String = "holdout"): DataFrame = {
    require(numer > 0 && numer < denom, s"split fraction $numer/$denom must be in (0,1)")
    val threshold = (1L << 52) / denom * numer // exact integer boundary both engines
    df.withColumn("split",
      F.when(hash52(F.col(idCol)) < threshold, trainLabel).otherwise(holdoutLabel))
  }

  /** STRATIFIED deterministic sample: each stratum keeps its own
    * `numer/denom` fraction (e.g. keep every rare `purchase` row but
    * 1/10 of `click`s — the class-rebalancing pass a training-data
    * pipeline runs before mixing). Map-only like `splitByHash`, same
    * 52-bit hash, so membership is reproducible, subset-stable under
    * incremental re-processing, and independent across strata — a
    * row's fate never changes because other rows arrived or because
    * its stratum's fraction applies elsewhere. Strata absent from
    * `fractions` keep `defaultFraction` (whole-fraction default 1/1 =
    * keep everything, the safe bias for audit-style pipelines).
    */
  def stratifiedByHash(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, (Int, Int)],
                       defaultFraction: (Int, Int) = (1, 1)): DataFrame = {
    for ((s, (n, d)) <- fractions)
      require(n > 0 && n <= d, s"fraction $n/$d for stratum '$s' must be in (0,1]")
    require(defaultFraction._1 > 0 && defaultFraction._1 <= defaultFraction._2,
      s"default fraction must be in (0,1]")
    def threshold(n: Int, d: Int): Long =
      if (n == d) 1L << 52 else (1L << 52) / d * n // exact integer boundary both engines
    val cutoff = fractions.foldLeft(F.lit(threshold(defaultFraction._1, defaultFraction._2))) {
      case (acc, (s, (n, d))) =>
        F.when(F.col(stratumCol) === s, F.lit(threshold(n, d))).otherwise(acc)
    }
    df.filter(hash52(F.col(idCol)) < cutoff)
  }

  /** The k sample rows per key, as (keys..., idCol) pairs sorted by
    * sample order. Join back on idCol for full rows — or use
    * [[perKeyDeterministicRows]] to skip the join-back.
    */
  def perKeyDeterministic(df: DataFrame, keys: Seq[String], idCol: String, k: Int): DataFrame = {
    val keyCols = keys.map(F.col)
    // contract: null ids are excluded up front — a null key has no
    // deterministic hash position (engines rank nulls differently),
    // so it can never be part of a reproducible sample
    df.filter(F.col(idCol).isNotNull)
      .select(keyCols :+ F.col(idCol): _*)
      .groupBy(keyCols: _*)
      // negate: TopKByScore keeps the LARGEST scores, we want smallest hashes
      .agg(aggregates.top_k_by_score(-hash52(F.col(idCol)).cast("double"),
        F.col(idCol), k).as("top"))
      .select(keyCols :+ F.explode(F.col("top.id")).as(idCol): _*)
  }

  /** Per-key quality-calibrated pruning: keep each key's top `frac`
    * of rows by `scoreCol` — the corpus pass that applies a quality
    * floor RELATIVE to each source (an absolute floor keeps all of a
    * high-quality source's chaff and none of a noisy source's best;
    * the per-source quantile is the standard calibration). Rows at
    * the threshold are kept (ties keep more than `frac`, never less,
    * deterministically).
    *
    * Two threshold paths, one result shape:
    *  - `exact = false` (default, the 100 TB routing):
    *    `approx_percentile` — bounded mergeable sketch per key, one
    *    small aggregate + a broadcast threshold join + map-only filter.
    *  - `exact = true`: `percentile` — buffers each key's scores in
    *    one aggregation buffer (oracle-/bounded-key-cardinality-only,
    *    same split as q_percentile vs q_percentile_approx).
    * The grouped threshold table is keys-cardinality-sized — tiny —
    * so the join back to the corpus broadcasts.
    */
  def topFractionByScore(df: DataFrame, keys: Seq[String], scoreCol: String,
                         frac: Double, exact: Boolean = false,
                         accuracy: Int = 10000): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac $frac must be in (0,1]")
    val p = F.lit(1.0 - frac)
    val thrAgg =
      if (exact) F.percentile(F.col(scoreCol), p)
      else F.approx_percentile(F.col(scoreCol), p, F.lit(accuracy))
    val thresholds = df.groupBy(keys.map(F.col): _*).agg(thrAgg.as("__thr"))
    // null-safe join-back: groupBy computes a threshold for the
    // null-key group, and plain equality would never join it back —
    // silently discarding every null-key row (a null-source crawl
    // shard must be top-fraction pruned like any other, not dropped)
    val cond = keys.map(k => F.col(s"__s.$k") <=> F.col(s"__t.$k")).reduce(_ && _)
    df.alias("__s").join(F.broadcast(thresholds).alias("__t"), cond)
      .filter(F.col(scoreCol) >= F.col("__thr"))
      .select(df.columns.map(c => F.col(s"__s.$c").as(c)): _*)
  }

  /** Same sample, FULL rows in one pass: the row struct rides the
    * bounded top-k buffer (`top_k_payload`), so there is no join-back
    * rescan of the source — ≤ k full rows per partition per key enter
    * the single exchange. Prefer this when the sampled payload is
    * needed downstream; prefer [[perKeyDeterministic]] + join when k
    * is large and rows are very wide (slim-key shuffle, payload moves
    * only for winners).
    */
  def perKeyDeterministicRows(df: DataFrame, keys: Seq[String], idCol: String, k: Int): DataFrame = {
    val keyCols = keys.map(F.col)
    val row = F.struct(df.columns.map(F.col).toSeq: _*)
    df.filter(F.col(idCol).isNotNull)
      .groupBy(keyCols: _*)
      .agg(aggregates.top_k_payload(-hash52(F.col(idCol)).cast("double"),
        F.col(idCol), row, k).as("top"))
      .select(F.explode(F.col("top")).as("__r"))
      .select(F.col("__r.*"))
  }
}
