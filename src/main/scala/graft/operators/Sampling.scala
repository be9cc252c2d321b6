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

  /** Deterministic k-fold assignment — the cross-validation splitter
    * (every eval pipeline's "train on k−1 folds, validate on the
    * k-th"): fold = hash52(seed:id) mod k, map-only like
    * [[splitByHash]] and with the same stability contract — a row's
    * fold never changes because other rows arrived, and distinct
    * seeds give independent foldings (ensembling/repeated CV). The
    * hash space is uniform so folds balance to ±O(√n); membership is
    * engine-replayable integer arithmetic.
    */
  def kFold(df: DataFrame, idCol: String, k: Int, seed: Long = 0L,
            foldCol: String = "fold"): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2 (one fold is not a split)")
    df.withColumn(foldCol,
      F.pmod(hash52(F.concat_ws(":", F.lit(seed), F.col(idCol))), F.lit(k.toLong)))
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

  /** Largest-remainder (Hamilton) allocation of `k` sample slots
    * across groups, proportional to an integer weight — the "sample
    * 100k documents, sources represented by byte volume" step of a
    * corpus audit. Returns (groupCols..., `__n`, `__w`, `__alloc`).
    *
    * Allocation is EXACT integer arithmetic (BigInt quotient/
    * remainder, no doubles), so any engine replays it bit-for-bit:
    * base = ⌊k·w/W⌋ per group, and the k−Σbase leftover slots go to
    * the largest remainders (ties by the group key's STRING form
    * ascending). Each group is then capped at its row count — Hamilton
    * satisfies quota, so |alloc − k·w/W| < 1 before capping. The
    * per-group table is |groups|-sized (sources × langs, not rows), so
    * the BigInt pass runs driver-side like the centroid/codebook
    * artifacts, and the result broadcasts.
    *
    * `weights`: optional (groupCols..., weightCol) frame of
    * NON-NEGATIVE integer weights; groups absent from it (or weighted
    * 0) get no slots. Default = group row counts (proportional
    * allocation = uniform sampling with exact per-group sizes).
    */
  def allocations(df: DataFrame, groupCols: Seq[String], idCol: String, k: Int,
                  weights: Option[DataFrame] = None,
                  weightCol: String = "weight"): DataFrame = {
    require(k >= 0, s"k=$k must be non-negative")
    require(groupCols.nonEmpty, "at least one group column required")
    val spark = df.sparkSession
    val keyCols = groupCols.map(F.col)
    val counts = df.filter(F.col(idCol).isNotNull)
      .groupBy(keyCols: _*).agg(F.count(F.lit(1)).as("__n"))
    val weighted = weights match {
      case None => counts.withColumn("__w", F.col("__n"))
      case Some(w) =>
        counts.join(w.select(groupCols.map(F.col) :+
          F.col(weightCol).cast("long").as("__w"): _*), groupCols)
    }
    // bounded collect: one row per group (the |sources×langs| scale),
    // same contract as the IVF centroid / PQ codebook artifacts
    val rows = weighted.collect()
    rows.foreach { r =>
      val w = r.getAs[Long]("__w")
      require(w >= 0, s"negative weight $w for group ${groupCols.map(r.getAs[Any]).mkString(",")}")
    }
    val totalW = rows.map(r => BigInt(r.getAs[Long]("__w"))).sum
    val quotas = rows.map { r =>
      val w = BigInt(r.getAs[Long]("__w"))
      val (base, rem) = if (totalW == 0) (BigInt(0), BigInt(0))
                        else (BigInt(k) * w /% totalW)
      (r, base, rem)
    }
    val leftover = if (totalW == 0) 0 else (BigInt(k) - quotas.map(_._2).sum).toInt
    val bonus = quotas.zipWithIndex
      .sortBy { case ((r, _, rem), _) =>
        (-rem, groupCols.map(c => String.valueOf(r.getAs[Any](c))).mkString("\u0000"))
      }
      .take(leftover).map(_._2).toSet
    val allocRows = quotas.zipWithIndex.map { case ((r, base, _), i) =>
      val n = r.getAs[Long]("__n")
      val alloc = (base + (if (bonus(i)) 1 else 0)).toLong.min(n)
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ alloc)
    }
    val schema = org.apache.spark.sql.types.StructType(weighted.schema.fields :+
      org.apache.spark.sql.types.StructField("__alloc", org.apache.spark.sql.types.LongType))
    spark.createDataFrame(spark.sparkContext.parallelize(allocRows.toSeq, 1), schema)
  }

  /** Exactly-`k` deterministic sample, allocated across groups
    * proportionally to `weights` by [[allocations]] and drawn within
    * each group as the `alloc_g` smallest-md5 rows — RNG-free,
    * reproducible, engine-replayable end to end. One corpus shuffle:
    * the bounded top-k aggregate carries ≤ k ids per group per
    * partition (k is the TOTAL sample size, so every group's true
    * need ≤ k rides under the global cap), then each group's array is
    * sliced to its allocation against the broadcast alloc table. A
    * group with fewer rows than its allocation yields all of them —
    * the sample shrinks rather than borrowing from other groups
    * (document the shortfall; no silent re-weighting).
    *
    * Output: (groupCols..., idCol) — join back on idCol for payloads,
    * as with [[perKeyDeterministic]].
    */
  def apportionedSample(df: DataFrame, groupCols: Seq[String], idCol: String, k: Int,
                        weights: Option[DataFrame] = None,
                        weightCol: String = "weight"): DataFrame = {
    val alloc = allocations(df, groupCols, idCol, k, weights, weightCol)
    val keyCols = groupCols.map(F.col)
    df.filter(F.col(idCol).isNotNull)
      .groupBy(keyCols: _*)
      .agg(aggregates.top_k_by_score(-hash52(F.col(idCol)).cast("double"),
        F.col(idCol), k).as("__top"))
      .join(F.broadcast(alloc.select(groupCols.map(F.col) :+ F.col("__alloc"): _*)), groupCols)
      .select(keyCols :+
        F.explode(F.slice(F.col("__top.id"), F.lit(1), F.col("__alloc").cast("int"))).as(idCol): _*)
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

  /** SOFT dedup (round 14): instead of hard-dropping duplicate-cluster
    * members, keep each member with probability 1/|cluster| — in
    * EXPECTATION one representative per cluster survives, but WHICH
    * member survives varies by id hash rather than a keep-lowest rule,
    * so repeated corpus builds don't systematically privilege the same
    * member and a cluster's survivors stay spread across its diversity
    * (the SoftDeDup idea applied to exact/near-dup cluster tables).
    * Deterministic and RNG-free like every sampler here: keep iff
    * hash52(id) < 2^52 div |cluster| — an INTEGER threshold both
    * engines compute exactly (a double threshold would round 2^52/3
    * and flip boundary rows). Rows absent from `clusters` are
    * singletons (|cluster| = 1 → always kept): cluster tables list
    * only ids that had a duplicate pair, which also keeps the join
    * side DUPLICATES-SIZED, not corpus-sized — at 100 TB the corpus
    * left-joins a much smaller cluster map (broadcast when it fits,
    * AQE otherwise) and everything after is map-only.
    * Output: the input columns + (cluster_size, kept).
    */
  def softDedup(df: DataFrame, idCol: String, clusters: DataFrame,
                clusterIdCol: String = "id",
                sizeCol: String = "cluster_size"): DataFrame = {
    val slim = clusters.select(F.col(clusterIdCol).as("__cid"),
      F.col(sizeCol).cast("long").as("__csize"))
    df.join(slim, df(idCol) === F.col("__cid"), "left")
      .withColumn("cluster_size", F.coalesce(F.col("__csize"), F.lit(1L)))
      .withColumn("kept",
        hash52(F.col(idCol)) < F.expr(s"${1L << 52}L div cluster_size"))
      .drop("__cid", "__csize")
  }
}
