package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Corpus mixing: the source-reweighting pass a training-data pipeline
  * runs before assembling a pre-training mix. Upstream corpora arrive
  * wildly imbalanced (web crawl ≫ books ≫ reference); sampling each
  * source proportionally to its size lets the biggest source drown the
  * mix, while equal shares starve it. The standard compromise is
  * temperature scaling: source s gets a share ∝ n_s^T with 0 < T < 1
  * (T=1 proportional, T→0 uniform). The reference's analytics stack
  * would express this as a BigQuery TABLESAMPLE-per-source job; here it
  * is one tiny aggregate plus a map-only filter.
  *
  * This implementation fixes T = 1/2 (share ∝ √n_s) so every weight is
  * computed exclusively with IEEE-754 operations that are EXACTLY
  * rounded (sqrt, multiply, divide) over exact integer inputs, with one
  * fixed evaluation order — which makes the kept set bit-reproducible
  * across engines (the DuckDB oracle recomputes the same tree) and
  * across re-runs. A free-T variant would need `pow`, which is NOT
  * exactly rounded and differs per libm — reproducibility would die in
  * the last ulp.
  *
  * Membership is the proven 52-bit md5 threshold ([[Sampling.hash52]]):
  * map-only, RNG-free, so a document's fate depends only on its own id
  * and the per-source threshold. Oversubscribed rare sources cap at
  * keep-everything (no upsampling/duplication — repeat-epochs are a
  * training-loader concern, not a corpus-materialization concern).
  *
  * Scale shape: one full-scan count aggregate (20-ish rows out; at
  * 100 TB feed precomputed per-source counts via `knownCounts` —
  * partition-level metadata makes this free for source-partitioned
  * layouts), then a broadcast of the ≤|sources| threshold table and a
  * map-only filter. No wide shuffle anywhere.
  *
  * Reference anchor: the corpus-composition stage of an LLM data
  * pipeline (brief-mandated family; no direct reference-file analog).
  */
object Mixing {

  /** Keep a deterministic `numer/denom` of the corpus overall,
    * re-balanced across `sourceCol` by √-temperature shares.
    *
    * For each source s with n_s rows:
    *   w_s     = floor(√n_s · 2²⁰)            (exact integer both engines)
    *   target  = (Σn · numer) div denom        (rows wanted overall)
    *   want_s  = target · w_s / Σw             (s's share of the mix)
    *   keep    iff hash52(id) < min(2⁵², floor(want_s / n_s · 2⁵²))
    *
    * Contract: rows with null `idCol` or null `sourceCol` are excluded
    * up front — a null id has no deterministic hash position and a null
    * source no share (same contract as [[Sampling.perKeyDeterministic]]).
    *
    * @param knownCounts optional (source, n) table replacing the count
    *                    scan — pass table-stats/partition counts at scale.
    */
  def temperatureMixBySqrt(df: DataFrame, idCol: String, sourceCol: String,
                           numer: Int, denom: Int,
                           knownCounts: Option[DataFrame] = None): DataFrame = {
    require(numer > 0 && numer <= denom, s"mix fraction $numer/$denom must be in (0,1]")
    val rows = df.filter(F.col(idCol).isNotNull && F.col(sourceCol).isNotNull)
    val counts = knownCounts.getOrElse(
      rows.groupBy(sourceCol).agg(F.count(F.lit(1)).as("__n")))
    val weighted = counts.withColumn("__w",
      F.floor(F.sqrt(F.col("__n").cast("double")) * F.lit(1048576.0)).cast("long"))
    val totals = weighted.agg(F.sum("__n").cast("long").as("__total"),
      F.sum("__w").cast("long").as("__wsum"))
    // threshold tree mirrored verbatim by the oracle: every operand is
    // an exact integer-valued double < 2^53, every op exactly rounded,
    // left-associated — bit-identical across engines by IEEE-754
    val thresholds = weighted.crossJoin(F.broadcast(totals))
      .withColumn("__target", F.expr(s"(__total * $numer) div $denom"))
      .withColumn("__h", F.least(F.lit(1L << 52),
        F.floor(F.col("__target").cast("double") * F.col("__w") / F.col("__wsum")
          / F.col("__n") * F.lit(4503599627370496.0)).cast("long")))
      .select(F.col(sourceCol).as("__mix_source"), F.col("__h"))
    rows.join(F.broadcast(thresholds), rows(sourceCol) === F.col("__mix_source"))
      .filter(Sampling.hash52(F.col(idCol)) < F.col("__h"))
      .drop("__mix_source", "__h")
  }
}
