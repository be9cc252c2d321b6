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

  /** Mix to per-source SIZE BUDGETS with UP-sampling — the published
    * pre-training composition recipe ([[temperatureMixBySqrt]] only
    * ever downsamples; the Llama/GPT-class reports set per-source
    * token budgets where rare high-quality sources run MULTIPLE
    * epochs): source s with total size tot_s and budget b_s
    * contributes
    *
    *   - `b_s div tot_s` FULL copies of every doc
    *     (epoch = 0 .. full−1), and
    *   - one PARTIAL epoch (epoch = full) holding the deterministic
    *     hash-threshold slice expected to carry `b_s mod tot_s` of
    *     the size: keep iff hash52(id) < floor(rem/tot · 2⁵²).
    *
    * Budgets are met in EXPECTATION at doc granularity (the
    * [[temperatureMixBySqrt]] membership law — map-only, RNG-free,
    * subset-stable); exactly-k selection is `Sampling
    * .apportionedSample`'s job. Output = input columns + `epoch`
    * (0-based); a doc's replica set depends only on its own id and
    * its source's (tot, budget) — re-runs and incremental
    * re-processing reproduce it bit-for-bit, and a NEW budget only
    * reshuffles its own source. Epochs materialize as rows so the
    * downstream pack/shuffle stages (S5/S9) see distinct training
    * instances; keep `epoch` in the pack key to spread copies.
    *
    * Scale shape: one keyed size aggregate (or `knownTotals` from
    * table stats), a broadcast ≤|sources| allocation table, then ONE
    * map-only generator — un-replicated docs vanish in the explode
    * (no Filter node on a derived column: the §4 rule 3 shape).
    * Replication multiplies ROWS by design; the output is the
    * training mix, sized by Σ budgets, not by the corpus.
    *
    * Louds: a budget for a source absent from the corpus (a typo'd
    * name silently yielding nothing is the droplist trap); a budget
    * demanding more than `maxEpochs` epochs (a tiny source with a
    * huge budget is almost always a unit error); non-positive
    * budgets. Null id/source/size rows are excluded up front (no
    * deterministic hash position / no accounting). Sizes must keep
    * tot_s < 2⁵³ for the exact-double threshold arithmetic (at 100 TB
    * of CHARACTERS that bound still holds by three orders).
    *
    * @param budgets     target size (token/char count) per source —
    *                    sources not named get budget 0 (dropped)
    * @param knownTotals optional (source, total) frame replacing the
    *                    size scan at 100 TB
    */
  def mixToBudget(df: DataFrame, idCol: String, sourceCol: String, sizeCol: String,
                  budgets: Map[String, Long], maxEpochs: Int = 100,
                  knownTotals: Option[DataFrame] = None): DataFrame = {
    require(budgets.nonEmpty, "mixToBudget: empty budget map")
    budgets.foreach { case (s, b) => require(b > 0,
      s"mixToBudget: budget for $s must be positive (got $b); omit the source to drop it") }
    val spark = df.sparkSession
    val rows = df.filter(F.col(idCol).isNotNull && F.col(sourceCol).isNotNull &&
      F.col(sizeCol).isNotNull)
    val totals = knownTotals.getOrElse(
        rows.groupBy(sourceCol).agg(F.sum(F.col(sizeCol).cast("long")).as("__tot")))
      .select(F.col(sourceCol).cast("string").as("__mix_source"),
        F.col("__tot").cast("long").as("__tot"))
    import spark.implicits._
    val budgetDf = budgets.toSeq.toDF("__mix_source", "__budget")
    // bounded: |sources| rows — validate driver-side so a typo'd
    // budget name fails loudly instead of silently missing the mix
    val alloc = totals.join(budgetDf, Seq("__mix_source"))
      // guard the division: ANSI mode throws on div-by-zero before
      // the driver-side loud require below could name the source
      .withColumn("__full",
        F.when(F.col("__tot") > 0, F.expr("__budget div __tot")).cast("int"))
      .withColumn("__rem",
        F.when(F.col("__tot") > 0, F.expr("__budget % __tot")))
      .withColumn("__thr",
        F.floor(F.col("__rem").cast("double") / F.col("__tot").cast("double")
          * F.lit(4503599627370496.0)).cast("long"))
      .select("__mix_source", "__tot", "__full", "__thr")
      .collect()
    val present = alloc.map(_.getString(0)).toSet
    val missing = budgets.keySet -- present
    require(missing.isEmpty,
      s"mixToBudget: budgeted sources absent from the corpus: ${missing.toSeq.sorted.mkString(", ")}")
    alloc.foreach { r =>
      require(!r.isNullAt(1) && r.getLong(1) > 0,
        s"mixToBudget: source ${r.getString(0)} has zero/unknown total size — " +
          "its budget cannot be met (check the size column)")
      require(r.getInt(2) + 1 <= maxEpochs,
        s"mixToBudget: source ${r.getString(0)} needs ${r.getInt(2)} full epochs " +
          s"(budget/total) — past maxEpochs=$maxEpochs; check the budget's units")
      require(r.getLong(1) < (1L << 53),
        s"mixToBudget: source ${r.getString(0)} total size ${r.getLong(1)} breaks the " +
          "exact-double threshold bound (2^53); use a coarser size unit")
    }
    val allocDf = spark.createDataFrame(spark.sparkContext.parallelize(alloc.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__mix_source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__tot", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__full", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("__thr", org.apache.spark.sql.types.LongType))))
    val joined = rows.join(F.broadcast(allocDf),
      rows(sourceCol) === F.col("__mix_source"))
    // epochs ride ONE generator: full copies ∪ the hash-gated partial;
    // un-replicated docs emit nothing (no Filter on the derived hash)
    val epochs = F.concat(
      F.when(F.col("__full") > 0,
          F.sequence(F.lit(0), F.col("__full") - 1))
        .otherwise(F.array().cast("array<int>")),
      F.when(Sampling.hash52(F.col(idCol)) < F.col("__thr"),
          F.array(F.col("__full")))
        .otherwise(F.array().cast("array<int>")))
    joined.withColumn("epoch", F.explode(epochs))
      .drop("__mix_source", "__tot", "__full", "__thr")
  }
}
