package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Skew-mitigation operators. AQE's skew-join splitting covers joins;
  * heavily skewed AGGREGATION keys (one user producing 1% of 100 TB)
  * still funnel one reducer. `saltedStats` is the classic two-phase
  * fix: partial-aggregate on (key, salt) — spreading a hot key over
  * `salts` reducers — then combine the algebraic partials per key.
  * Sums ride exact DECIMAL so the result is bit-identical to the
  * unsalted single-phase aggregate regardless of salt placement.
  */
object Skew {

  /** Per-key (n, sum, avg) of `valueCol` with two-phase salted
    * aggregation. The salt comes from the input partition id — it
    * spreads a hot key unconditionally (a value-derived salt collapses
    * when the hot key's rows share one constant value, which is the
    * typical skew shape). Determinism of the RESULT comes from the
    * exact decimal algebra, not from salt placement.
    */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                  salts: Int = 16): DataFrame = {
    val keyCols = keys.map(F.col)
    df.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(salts)))
      .groupBy(keyCols :+ F.col("__salt"): _*)
      .agg(
        F.count(F.lit(1)).as("__n"),
        F.sum(F.col(valueCol).cast("decimal(30,2)")).as("__sum"))
      .groupBy(keyCols: _*)
      .agg(F.sum("__n").as("n"), F.sum("__sum").as("__total"))
      .select(keyCols ++ Seq(
        F.col("n"),
        F.col("__total").cast("double").as("sum"),
        (F.col("__total").cast("double") / F.col("n")).as("avg")): _*)
  }

  /** Salted equi-join for a skewed FACT side against a dimension too
    * big to broadcast: the fact side gains a partition-id salt, the
    * dimension side REPLICATES ×`salts` (one row per salt value —
    * explode of a literal range, map-only), and the join runs on
    * (keys, salt). A key carrying 1% of 100 TB spreads over `salts`
    * reducers instead of funnelling one; the dimension pays
    * |dim|·salts shuffle rows — the classic trade, sized by the
    * caller (salts × dim must stay well under the fact side).
    *
    * Result-identical to `fact.join(dim, keys, "inner")` by
    * construction — each fact row meets exactly the one dim replica
    * carrying its salt — so the driver's oracle can hash-check it
    * against the plain join. When AQE's skew-join splitting already
    * handles the pattern (sort-merge, post-shuffle), prefer that; the
    * explicit salt is for the cases AQE can't see: a skewed
    * broadcast-ineligible hash join, or engines/stages where the
    * runtime stats arrive too late.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = fact.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(salts)))
    val replicated = dim.withColumn("__salt",
      F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }
}
