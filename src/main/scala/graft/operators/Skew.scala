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
}
