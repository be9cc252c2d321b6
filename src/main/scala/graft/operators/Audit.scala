package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Data-completeness audit over a time-partitioned fact table — the
  * operational monitor behind the reference's @daily/every-minute
  * Airflow cadence (idempotent_fx_pipeline.py:16-22 schedules the
  * fetch; nothing in the reference notices a feed that silently stops
  * until a report looks wrong). Warehouses run exactly this grid
  * query as the freshness/completeness check (dbt source freshness;
  * BigQuery INFORMATION_SCHEMA.PARTITIONS row counts): which
  * (day × key) partitions did the feed miss, and how big is each
  * cell?
  */
object Audit {

  /** One row per (day × key) cell of the expected grid, `n_rows` = 0
    * marking the missing partitions:
    *  - the day span defaults to the observed min/max day; an SLA
    *    check pins `to` (e.g. yesterday) so a silent TAIL gap — the
    *    dead-feed case the observed max would hide — still surfaces,
    *    and `from` bounds the scan to the audit window;
    *  - keys = the distinct observed key set: a key missing on SOME
    *    days shows 0 there; a key that never reported at all needs a
    *    caller-supplied expectation — join your dim/allow-list against
    *    [[completeness]] output instead (the A26 RefIntegrity shape).
    *
    * Scale: one keyed count aggregate with map-side partials on the
    * same (day, keys) the A8 layout partitions by (a `from`/`to`
    * window becomes a partition-pruned scan); the day grid is a 1-row
    * span aggregate exploded and broadcast; the key set one slim
    * distinct. Output bounded at |days| × |keys|.
    */
  def completeness(df: DataFrame, tsCol: String, keyCols: Seq[String],
                   from: Option[String] = None,
                   to: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "completeness needs at least one key column")
    for (f <- from; t <- to)
      require(java.sql.Date.valueOf(f).compareTo(java.sql.Date.valueOf(t)) <= 0,
        s"audit window is empty: from=$f is after to=$t")
    val keys = keyCols.map(F.col)
    val day = F.to_date(F.date_trunc("day", F.col(tsCol)))
    val bounded = (from, to) match {
      case (None, None) => df
      case _ =>
        val lo = from.map(s => day >= F.lit(java.sql.Date.valueOf(s))).getOrElse(F.lit(true))
        val hi = to.map(s => day <= F.lit(java.sql.Date.valueOf(s))).getOrElse(F.lit(true))
        df.filter(lo && hi)
    }
    val counts = bounded.groupBy(day.as("day") +: keys: _*)
      .agg(F.count(F.lit(1)).as("n_rows"))
    val span = counts.agg(
      from.map(s => F.lit(java.sql.Date.valueOf(s))).getOrElse(F.min(F.col("day"))).as("lo"),
      to.map(s => F.lit(java.sql.Date.valueOf(s))).getOrElse(F.max(F.col("day"))).as("hi"))
    val days = span.select(
      F.explode(F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))).as("day"))
    val grid = counts.select(keys: _*).distinct().crossJoin(F.broadcast(days))
    grid.join(counts, keyCols :+ "day", "left")
      .select(F.col("day") +: keys :+
        F.coalesce(F.col("n_rows"), F.lit(0L)).as("n_rows"): _*)
  }

  /** The alarm face: only the empty cells. */
  def missingPartitions(df: DataFrame, tsCol: String, keyCols: Seq[String],
                        from: Option[String] = None,
                        to: Option[String] = None): DataFrame =
    completeness(df, tsCol, keyCols, from, to).where(F.col("n_rows") === 0)
}
