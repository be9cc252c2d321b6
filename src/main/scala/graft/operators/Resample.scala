package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Time-series regularization: densify a per-key daily series onto the
  * full day grid and carry the last observation forward — the classic
  * FX weekend/holiday gap-fill (the reference's rates simply have no
  * rows on non-trading days; every consumer downstream wants a dense
  * series). The as-of join (`AsOf`) answers point lookups; this
  * materializes the whole dense table.
  *
  * Scale shape: the day grid derives from a 1-row min/max aggregate
  * and broadcasts (a few thousand rows even for a decade); keys stay
  * distributed, the grid⋈daily join is a keyed left join, and the
  * fill is one window shuffle per key — no driver-side loops.
  */
object Resample {

  /** `daily` must be one row per (keys..., dayCol). Output adds every
    * missing day per key with `valCol` carried forward (leading days
    * before a key's first observation stay null) and an `observed`
    * 0/1 flag distinguishing real from filled rows.
    */
  def forwardFillDaily(daily: DataFrame, keyCols: Seq[String], dayCol: String,
                       valCol: String): DataFrame = {
    val keys = keyCols.map(F.col)
    val joined = denseGrid(daily, keyCols, dayCol)
    val w = Window.partitionBy(keys: _*).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      keys ++ Seq(
        F.col(dayCol),
        F.last(F.col(valCol), ignoreNulls = true).over(w).as(valCol),
        F.col(valCol).isNotNull.cast("int").as("observed")): _*)
  }

  /** The BigQuery `GAP_FILL` TVF's engine (day buckets): densify onto
    * the day grid, then fill each value column by its METHOD —
    * `locf` (last observation carried forward), `null` (leave the gap
    * empty), or `linear` (interpolate between the bracketing
    * observations; leading/trailing gaps with no bracket on one side
    * stay null, matching BigQuery). Output is BigQuery-shaped:
    * partitioning columns, the time column, then the value columns —
    * no extension flags. Same scale shape as [[forwardFillDaily]]:
    * broadcast day grid, keyed left join, and one window sort per key
    * shared by every fill column (the backward and forward frames
    * share the same partition/order spec, so the densified table is
    * sorted once).
    */
  def gapFill(daily: DataFrame, keyCols: Seq[String], dayCol: String,
              valCols: Seq[(String, String)]): DataFrame = {
    valCols.foreach { case (c, m) =>
      require(m == "locf" || m == "null" || m == "linear",
        s"GAP_FILL method '$m' for column $c is not supported (locf, null, linear)")
    }
    val keys = keyCols.map(F.col)
    val joined = denseGrid(daily, keyCols, dayCol)
    val w = Window.partitionBy(keys: _*).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys: _*).orderBy(dayCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // linear needs the bracketing (day, value) pairs on both sides;
    // carry them as struct columns so each side is ONE window function
    val linears = valCols.collect { case (c, "linear") => c }
    val bracketed = linears.foldLeft(joined) { (df, c) =>
      val obs = F.when(F.col(c).isNotNull,
        F.struct(F.col(dayCol).as("d"), F.col(c).as("v")))
      df.withColumn(s"__prev_$c", F.last(obs, ignoreNulls = true).over(w))
        .withColumn(s"__next_$c", F.first(obs, ignoreNulls = true).over(wf))
    }
    bracketed.select(
      keys ++ Seq(F.col(dayCol)) ++ valCols.map {
        case (c, "locf") => F.last(F.col(c), ignoreNulls = true).over(w).as(c)
        case (c, "linear") =>
          val p = F.col(s"__prev_$c"); val n = F.col(s"__next_$c")
          // fixed textual fold — p.v + (n.v - p.v) * (Δ/span) — so an
          // independent engine replays the double arithmetic exactly
          F.when(F.col(c).isNotNull, F.col(c))
            .when(p.isNotNull && n.isNotNull,
              p.getField("v") + (n.getField("v") - p.getField("v")) *
                (F.datediff(F.col(dayCol), p.getField("d")).cast("double") /
                  F.datediff(n.getField("d"), p.getField("d")).cast("double")))
            .as(c)
        case (c, _) => F.col(c)
      }: _*)
  }

  /** The sub-day GAP_FILL engine (round 13 — lifts the day-only
    * restriction): same contract as [[gapFill]] but on a TIMESTAMP
    * grid of `stepMicros`-wide buckets from the observed min to max.
    * `linear` interpolates on the micros axis — the fraction is a
    * fixed `(t−p)/(n−p)` fold over unix_micros longs, so an
    * independent engine replays the double arithmetic exactly. Same
    * scale shape: 1-row span aggregate, broadcast grid, keyed left
    * join, ONE window sort per key shared by every fill column.
    */
  def gapFillTs(daily: DataFrame, keyCols: Seq[String], tsCol: String,
                valCols: Seq[(String, String)], stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"GAP_FILL bucket width must be positive, got $stepMicros micros")
    valCols.foreach { case (c, m) =>
      require(m == "locf" || m == "null" || m == "linear",
        s"GAP_FILL method '$m' for column $c is not supported (locf, null, linear)")
    }
    val keys = keyCols.map(F.col)
    val span = daily.agg(F.min(tsCol).as("lo"), F.max(tsCol).as("hi"))
    val grid = span.select(F.explode(F.expr(
      s"sequence(lo, hi, INTERVAL $stepMicros MICROSECOND)")).as(tsCol))
    val joined = daily.select(keys: _*).distinct().crossJoin(F.broadcast(grid))
      .join(daily, keyCols :+ tsCol, "left")
    val w = Window.partitionBy(keys: _*).orderBy(tsCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys: _*).orderBy(tsCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val linears = valCols.collect { case (c, "linear") => c }
    val bracketed = linears.foldLeft(joined) { (df, c) =>
      val obs = F.when(F.col(c).isNotNull,
        F.struct(F.col(tsCol).as("d"), F.col(c).as("v")))
      df.withColumn(s"__prev_$c", F.last(obs, ignoreNulls = true).over(w))
        .withColumn(s"__next_$c", F.first(obs, ignoreNulls = true).over(wf))
    }
    def micros(c: org.apache.spark.sql.Column) = F.unix_micros(c)
    bracketed.select(
      keys ++ Seq(F.col(tsCol)) ++ valCols.map {
        case (c, "locf") => F.last(F.col(c), ignoreNulls = true).over(w).as(c)
        case (c, "linear") =>
          val p = F.col(s"__prev_$c"); val n = F.col(s"__next_$c")
          F.when(F.col(c).isNotNull, F.col(c))
            .when(p.isNotNull && n.isNotNull,
              p.getField("v") + (n.getField("v") - p.getField("v")) *
                ((micros(F.col(tsCol)) - micros(p.getField("d"))).cast("double") /
                  (micros(n.getField("d")) - micros(p.getField("d"))).cast("double")))
            .as(c)
        case (c, _) => F.col(c)
      }: _*)
  }

  /** BigQuery's `RANGE_SESSIONIZE` TVF engine: every input row plus a
    * `session_range` struct covering the session of transitively
    * connected ranges within its partition. `mode` is BigQuery's
    * sessionize_option: `MEETS` (default) connects overlapping OR
    * adjacent ranges (`[1,5)` and `[5,8)` share a session), `OVERLAPS`
    * requires strict overlap. A NULL bound is UNBOUNDED on that side —
    * an unbounded end glues every later range in the partition into
    * the same session; a session containing any unbounded side
    * reports that side of `session_range` as NULL.
    *
    * Scale shape: one shuffle on the partitioning columns; the classic
    * interval-merge as two window passes over the SAME sort (running
    * max-end island detection, then per-island extents) — never a
    * self-join, never a collect. Like any sessionization the sort is
    * per-key; a skewed key sorts long but spills, it does not break.
    */
  def sessionizeRanges(df: DataFrame, rangeCol: String, partCols: Seq[String],
                       mode: String = "MEETS"): DataFrame = {
    require(mode == "MEETS" || mode == "OVERLAPS",
      s"RANGE_SESSIONIZE mode must be 'MEETS' or 'OVERLAPS', got '$mode'")
    require(df.columns.contains(rangeCol),
      s"RANGE_SESSIONIZE: no column '$rangeCol' in ${df.columns.mkString(", ")}")
    val keys = partCols.map(F.col)
    val s = F.col(rangeCol).getField("range_start")
    val e = F.col(rangeCol).getField("range_end")
    val w = Window.partitionBy(keys: _*).orderBy(s.asc_nulls_first, e.asc_nulls_last)
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newSession = {
      val punb = F.coalesce(F.max(e.isNull.cast("int")).over(prior), F.lit(0))
      val pmax = F.max(e).over(prior)
      val gap = if (mode == "MEETS") s > pmax else s >= pmax
      F.when(pmax.isNull && punb === 0, 1) // first row of the partition
        .when(punb === 1, 0)               // some prior end is +inf
        .when(s.isNull, 0)                 // this start is -inf
        .when(gap, 1).otherwise(0)
    }
    val staged = df.withColumn("__rs_sess", F.sum(newSession).over(run))
    val w2 = Window.partitionBy(keys :+ F.col("__rs_sess"): _*)
    val sessStart = F.when(F.max(s.isNull.cast("int")).over(w2) === 1, F.lit(null))
      .otherwise(F.min(s).over(w2))
    val sessEnd = F.when(F.max(e.isNull.cast("int")).over(w2) === 1, F.lit(null))
      .otherwise(F.max(e).over(w2))
    staged
      .withColumn("session_range",
        F.struct(sessStart.as("range_start"), sessEnd.as("range_end")))
      .drop("__rs_sess")
  }

  /** `daily` left-joined onto the full (keys × day-span) grid: the
    * shared densify step — min/max span aggregate, broadcast day
    * sequence, distinct keys cross join.
    */
  private def denseGrid(daily: DataFrame, keyCols: Seq[String], dayCol: String): DataFrame = {
    val keys = keyCols.map(F.col)
    val span = daily.agg(F.min(dayCol).as("lo"), F.max(dayCol).as("hi"))
    val days = span.select(
      F.explode(F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))).as(dayCol))
    daily.select(keys: _*).distinct().crossJoin(F.broadcast(days))
      .join(daily, keyCols :+ dayCol, "left")
  }
}
