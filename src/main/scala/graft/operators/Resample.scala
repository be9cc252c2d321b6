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
    val span = daily.agg(F.min(dayCol).as("lo"), F.max(dayCol).as("hi"))
    val days = span.select(
      F.explode(F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))).as(dayCol))
    val grid = daily.select(keys: _*).distinct().crossJoin(F.broadcast(days))
    val joined = grid.join(daily, keyCols :+ dayCol, "left")
    val w = Window.partitionBy(keys: _*).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      keys ++ Seq(
        F.col(dayCol),
        F.last(F.col(valCol), ignoreNulls = true).over(w).as(valCol),
        F.col(valCol).isNotNull.cast("int").as("observed")): _*)
  }
}
