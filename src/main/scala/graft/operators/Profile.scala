package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Data-quality profiling — the validation step every production ETL
  * (including the reference's, which logs row counts per task) runs
  * before trusting a load. One pass over the table computes per-column
  * null counts, approximate distincts, and min/max; all aggregates are
  * algebraic, so the profile is a single map-side-combined shuffle
  * regardless of table width or size.
  */
object Profile {

  /** One row per column: (column, n_rows, n_nulls, approx_distinct,
    * min, max) with min/max rendered as strings for schema uniformity.
    */
  def columns(df: DataFrame): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        F.count(F.lit(1)).as(s"__n_$c"),
        F.count(F.when(F.col(c).isNull, 1)).as(s"__nulls_$c"),
        F.approx_count_distinct(F.col(c)).as(s"__dist_$c"),
        F.min(F.col(c)).cast("string").as(s"__min_$c"),
        F.max(F.col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = df.columns.map { c =>
      F.struct(
        F.lit(c).as("column"),
        F.col(s"__n_$c").as("n_rows"),
        F.col(s"__nulls_$c").as("n_nulls"),
        F.col(s"__dist_$c").as("approx_distinct"),
        F.col(s"__min_$c").as("min_value"),
        F.col(s"__max_$c").as("max_value"))
    }
    wide.select(F.explode(F.array(perCol: _*)).as("p")).select("p.*")
  }

  /** Exact-distinct variant for oracle-grade determinism (HLL estimates
    * are engine-specific); costs one extra shuffle per column batch.
    */
  def columnsExact(df: DataFrame): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        F.count(F.lit(1)).as(s"__n_$c"),
        F.count(F.when(F.col(c).isNull, 1)).as(s"__nulls_$c"),
        F.countDistinct(F.col(c)).as(s"__dist_$c"),
        F.min(F.col(c)).cast("string").as(s"__min_$c"),
        F.max(F.col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = df.columns.map { c =>
      F.struct(
        F.lit(c).as("column"),
        F.col(s"__n_$c").as("n_rows"),
        F.col(s"__nulls_$c").as("n_nulls"),
        F.col(s"__dist_$c").as("n_distinct"),
        F.col(s"__min_$c").as("min_value"),
        F.col(s"__max_$c").as("max_value"))
    }
    wide.select(F.explode(F.array(perCol: _*)).as("p")).select("p.*")
  }
}
