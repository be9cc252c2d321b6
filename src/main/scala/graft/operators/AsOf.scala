package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join — the canonical FX-rate lookup the reference
  * pipeline implies ("which rate was in effect at time t"): for every
  * left row, attach the value of the latest right row with the same
  * key and `rightTs <= leftTs`.
  *
  * Spark-first composition instead of a custom physical operator: tag
  * both sides, union, and run one `last(..., ignoreNulls)` window over
  * (key, time). That is a single shuffle + per-partition sort — the
  * same cost profile as a sort-merge join, with no range-explosion —
  * and it scales to arbitrarily asymmetric table sizes because neither
  * side is ever broadcast or nested-looped.
  */
object AsOf {

  /** @param left      probe side; all its columns survive
    * @param right     reference side: (keys ++ rightTs ++ valueCols)
    * @param keys      equi-join keys
    * @param leftTs    event-time column on `left`
    * @param rightTs   effective-from column on `right`
    * @param valueCols columns of `right` to carry (as-of values)
    * @param inner     drop left rows with no as-of match (else null-fill)
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, valueCols: Seq[String],
           inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    // one unioned stream: right rows carry the value payload, left rows
    // carry nulls there; ties at equal timestamps order right-before-left
    // so a rate taking effect exactly at t applies to events at t.
    val l = left
      .withColumn("__t", F.col(leftTs))
      .withColumn("__isLeft", F.lit(1))
      .withColumn("__vals", F.lit(null).cast(
        org.apache.spark.sql.types.StructType(
          valueCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))))
    val r = right
      .withColumn("__t", F.col(rightTs))
      .withColumn("__isLeft", F.lit(0))
      .withColumn("__vals", F.struct(valueCols.map(F.col): _*))
    val lNorm = l.select((keys ++ Seq("__t", "__isLeft", "__vals")).map(F.col) ++
      leftCols.map(c => F.col(c).as(s"__l_$c")): _*)
    val rNorm = r.select((keys ++ Seq("__t", "__isLeft", "__vals")).map(F.col) ++
      leftCols.map(c => F.lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val w = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.col("__t").asc, F.col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lNorm.unionByName(rNorm)
      .withColumn("__asof", F.last(F.col("__vals"), ignoreNulls = true).over(w))
      .filter(F.col("__isLeft") === 1)
    val matched = if (inner) joined.filter(F.col("__asof").isNotNull) else joined
    matched.select(
      leftCols.map(c => F.col(s"__l_$c").as(c)) ++
        valueCols.map(c => F.col(s"__asof.$c").as(c)): _*)
  }
}
