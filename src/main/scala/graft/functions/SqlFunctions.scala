package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL spellings for the native vector expressions — BigQuery's
  * vector scalar surface (`COSINE_DISTANCE`, `EUCLIDEAN_DISTANCE`,
  * the functions its VECTOR_SEARCH documentation defines) wired to
  * [[VecDistance]] through the session function registry, NOT a
  * Scala UDF: calls stay codegen'd and the strict index-order
  * accumulation contract (DuckDB-replayable) carries over to SQL
  * statements verbatim.
  *
  * Arguments are cast to `array<float>` at the registry boundary
  * (SQL literals arrive as array<double>/array<int>); registration is
  * idempotent and session-scoped, invoked from both
  * [[graft.GraftSession]] and [[graft.GraftSql.load]] so every entry
  * point sees the spellings.
  */
object SqlFunctions {

  private def vecF(e: Expression): Expression = Cast(e, ArrayType(FloatType))

  def register(spark: SparkSession): Unit = {
    def dist(mode: String)(args: Seq[Expression]): Expression = {
      require(args.length == 2,
        s"${mode.toLowerCase}_distance expects exactly 2 vector arguments, got ${args.length}")
      VecDistance(vecF(args.head), vecF(args(1)), mode)
    }
    Bridge.registerFunction(spark, "cosine_distance", dist("COSINE"))
    Bridge.registerFunction(spark, "euclidean_distance", dist("EUCLIDEAN"))
  }
}
