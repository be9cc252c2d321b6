package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.JaccardSim

/** Folds self-similarity calls that are constant by construction:
  * JaccardSim(a, a) ≡ 1.0 for every non-null input (including the
  * empty set, by definition of the operator). Null-preserving fold:
  * `If(IsNull(a), null, 1.0)` — the per-row hash-set pass (and the
  * second evaluation of `a`) disappears while null semantics stay
  * bit-identical. Generated pipelines (join conditions built from
  * templates) produce such calls.
  */
object FoldSelfSimilarity extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{If, IsNull}
  import org.apache.spark.sql.types.DoubleType
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case JaccardSim(a, b) if a.semanticEquals(b) =>
      if (a.nullable) If(IsNull(a), Literal(null, DoubleType), Literal(1.0)) else Literal(1.0)
  }
}

/** SparkSessionExtensions entry point: makes the graft native
  * functions available in ANY session via configuration —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — the standard mechanism for attaching a library to clusters the
  * user doesn't build sessions for (Thrift server, notebooks,
  * spark-submit). Equivalent to calling
  * `graft.functions.native.registerAll` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FoldSelfSimilarity)
    // same validated builders as native.registerAll — one list, two
    // registration surfaces, zero drift
    for ((name, usage, builder) <- graft.functions.native.sqlFunctions)
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
  }
}
