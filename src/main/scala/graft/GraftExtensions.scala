package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CosineSim, JaccardSim, MinHashSignature, SimHash64, WordShingles}

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

  /** Foldable-int argument with a user-facing error instead of a raw
    * ClassCastException / IndexOutOfBoundsException from deep inside
    * Catalyst.
    */
  private def intArg(fn: String, es: Seq[Expression], i: Int): Int = {
    if (es.length <= i)
      throw new IllegalArgumentException(s"$fn expects ${i + 1} arguments, got ${es.length}")
    val e = es(i)
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn argument ${i + 1} must be a constant")
    e.eval() match {
      case n: Int  => n
      case n: Long => n.toInt
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be an integer, got $other")
    }
  }

  private def arity(fn: String, es: Seq[Expression], n: Int): Unit =
    if (es.length != n)
      throw new IllegalArgumentException(s"$fn expects $n arguments, got ${es.length}")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FoldSelfSimilarity)
    e.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(tokens, k) - MinHash signature of a string array"),
      (es: Seq[Expression]) => { arity("graft_minhash", es, 2)
        MinHashSignature(es.head, intArg("graft_minhash", es, 1)) }))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash of a string array"),
      (es: Seq[Expression]) => { arity("graft_simhash", es, 1); SimHash64(es.head) }))
    e.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(tokens, n) - distinct word n-grams"),
      (es: Seq[Expression]) => { arity("graft_shingles", es, 2)
        WordShingles(es.head, intArg("graft_shingles", es, 1)) }))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of float vectors"),
      (es: Seq[Expression]) => { arity("graft_cosine", es, 2); CosineSim(es.head, es(1)) }))
    e.injectFunction((FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard", "graft_jaccard(a, b) - exact Jaccard of string arrays"),
      (es: Seq[Expression]) => { arity("graft_jaccard", es, 2); JaccardSim(es.head, es(1)) }))
  }
}
