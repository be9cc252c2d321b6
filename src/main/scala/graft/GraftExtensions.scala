package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, JaccardSim, MinHashSignature, SimHash64, WordShingles}

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
    e.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(tokens, k) - MinHash signature of a string array"),
      (es: Seq[Expression]) => MinHashSignature(es.head, es(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash of a string array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(tokens, n) - distinct word n-grams"),
      (es: Seq[Expression]) => WordShingles(es.head, es(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of float vectors"),
      (es: Seq[Expression]) => CosineSim(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard", "graft_jaccard(a, b) - exact Jaccard of string arrays"),
      (es: Seq[Expression]) => JaccardSim(es.head, es(1))))
  }
}
