package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.functions.text

/** Posting-list statistics — the distributed heart of TF-IDF scoring
  * and inverted-index construction over a training corpus.
  *
  * Scale shape: `explode` fans each document out to its token count
  * (bounded by document length, embarrassingly parallel), then two
  * keyed aggregations — (doc, token) → tf, then token → (df,
  * tf_total) — each a single hash shuffle with map-side partial
  * aggregation. Deliberately NOT countDistinct (whose Expand doubles
  * the exploded stream); collapsing to per-doc tf rows first makes the
  * second shuffle move one row per distinct (doc, token) pair.
  */
object InvertedIndex {

  /** Per-(doc, token) term frequency. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(F.col(idCol).as("doc_id"), text.tokens(F.col(textCol)).as("__toks"))
      .select(F.col("doc_id"), F.explode(F.col("__toks")).as("token"))
      .groupBy("doc_id", "token").agg(F.count(F.lit(1)).as("tf"))

  /** Per-token corpus stats: document frequency + total term count. */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    termFrequencies(docs, idCol, textCol)
      .groupBy("token")
      .agg(F.count(F.lit(1)).as("df"), F.sum("tf").as("tf_total"))

  /** TF-IDF weights per (doc, token): tf · ln((N+1)/(df+1)). The idf
    * table is tiny (vocabulary-sized) and broadcasts; N comes in as an
    * argument so callers amortize the corpus count.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String, corpusSize: Long): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val idf = tf.groupBy("token").agg(F.count(F.lit(1)).as("df"))
      .withColumn("idf", F.log(F.lit(corpusSize + 1.0) / (F.col("df") + 1.0)))
    tf.join(F.broadcast(idf.select("token", "idf")), "token")
      .select(F.col("doc_id"), F.col("token"), (F.col("tf") * F.col("idf")).as("weight"))
  }
}
