package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.functions.text

/** Corpus n-gram language-model scoring — the CCNet recipe
  * (Wenzek et al. 2020) one order up from E10's unigram surprisal: a
  * BIGRAM model with Laplace smoothing scores each document's average
  * token surprisal, the standard "how much does this text look like
  * the corpus" quality signal (low = fluent/common, high = noise,
  * boilerplate code, wrong-language fragments).
  *
  * Model: P(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁) + V), so
  * surprisal(w₁w₂) = ln(c(w₁)+V) − ln(c(w₁w₂)+1) and a doc scores
  * the mean over its bigram OCCURRENCES (multiplicity counts).
  *
  * Scale shape (the E5 tf/df discipline): training is two keyed
  * count aggregates over the token/bigram streams (map-side partials
  * collapse before each exchange); V rides as a broadcast one-row
  * frame; scoring joins the doc bigram stream to the bigram table on
  * (w₁,w₂) and to the unigram table on w₁ — both plain shuffled
  * equi-joins (vocabulary and bigram tables are corpus-sized at
  * 100 TB; nothing here assumes they broadcast). Train once per
  * corpus version, persist the count tables, and score any stream
  * against them via `model = Some((unigrams, bigrams))`.
  *
  * Like E10 this is a libm (`ln`) surface — rows-only at the driver
  * gate, pinned against an independent recompute in the spec.
  */
object LanguageModel {

  /** (w1, c1) unigram occurrence counts. */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(text.tokens(F.col(textCol)).as("__toks"))
      .select(F.explode(F.col("__toks")).as("w1"))
      .groupBy("w1").agg(F.count(F.lit(1)).as("c1"))

  /** (w1, w2, c12) bigram occurrence counts. */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    bigrams(docs, null, textCol).groupBy("w1", "w2").agg(F.count(F.lit(1)).as("c12"))

  /** Per-doc bigram occurrence stream (idCol nullable for the count
    * faces): tokens staged first (the HOF rule), pairs via zip_with
    * over two slices — map-only.
    */
  private def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = Option(idCol).map(F.col).toSeq
    val toks = docs.select(cols :+ text.tokens(F.col(textCol)).as("__toks"): _*)
    val n1 = F.greatest(F.size(F.col("__toks")) - 1, F.lit(0))
    toks.select(cols :+ F.explode(F.zip_with(
        F.slice(F.col("__toks"), F.lit(1), n1),
        F.slice(F.col("__toks"), F.lit(2), n1),
        (a, b) => F.struct(a.as("w1"), b.as("w2")))).as("__bg"): _*)
      .select(cols :+ F.col("__bg.w1") :+ F.col("__bg.w2"): _*)
  }

  /** Score every document: (idCol, n_bigrams, avg_surprisal). Docs
    * with fewer than two tokens have no bigrams — they surface with
    * n_bigrams = 0 and NULL surprisal (scoreless, not silently
    * dropped; route them by length rules instead).
    *
    * `model`: optional precomputed (unigramCounts, bigramCounts)
    * tables — the deployment shape. Default trains on `docs` itself
    * (self-scoring, the corpus-quality audit shape). Smoothing makes
    * unseen bigrams finite either way.
    */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                      model: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val (uni, big) = model.getOrElse((unigramCounts(docs, textCol), bigramCounts(docs, textCol)))
    val v = F.broadcast(uni.agg(F.count(F.lit(1)).cast("double").as("__V")))
    val stream = bigrams(docs, idCol, textCol)
    val scored = stream
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(v)
      .select(F.col(idCol),
        (F.log(F.coalesce(F.col("c1"), F.lit(0L)).cast("double") + F.col("__V")) -
          F.log(F.coalesce(F.col("c12"), F.lit(0L)).cast("double") + 1.0)).as("__s"))
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_bigrams"), F.avg("__s").as("avg_surprisal"))
    docs.select(F.col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(F.col(idCol),
        F.coalesce(F.col("n_bigrams"), F.lit(0L)).as("n_bigrams"),
        F.col("avg_surprisal"))
  }
}
