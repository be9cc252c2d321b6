package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
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

  /** The INTEGER face of [[bigramSurprisal]] (the E15b/c/d `_hits`
    * discipline backported to E15): per-doc counts of bigram positions
    * by the Laplace term that carries them — n_seen (c(w₁w₂)
    * observed), n_ctx (context w₁ known, bigram unseen), n_unseen
    * (w₁ not in the vocabulary) — plus the integer count sums the
    * estimate actually reads (Σc₁₂ and Σc₁ over the doc's positions).
    * Count tables, both joins and the routing are integer and
    * order-free, so the whole pipeline replays under the DuckDB hash
    * gate; the libm `ln` stays on the rows-only sibling. Same scale
    * shape as [[bigramSurprisal]]: two count aggregates + two
    * equi-joins, no corpus-sized broadcast assumed.
    */
  def bigramHits(docs: DataFrame, idCol: String, textCol: String,
                 model: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val (uni, big) = model.getOrElse((unigramCounts(docs, textCol), bigramCounts(docs, textCol)))
    val scored = bigrams(docs, idCol, textCol)
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_bigrams"),
        F.count(F.col("c12")).as("n_seen"),
        F.sum(F.when(F.col("c12").isNull && F.col("c1").isNotNull, 1L)
          .otherwise(0L)).as("n_ctx"),
        F.sum(F.when(F.col("c1").isNull, 1L).otherwise(0L)).as("n_unseen"),
        F.sum(F.coalesce(F.col("c12"), F.lit(0L))).as("c12_sum"),
        F.sum(F.coalesce(F.col("c1"), F.lit(0L))).as("c1_sum"))
    docs.select(F.col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(F.col(idCol),
        F.coalesce(F.col("n_bigrams"), F.lit(0L)).as("n_bigrams"),
        F.coalesce(F.col("n_seen"), F.lit(0L)).as("n_seen"),
        F.coalesce(F.col("n_ctx"), F.lit(0L)).as("n_ctx"),
        F.coalesce(F.col("n_unseen"), F.lit(0L)).as("n_unseen"),
        F.coalesce(F.col("c12_sum"), F.lit(0L)).as("c12_sum"),
        F.coalesce(F.col("c1_sum"), F.lit(0L)).as("c1_sum"))
  }

  /** A trained interpolated Kneser-Ney bigram model (Kneser & Ney
    * 1995; the Chen & Goodman 1999 interpolated form) — the NORMALIZED
    * smoothing beside Stupid Backoff's unnormalized ratios:
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *              + D·N₁₊(w₁·)/c(w₁·) · P_cont(w₂)
    *   P_cont(w₂) = N₁₊(·w₂) / B
    *
    * where c(w₁·) = Σ_w c(w₁w) (the context total), N₁₊(w₁·) = distinct
    * continuations of w₁, N₁₊(·w₂) = distinct contexts preceding w₂,
    * and B = distinct bigram types. The CONTINUATION counts are what
    * distinguish KN: a word that appears often but only after one
    * context ("francisco") gets a low unseen-context probability.
    *
    * All four quantities derive from the ONE bigram count table — the
    * corpus is touched once; `ctx` and `cont` are each one more keyed
    * aggregate over that table (count-table-sized, the reason KN is
    * practical here despite Brants et al.'s caveat: no corpus-sized
    * normalization pass exists at score time).
    */
  final case class KnModel(big: DataFrame, ctx: DataFrame, cont: DataFrame,
                           totalBigramTypes: Long)

  /** Train the interpolated-KN tables: the E15 bigram count pass plus
    * one keyed aggregate per order (context totals + distinct
    * continuations by w₁; distinct preceding contexts by w₂) and the
    * bigram-type total as the one driver scalar.
    */
  def trainKneserNey(docs: DataFrame, textCol: String): KnModel = {
    val big = bigramCounts(docs, textCol)
    val ctx = big.groupBy("w1")
      .agg(F.sum("c12").cast("long").as("ctx1"), F.count(F.lit(1)).as("n1p"))
    val cont = big.groupBy("w2").agg(F.count(F.lit(1)).as("cont2"))
    KnModel(big, ctx, cont, big.count())
  }

  /** Score every document under interpolated Kneser-Ney. Per-doc
    * output:
    *
    *   (idCol, n_bigrams, n_big, n_cont, n_unseen, kn_surprisal)
    *
    * where the n_* columns count bigram positions by the probability
    * mass that carried them — n_big: the bigram was observed (the
    * discounted ML term is live); n_cont: bigram unseen but w₂ is a
    * known continuation (the interpolated backoff term carries);
    * n_unseen: w₂ was never a continuation (P would be 0 — floored at
    * 1/(B+1), one type beyond the observed continuation mass, so
    * −ln P stays finite; a documented closure, as OOV handling always
    * is). The n_* face is INTEGER and order-free — the hash-oracle
    * face of the count tables and join routing (the E15b split) —
    * while kn_surprisal (mean −ln P) is libm, rows-only, 1e-9-pinned
    * in LanguageModelSpec. Docs with <2 tokens surface with
    * n_bigrams = 0 and NULL surprisal (the E15 contract).
    *
    * An unseen CONTEXT (c(w₁·) unknown) scores as pure P_cont — the
    * λ-weight has no ML mass to redistribute, so the continuation
    * distribution is the whole estimate.
    *
    * `discount` defaults to 0.75 — the published fixed-D choice,
    * exactly representable in binary so both engines see one value.
    * Scale shape: three shuffled count-table equi-joins over the
    * map-only bigram stream + one keyed fold (the E15 discipline).
    */
  def kneserNey(docs: DataFrame, idCol: String, textCol: String,
                model: Option[KnModel] = None,
                discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount=$discount must be in (0, 1)")
    val m = model.getOrElse(trainKneserNey(docs, textCol))
    require(m.totalBigramTypes > 0, "KN model trained on a corpus with no bigrams")
    val j = bigrams(docs, idCol, textCol)
      .join(m.big, Seq("w1", "w2"), "left")
      .join(m.ctx, Seq("w1"), "left")
      .join(m.cont, Seq("w2"), "left")
    val bTot = F.lit(m.totalBigramTypes.toDouble)
    val pc = F.coalesce(F.col("cont2"), F.lit(0L)).cast("double") / bTot
    val disc = F.lit(discount)
    val lvl = F.when(F.col("c12").isNotNull, 2)
      .when(F.col("cont2").isNotNull, 1).otherwise(0)
    val pMain = F.when(F.col("ctx1").isNotNull,
      F.greatest(F.coalesce(F.col("c12"), F.lit(0L)).cast("double") - disc, F.lit(0.0)) /
        F.col("ctx1").cast("double") +
        disc * F.col("n1p").cast("double") / F.col("ctx1").cast("double") * pc)
      .otherwise(pc)
    val floor = F.lit(1.0 / (m.totalBigramTypes.toDouble + 1.0))
    val p = F.when(pMain > 0.0, pMain).otherwise(floor)
    val scored = j
      .select(F.col(idCol), lvl.as("__lvl"), (-F.log(p)).as("__s"))
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_bigrams"),
        F.sum(F.when(F.col("__lvl") === 2, 1L).otherwise(0L)).as("n_big"),
        F.sum(F.when(F.col("__lvl") === 1, 1L).otherwise(0L)).as("n_cont"),
        F.sum(F.when(F.col("__lvl") === 0, 1L).otherwise(0L)).as("n_unseen"),
        F.avg("__s").as("kn_surprisal"))
    docs.select(F.col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(F.col(idCol),
        F.coalesce(F.col("n_bigrams"), F.lit(0L)).as("n_bigrams"),
        F.coalesce(F.col("n_big"), F.lit(0L)).as("n_big"),
        F.coalesce(F.col("n_cont"), F.lit(0L)).as("n_cont"),
        F.coalesce(F.col("n_unseen"), F.lit(0L)).as("n_unseen"),
        F.col("kn_surprisal"))
  }

  /** Trigram interpolated Kneser-Ney (E15d) — the full published
    * recursion one order above [[KnModel]] (Chen & Goodman 1999):
    *
    *   P(w₃|w₁w₂) = max(c₁₂₃−D,0)/c(w₁w₂·)
    *                + D·N₁₊(w₁w₂·)/c(w₁w₂·) · P̂(w₃|w₂)
    *   P̂(w₃|w₂)  = max(N₁₊(·w₂w₃)−D,0)/N₁₊(·w₂·)
    *                + D·N₁₊(w₂·*)/N₁₊(·w₂·) · P_cont(w₃)
    *   P_cont(w₃) = N₁₊(·w₃)/B
    *
    * — raw counts at the top order, CONTINUATION (type) counts below:
    * the lower orders ask "in how many distinct contexts", not "how
    * often", which is the whole Kneser-Ney idea. Every table derives
    * from the ONE trigram-type table (plus the bigram table for the
    * unigram-continuation level): `ctx12`/`n23`/`w2tab` are each one
    * keyed aggregate over `tri` — count-table-sized, never
    * corpus-sized, which is what keeps normalized KN practical here
    * against Brants et al.'s distributed-counts caveat.
    */
  final case class Kn3Model(tri: DataFrame, ctx12: DataFrame, n23: DataFrame,
                            w2tab: DataFrame, cont1: DataFrame,
                            totalBigramTypes: Long)

  /** Train the trigram-KN tables: one position stream over the corpus
    * (touched once), a trigram-type count, three aggregates over it,
    * the bigram-type table for the continuation base, and one driver
    * scalar (B).
    */
  def trainKneserNey3(docs: DataFrame, textCol: String): Kn3Model = {
    val pos = positions(docs, null, textCol)
    val tri = pos.filter(F.col("p2").isNotNull)
      .groupBy(F.col("p2").as("w1"), F.col("p1").as("w2"), F.col("w").as("w3"))
      .agg(F.count(F.lit(1)).cast("long").as("c123"))
    val ctx12 = tri.groupBy("w1", "w2")
      .agg(F.sum("c123").cast("long").as("c12dot"), F.count(F.lit(1)).as("n1p12"))
    val n23 = tri.groupBy("w2", "w3").agg(F.count(F.lit(1)).as("n23"))
    // N₁₊(·w₂·) = distinct (w1,w3) per w2 = tri rows per w2;
    // N₁₊(w₂·*) = distinct w3 continuing w2 in a trigram context
    val w2tab = tri.groupBy("w2").agg(F.count(F.lit(1)).as("mid2"))
      .join(n23.groupBy("w2").agg(F.count(F.lit(1)).as("n1p2")), Seq("w2"))
    val big = pos.filter(F.col("p1").isNotNull)
      .groupBy(F.col("p1").as("wa"), F.col("w").as("wb"))
      .agg(F.count(F.lit(1)).as("cab"))
    val cont1 = big.groupBy(F.col("wb").as("w3")).agg(F.count(F.lit(1)).as("cont1"))
    Kn3Model(tri, ctx12, n23, w2tab, cont1, big.count())
  }

  /** Score every document's TRIGRAM positions (i ≥ 3 — both context
    * words present; the 1-2 prefix positions are the lower-order
    * models' job) under trigram interpolated KN. Per-doc output:
    *
    *   (idCol, n_trigrams, n_tri, n_cont2, n_cont1, n_unseen,
    *    kn3_surprisal)
    *
    * where the n_* columns classify positions by the deepest
    * probability mass that carried them — n_tri: trigram observed;
    * n_cont2: unseen trigram whose (w₂,w₃) is a known trigram-level
    * continuation; n_cont1: only the unigram continuation knows w₃;
    * n_unseen: w₃ never continues anything (floored at 1/(B+1), the
    * E15c closure). The integer face is order-free and SQL-replayable
    * (the E15b/E15c split); kn3_surprisal (mean −ln P) is libm,
    * rows-only, 1e-9-pinned in the spec. Docs with <3 tokens surface
    * with n_trigrams = 0 and NULL surprisal. Unseen CONTEXTS at
    * either order fall through to the next level's whole distribution
    * (the λ-weight has no mass to redistribute).
    *
    * Scale shape: five shuffled count-table equi-joins over the
    * map-only trigram position stream + one keyed fold — the E15
    * discipline; all tables persist like any count table.
    */
  def kneserNey3(docs: DataFrame, idCol: String, textCol: String,
                 model: Option[Kn3Model] = None,
                 discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount=$discount must be in (0, 1)")
    val m = model.getOrElse(trainKneserNey3(docs, textCol))
    require(m.totalBigramTypes > 0, "KN3 model trained on a corpus with no bigrams")
    val pos3 = positions(docs, idCol, textCol).filter(F.col("p2").isNotNull)
      .select(F.col(idCol), F.col("p2").as("w1"), F.col("p1").as("w2"), F.col("w").as("w3"))
    val j = pos3
      .join(m.tri, Seq("w1", "w2", "w3"), "left")
      .join(m.ctx12, Seq("w1", "w2"), "left")
      .join(m.n23, Seq("w2", "w3"), "left")
      .join(m.w2tab, Seq("w2"), "left")
      .join(m.cont1, Seq("w3"), "left")
    val bTot = F.lit(m.totalBigramTypes.toDouble)
    val disc = F.lit(discount)
    val pc = F.coalesce(F.col("cont1"), F.lit(0L)).cast("double") / bTot
    val p2c = F.when(F.col("mid2").isNotNull,
      F.greatest(F.coalesce(F.col("n23"), F.lit(0L)).cast("double") - disc, F.lit(0.0)) /
        F.col("mid2").cast("double") +
        disc * F.col("n1p2").cast("double") / F.col("mid2").cast("double") * pc)
      .otherwise(pc)
    val p3 = F.when(F.col("c12dot").isNotNull,
      F.greatest(F.coalesce(F.col("c123"), F.lit(0L)).cast("double") - disc, F.lit(0.0)) /
        F.col("c12dot").cast("double") +
        disc * F.col("n1p12").cast("double") / F.col("c12dot").cast("double") * p2c)
      .otherwise(p2c)
    val floor = F.lit(1.0 / (m.totalBigramTypes.toDouble + 1.0))
    val p = F.when(p3 > 0.0, p3).otherwise(floor)
    val lvl = F.when(F.col("c123").isNotNull, 3)
      .when(F.col("n23").isNotNull, 2)
      .when(F.col("cont1").isNotNull, 1).otherwise(0)
    val scored = j
      .select(F.col(idCol), lvl.as("__lvl"), (-F.log(p)).as("__s"))
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_trigrams"),
        F.sum(F.when(F.col("__lvl") === 3, 1L).otherwise(0L)).as("n_tri"),
        F.sum(F.when(F.col("__lvl") === 2, 1L).otherwise(0L)).as("n_cont2"),
        F.sum(F.when(F.col("__lvl") === 1, 1L).otherwise(0L)).as("n_cont1"),
        F.sum(F.when(F.col("__lvl") === 0, 1L).otherwise(0L)).as("n_unseen"),
        F.avg("__s").as("kn3_surprisal"))
    docs.select(F.col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(F.col(idCol),
        F.coalesce(F.col("n_trigrams"), F.lit(0L)).as("n_trigrams"),
        F.coalesce(F.col("n_tri"), F.lit(0L)).as("n_tri"),
        F.coalesce(F.col("n_cont2"), F.lit(0L)).as("n_cont2"),
        F.coalesce(F.col("n_cont1"), F.lit(0L)).as("n_cont1"),
        F.coalesce(F.col("n_unseen"), F.lit(0L)).as("n_unseen"),
        F.col("kn3_surprisal"))
  }

  /** A trained Stupid Backoff model (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — THE published web-scale
    * LM smoothing, designed at Google precisely because distributed
    * count tables make Kneser-Ney's normalization impractical: scores
    * are unnormalized count ratios with a constant backoff factor, so
    * training is nothing but n-gram counting).
    *
    * `bi`/`tri` carry their CONTEXT counts joined in at train time
    * (count-table-sized joins, not corpus-sized), so scoring touches
    * the corpus position stream with exactly three equi-joins. All
    * three tables are corpus-vocabulary-sized at 100 TB — persist
    * them like any count table; nothing here assumes they broadcast.
    */
  final case class BackoffModel(uni: DataFrame, bi: DataFrame, tri: DataFrame,
                                totalTokens: Long)

  /** Per-doc token-position stream: one row per position i with the
    * word and its (up to two) preceding context words — p1/p2 NULL at
    * document starts, which is what makes the scorer's "longest
    * AVAILABLE context" rule expressible as plain join-misses. Tokens
    * staged per the §4 HOF rule (size + transform = two references).
    */
  private def positions(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = Option(idCol).map(F.col).toSeq
    val toked = docs.select(cols :+ text.tokens(F.col(textCol)).as("__toks"): _*)
    val toks = F.col("__toks")
    val stream = F.when(F.size(toks) >= 1,
      F.transform(F.sequence(F.lit(1), F.size(toks)), (i: Column) =>
        F.struct(F.element_at(toks, i).as("w"),
          F.when(i >= 2, F.element_at(toks, i - 1)).as("p1"),
          F.when(i >= 3, F.element_at(toks, i - 2)).as("p2"))))
      .otherwise(F.array().cast("array<struct<w:string,p1:string,p2:string>>"))
    toked.select(cols :+ F.explode(stream).as("__p"): _*)
      .select(cols :+ F.col("__p.w").as("w") :+ F.col("__p.p1").as("p1")
        :+ F.col("__p.p2").as("p2"): _*)
  }

  /** Train the Stupid Backoff count tables on a corpus: three keyed
    * count aggregates over one position stream (map-side partials),
    * context counts enriched in via two count-table joins, and the
    * token total as the one driver scalar. Train once per corpus
    * version; score any stream against the result.
    */
  def trainStupidBackoff(docs: DataFrame, textCol: String): BackoffModel = {
    val pos = positions(docs, null, textCol)
    val uni = pos.groupBy("w").agg(F.count(F.lit(1)).as("c1"))
    val bi = pos.filter(F.col("p1").isNotNull)
      .groupBy("p1", "w").agg(F.count(F.lit(1)).as("c2"))
    val tri = pos.filter(F.col("p2").isNotNull)
      .groupBy("p2", "p1", "w").agg(F.count(F.lit(1)).as("c3"))
    // context enrichment: bi rows carry their unigram-context count,
    // tri rows their bigram-context count — joins between count
    // tables, so the corpus stream is touched exactly once above
    val biE = bi.join(uni.select(F.col("w").as("p1"), F.col("c1").as("ctx1")), Seq("p1"))
    val triE = tri.join(
      bi.select(F.col("p1").as("p2"), F.col("w").as("p1"), F.col("c2").as("ctx2")),
      Seq("p2", "p1"))
    // coalesce: SUM over an empty table is NULL — an empty training
    // corpus must reach stupidBackoff's clean totalTokens require, not
    // die here with an NPE
    val n = uni.agg(F.coalesce(F.sum("c1"), F.lit(0L))).head().getLong(0)
    BackoffModel(uni, biE, triE, n)
  }

  /** Score every document under Stupid Backoff: for each token
    * position, S = the count ratio at the LONGEST AVAILABLE context
    * that has a nonzero count, discounted by `alpha` once per order
    * backed off (document-start positions use their naturally shorter
    * context undiscounted — no longer context exists to back off
    * from); an unseen word floors at 1/N. Per-doc output:
    *
    *   (idCol, n_tokens, n_tri, n_bi, n_uni, n_unseen, sb_surprisal)
    *
    * where n_* count the order actually used per position (INTEGER,
    * order-free — the hash-oracle face of the join/backoff routing)
    * and sb_surprisal is the mean −ln S over positions (libm, the
    * rows-only face — same split as E15).
    *
    * Scale shape: the position stream is map-only; the three count
    * joins are plain shuffled equi-joins (the E5/E15 discipline); the
    * per-doc fold is one keyed aggregate. `model = None` self-trains
    * (the corpus-audit shape); pass a trained model to score a
    * foreign stream — backoff makes every position finite.
    */
  def stupidBackoff(docs: DataFrame, idCol: String, textCol: String,
                    model: Option[BackoffModel] = None,
                    alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha must be in (0, 1]")
    val m = model.getOrElse(trainStupidBackoff(docs, textCol))
    require(m.totalTokens > 0, "backoff model trained on an empty corpus")
    val tri = m.tri.select(F.col("p2"), F.col("p1"), F.col("w"), F.col("c3"), F.col("ctx2"))
    val bi = m.bi.select(F.col("p1"), F.col("w"), F.col("c2"), F.col("ctx1"))
    val uni = m.uni.select(F.col("w"), F.col("c1"))
    val j = positions(docs, idCol, textCol)
      .join(tri, Seq("p2", "p1", "w"), "left")
      .join(bi, Seq("p1", "w"), "left")
      .join(uni, Seq("w"), "left")
    val nTot = F.lit(m.totalTokens.toDouble)
    val lvl = F.when(F.col("p2").isNotNull && F.col("c3").isNotNull, 3)
      .when(F.col("p1").isNotNull && F.col("c2").isNotNull, 2)
      .when(F.col("c1").isNotNull, 1).otherwise(0)
    val avail = F.when(F.col("p2").isNotNull, 2).when(F.col("p1").isNotNull, 1).otherwise(0)
    val used = F.when(F.col("__lvl") === 3, 2).when(F.col("__lvl") === 2, 1).otherwise(0)
    val s = F.when(F.col("__lvl") === 3, F.col("c3").cast("double") / F.col("ctx2").cast("double"))
      .when(F.col("__lvl") === 2, F.col("c2").cast("double") / F.col("ctx1").cast("double"))
      .when(F.col("__lvl") === 1, F.col("c1").cast("double") / nTot)
      .otherwise(F.lit(1.0) / nTot)
    j.select(F.col(idCol), lvl.as("__lvl"), avail.as("__avail"),
        F.col("c3"), F.col("ctx2"), F.col("c2"), F.col("ctx1"), F.col("c1"))
      .select(F.col(idCol), F.col("__lvl"),
        (-F.log(F.pow(F.lit(alpha), (F.col("__avail") - used).cast("double")) * s)).as("__s"))
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_tokens"),
        F.sum(F.when(F.col("__lvl") === 3, 1L).otherwise(0L)).as("n_tri"),
        F.sum(F.when(F.col("__lvl") === 2, 1L).otherwise(0L)).as("n_bi"),
        F.sum(F.when(F.col("__lvl") === 1, 1L).otherwise(0L)).as("n_uni"),
        F.sum(F.when(F.col("__lvl") === 0, 1L).otherwise(0L)).as("n_unseen"),
        F.avg("__s").as("sb_surprisal"))
  }
}
