package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.functions.{aggregates, native, text}

/** Hybrid retrieval — reciprocal-rank fusion (RRF, Cormack et al.
  * 2009) of retrieval legs, the standard shape of a modern RAG /
  * retrieval stack: lexical matching catches exact terms the
  * embedding smooths away, the embedding catches paraphrase the
  * lexical leg misses, and rank fusion needs no score calibration
  * between the legs (only ranks enter: score = Σ_legs 1/(kRrf+rank)).
  *
  * The fusion core ([[rrfFuse]]) takes PRECOMPUTED rank lists — any
  * frame of (qid, doc_id, rank) rows — so the vector leg routes
  * through whichever ANN tier fits the corpus: [[Similarity
  * .bruteForceTopK]] at fixture scale, [[Similarity.ivfTopKFromLayout]]
  * / [[Similarity.pqTopKFromLayout]] once the corpus outgrows a
  * linear scan (their (qid, vec_id, cos, rank) output drops in via
  * [[leg]]). [[rrfSearch]] is the batteries-included wrapper wiring
  * the [[lexicalLeg]] and the brute-force [[cosineLeg]].
  *
  * Legs (the built-in ones are both bounded by the
  * [[graft.functions.TopKByScore]] aggregate — ≤ n rows per query per
  * partition enter each exchange, never a cluster-wide sort):
  *  - lexical: Σ term-frequency of the query's distinct tokens in the
  *    document (query-likelihood form; integer arithmetic, so the
  *    oracle replays it exactly — production stacks can swap in the
  *    float TF-IDF weights of [[InvertedIndex.tfidf]] at the cost of
  *    libm-dependent scores). The (doc, token) tf table is the E5
  *    posting-list shape: explode → one row per distinct pair, then a
  *    token-keyed shuffle join against the (far smaller) query-token
  *    side.
  *  - vector: exact cosine against broadcast query vectors (the D1
  *    path).
  *
  * Ranks come from the SORTED top-k arrays via posexplode — rank i is
  * array position i+1, no window over the corpus anywhere. Fusion is
  * a full outer join of ≤n-row-per-query rank lists (tiny), and
  * 1/(kRrf+rank) on integer ranks is bit-exact IEEE division, so the
  * whole pipeline hash-replays across engines.
  */
object Hybrid {

  /** Adapt a scored top-k frame (the shape every [[Similarity]] topK
    * variant emits: one row per (query, candidate) with a 1-based
    * rank column) into the canonical leg shape [[rrfFuse]] consumes:
    * (qid, doc_id, rank).
    */
  def leg(ranked: DataFrame, qidCol: String, idCol: String,
          rankCol: String = "rank"): DataFrame =
    ranked.select(F.col(qidCol).as("qid"), F.col(idCol).cast("long").as("doc_id"),
      F.col(rankCol).cast("long").as("rank"))

  /** Reciprocal-rank fusion of named precomputed rank lists.
    *
    * Each leg is (name, frame of (qid, doc_id, rank) with 1-based
    * ranks — build via [[leg]]); the output carries one
    * `<name>_rank` column per leg (0 = the leg did not surface the
    * document) plus `rrf = Σ 1/(kRrf+rank)` over the legs that did,
    * summed in leg order (IEEE addition is order-sensitive; fixing
    * the order keeps reruns and engine replays bit-identical).
    * Cost shape: the legs are already ≤n rows per query, so the
    * chained full-outer joins and the final bounded top-k touch
    * tiny frames regardless of corpus size.
    */
  def rrfFuse(legs: Seq[(String, DataFrame)], k: Int = 10, kRrf: Int = 60): DataFrame = {
    require(legs.nonEmpty, "need at least one leg")
    require(legs.map(_._1).distinct.size == legs.size,
      s"leg names must be distinct, got ${legs.map(_._1)}")
    require(k >= 1, s"k must be positive, got $k")
    require(kRrf >= 1, s"kRrf must be positive, got $kRrf")
    val named = legs.map { case (name, df) =>
      df.select(F.col("qid"), F.col("doc_id"),
        F.col("rank").cast("long").as(s"${name}_rank"))
    }
    val joined = named.reduce((a, b) => a.join(b, Seq("qid", "doc_id"), "full_outer"))
    val rrf = legs.map { case (name, _) =>
      F.coalesce(F.lit(1.0) / (F.col(s"${name}_rank") + kRrf), F.lit(0.0))
    }.reduce(_ + _)
    val rankCols = legs.map { case (name, _) =>
      F.coalesce(F.col(s"${name}_rank"), F.lit(0L)).as(s"${name}_rank")
    }
    val fused = joined.select(
      Seq(F.col("qid"), F.col("doc_id"), rrf.as("rrf")) ++ rankCols: _*)
    val payload = F.struct(
      Seq(F.col("doc_id"), F.col("rrf")) ++
        legs.map { case (name, _) => F.col(s"${name}_rank") }: _*)
    fused
      .groupBy("qid")
      .agg(aggregates.top_k_payload(F.col("rrf"), F.col("doc_id"), payload, k).as("__top"))
      .select(F.col("qid"), F.explode(F.col("__top")).as("__e"))
      .select(
        Seq(F.col("qid"), F.col("__e.doc_id").as("doc_id"), F.col("__e.rrf").as("rrf")) ++
          legs.map { case (name, _) => F.col(s"__e.${name}_rank").as(s"${name}_rank") }: _*)
  }

  /** Lexical rank list: top-`n` docs per query by Σ tf of the query's
    * DISTINCT tokens, as (qid, doc_id, rank).
    *
    * Two guards keep the fan-out join bounded (the E5a recipe):
    *  - the corpus token stream is SEMI-JOINED against the (small,
    *    broadcast) query-token set BEFORE the tf aggregation, so the
    *    groupBy shuffles only query-matching tokens;
    *  - query tokens present in more than `maxDfFraction` of the
    *    corpus are DROPPED — a stopword shared by q queries and d
    *    docs multiplies into q·d join rows while carrying no ranking
    *    signal (every document matches it); the cap is the classic
    *    stopword filter, made deterministic and oracle-replayable.
    *
    * When `knownDocCount` is None the corpus count that sizes the df
    * cap rides the PLAN as a broadcast one-row aggregate (no Spark
    * job at construction time — `deferStats=false` restores the old
    * eager `docs.count()` for callers that want the cap resolved
    * up front); at 100 TB pass the count from table stats (the
    * corpus_mix knownCounts pattern) so even that subtree vanishes.
    */
  def lexicalLeg(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, qidCol: String, qtextCol: String,
                 n: Int = 20, maxDfFraction: Double = 0.1,
                 knownDocCount: Option[Long] = None,
                 deferStats: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0,1], got $maxDfFraction")
    val qTokens = queries
      .select(F.col(qidCol).as("qid"), F.explode(
        F.array_distinct(text.tokens(F.col(qtextCol)))).as("token"))
    // one-row (N) frame: a literal relation when known (or eagerly
    // counted), the plan-embedded aggregate otherwise — downstream
    // the cap comparison is the same expression tree either way, so
    // deferred ≡ eager bit-for-bit (HybridSpec)
    val stats: DataFrame = knownDocCount match {
      case Some(nd) => docs.sparkSession.range(1)
        .select(F.lit(nd.toDouble).as("__n"))
      case None if deferStats => docs
        .agg(F.count(F.lit(1)).cast("double").as("__n"))
      case None => docs.sparkSession.range(1)
        .select(F.lit(docs.count().toDouble).as("__n"))
    }
    val tf = docs
      .select(F.col(idCol).cast("long").as("doc_id"),
        text.tokens(F.col(textCol)).as("__toks"))
      .select(F.col("doc_id"), F.explode(F.col("__toks")).as("token"))
      .join(F.broadcast(qTokens.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy("doc_id", "token").agg(F.count(F.lit(1)).as("tf"))
    val rareTokens = tf.groupBy("token").agg(F.count(F.lit(1)).as("__df"))
      .crossJoin(F.broadcast(stats))
      .filter(F.col("__df").cast("double") <= F.col("__n") * F.lit(maxDfFraction))
      .select("token")
    qTokens.join(F.broadcast(rareTokens), "token").join(tf, "token")
      .groupBy("qid", "doc_id")
      .agg(F.sum("tf").as("__score"))
      .groupBy("qid")
      .agg(aggregates.top_k_by_score(
        F.col("__score").cast("double"), F.col("doc_id"), n).as("__top"))
      .select(F.col("qid"), F.posexplode(F.col("__top")).as(Seq("__p", "__e")))
      .select(F.col("qid"), F.col("__e.id").as("doc_id"),
        (F.col("__p") + 1).cast("long").as("rank"))
  }

  /** BM25 rank list (Robertson et al., the standard lexical ranking;
    * Lucene's positive-idf spelling): top-`n` docs per query by
    *
    *   Σ_t ln(1 + (N−df+0.5)/(df+0.5)) · tf·(k1+1) /
    *       (tf + k1·(1−b + b·dl/avgdl))
    *
    * over the query's distinct tokens — the production upgrade of
    * [[lexicalLeg]]'s raw Σtf (idf downweights common terms, the
    * saturation stops a 50-occurrence doc beating a 5-occurrence one
    * 10×, and the length norm stops long docs winning by volume).
    *
    * Same scale discipline as [[lexicalLeg]]: corpus token stream
    * semi-joined against the broadcast query-token set BEFORE the tf
    * aggregate, stopword df cap kills the q·d fan-out, bounded top-k
    * per query. The doc length rides the token stream into the tf
    * aggregate (no separate length scan or doc-keyed join), and
    * (N, avgdl) come from one slim aggregate that rides the PLAN as
    * a broadcast one-row frame (plan construction is job-free;
    * `deferStats=false` restores the old eager collect). Whenever
    * that aggregate must scan the corpus, the tokenized projection is
    * staged LAZILY ([[Staging.stageLazy]]) so the stats subtree and
    * the tf stream share ONE tokenize pass — still no construction
    * job. Table stats via `knownDocCount`+`knownAvgDl` remain the
    * 100 TB route: no staging at all, one uncached streaming pass. Whichever route
    * supplies them, the score expressions read (N, avgdl) from the
    * same one-row-frame columns, so deferred ≡ eager ≡ known
    * bit-for-bit (HybridSpec). An empty corpus yields the empty
    * result under deferral (nothing to rank); the eager route keeps
    * the loud empty-corpus require. Per-(query, doc)
    * contributions fold in SORTED token order (bounded by the query's
    * own length), so scores are bit-reproducible across partitionings
    * — but idf is libm `ln`: rows-only at the driver gate, the E10/E15
    * discipline. `k1 = 1.25` (exactly representable; inside the
    * published 1.2–2.0 band), `b = 0.75` (exact).
    *
    * Emits (qid, doc_id, bm25, rank) — [[leg]] adapts it for
    * [[rrfFuse]].
    */
  def bm25Leg(docs: DataFrame, idCol: String, textCol: String,
              queries: DataFrame, qidCol: String, qtextCol: String,
              n: Int = 20, k1: Double = 1.25, b: Double = 0.75,
              maxDfFraction: Double = 0.1,
              knownDocCount: Option[Long] = None,
              knownAvgDl: Option[Double] = None,
              deferStats: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0,1], got $maxDfFraction")
    val qTokens = queries
      .select(F.col(qidCol).as("qid"), F.explode(
        F.array_distinct(text.tokens(F.col(qtextCol)))).as("token"))
    val toked0 = docs
      .select(F.col(idCol).cast("long").as("doc_id"),
        text.tokens(F.col(textCol)).as("__toks"))
    // when the stats aggregate must scan the corpus (either deferred
    // in-plan or eagerly collected), stage the tokenized projection
    // LAZILY so the corpus is tokenized exactly once: the stats
    // subtree and the tf stream share one cached materialization
    // instead of two full passes. No job runs at construction
    // (lazy), and with both stats known the staging disappears — the
    // 100 TB route stays a single streaming pass with zero caching.
    val toked = (knownDocCount, knownAvgDl) match {
      case (Some(_), Some(_)) => toked0
      case _                  => Staging.stageLazy(toked0)
    }
    // corpus stats (N, avgdl) as a ONE-ROW frame: a literal relation
    // when both are known (table stats — zero cost) or eagerly
    // collected (deferStats=false, the old construction-time job,
    // loud on an empty corpus); otherwise the slim aggregate itself
    // rides the plan and broadcasts. Downstream the score
    // expressions read (__n, __avgdl) columns in every route, so the
    // three spellings are bit-identical (HybridSpec).
    def statsLit(nd: Double, ad: Double): DataFrame =
      docs.sparkSession.range(1).select(
        F.lit(nd).as("__n"), F.lit(ad).as("__avgdl"))
    val stats: DataFrame = (knownDocCount, knownAvgDl) match {
      case (Some(nd), Some(ad)) => statsLit(nd.toDouble, ad)
      case _ if deferStats =>
        val agg = toked.agg(
          F.count(F.lit(1)).cast("double").as("__n"),
          F.avg(F.size(F.col("__toks"))).as("__avgdl"))
        (knownDocCount, knownAvgDl) match {
          case (Some(nd), _) => agg.select(
            F.lit(nd.toDouble).as("__n"), F.col("__avgdl"))
          case (_, Some(ad)) => agg.select(
            F.col("__n"), F.lit(ad).as("__avgdl"))
          case _ => agg
        }
      case _ =>
        val r = toked.agg(F.count(F.lit(1)), F.avg(F.size(F.col("__toks")))).head()
        val counted = r.getLong(0)
        require(knownDocCount.isDefined || counted > 0,
          "bm25Leg: empty corpus — no documents to rank (avgdl undefined)")
        statsLit(knownDocCount.getOrElse(counted).toDouble,
          knownAvgDl.getOrElse(if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
    }
    // the doc length rides the token stream into the tf aggregate —
    // no separate dl scan, no doc-keyed join
    val tf = toked
      .select(F.col("doc_id"), F.size(F.col("__toks")).cast("long").as("__dl"),
        F.explode(F.col("__toks")).as("token"))
      .join(F.broadcast(qTokens.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy("doc_id", "token")
      .agg(F.count(F.lit(1)).as("tf"), F.first("__dl").as("__dl"))
    // (token, __df, __n, __avgdl) — the stats columns ride the slim
    // df frame (bounded by |query tokens|) into the scoring join
    val keep = tf.groupBy("token").agg(F.count(F.lit(1)).as("__df"))
      .crossJoin(F.broadcast(stats))
      .filter(F.col("__df").cast("double") <= F.col("__n") * F.lit(maxDfFraction))
    val idf = F.log(F.lit(1.0) +
      (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5))
    val sat = (F.col("tf") * (k1 + 1.0)) /
      (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")))
    qTokens.join(F.broadcast(keep), "token").join(tf, "token")
      .select(F.col("qid"), F.col("doc_id"), F.col("token"), (idf * sat).as("__c"))
      // sorted in-row fold: per-(q,d) sums are order-fixed, so scores
      // are bit-identical across partitionings (IEEE addition is
      // order-sensitive; groupBy SUM would not be)
      .groupBy("qid", "doc_id")
      .agg(F.sort_array(F.collect_list(F.struct(F.col("token"), F.col("__c")))).as("__cs"))
      .select(F.col("qid"), F.col("doc_id"),
        F.aggregate(F.col("__cs"), F.lit(0.0),
          (acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =>
            acc + x.getField("__c")).as("__score"))
      .groupBy("qid")
      .agg(aggregates.top_k_payload(F.col("__score"), F.col("doc_id"),
        F.struct(F.col("doc_id"), F.col("__score")), n).as("__top"))
      .select(F.col("qid"), F.posexplode(F.col("__top")).as(Seq("__p", "__e")))
      .select(F.col("qid"), F.col("__e.doc_id").as("doc_id"),
        F.col("__e.__score").as("bm25"), (F.col("__p") + 1).cast("long").as("rank"))
  }

  /** The INTEGER face of [[bm25Leg]] (the E15b hits discipline): every
    * count the BM25 score is made of — per-(query, doc) matched-term
    * count, Σtf, Σdf over the matched tokens, and the doc length —
    * with the libm idf/log left out, so the WHOLE frame hash-replays
    * in a SQL oracle. Same pipeline shape as the scorer: corpus
    * tokens semi-join the broadcast query-token set before the tf
    * aggregate, dl rides the token stream (no second scan), df is
    * counted over the semi-joined tf table. With `maxDfFraction < 1`
    * the same stopword cap applies (and needs the corpus count — the
    * lazily-staged aggregate, as in the scorer); at the default 1.0
    * no stats pass runs at all: df ≤ N always, one streaming pass.
    *
    * Emits (qid, doc_id, n_terms, tf_sum, df_sum, dl) — every column
    * a long.
    */
  def bm25Hits(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qtextCol: String,
               maxDfFraction: Double = 1.0,
               knownDocCount: Option[Long] = None,
               deferStats: Boolean = true): DataFrame = {
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0,1], got $maxDfFraction")
    val qTokens = queries
      .select(F.col(qidCol).as("qid"), F.explode(
        F.array_distinct(text.tokens(F.col(qtextCol)))).as("token"))
    val toked0 = docs
      .select(F.col(idCol).cast("long").as("doc_id"),
        text.tokens(F.col(textCol)).as("__toks"))
    val capBites = maxDfFraction < 1.0 && knownDocCount.isEmpty
    val toked = if (capBites) Staging.stageLazy(toked0) else toked0
    val tf = toked
      .select(F.col("doc_id"), F.size(F.col("__toks")).cast("long").as("__dl"),
        F.explode(F.col("__toks")).as("token"))
      .join(F.broadcast(qTokens.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy("doc_id", "token")
      .agg(F.count(F.lit(1)).as("tf"), F.first("__dl").as("__dl"))
    val dfTable = tf.groupBy("token").agg(F.count(F.lit(1)).as("__df"))
    val keep =
      if (maxDfFraction >= 1.0) dfTable // df <= N by construction
      else {
        val stats: DataFrame = knownDocCount match {
          case Some(nd) => docs.sparkSession.range(1)
            .select(F.lit(nd.toDouble).as("__n"))
          case None if deferStats => toked
            .agg(F.count(F.lit(1)).cast("double").as("__n"))
          case None => docs.sparkSession.range(1)
            .select(F.lit(toked.count().toDouble).as("__n"))
        }
        dfTable.crossJoin(F.broadcast(stats))
          .filter(F.col("__df").cast("double") <= F.col("__n") * F.lit(maxDfFraction))
          .select("token", "__df")
      }
    qTokens.join(F.broadcast(keep), "token").join(tf, "token")
      .groupBy("qid", "doc_id")
      .agg(F.count(F.lit(1)).cast("long").as("n_terms"),
        F.sum("tf").cast("long").as("tf_sum"),
        F.sum("__df").cast("long").as("df_sum"),
        F.first("__dl").cast("long").as("dl"))
  }

  /** Brute-force cosine rank list (the D1 shape): top-`n` docs per
    * query vector as (qid, doc_id, rank). Fine while the corpus fits
    * a linear scan per query batch; beyond that feed [[rrfFuse]] an
    * IVF/PQ leg from [[Similarity]] via [[leg]] instead.
    */
  def cosineLeg(vecs: DataFrame, vecIdCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                n: Int = 20): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    val qVecs = queries.select(F.col(qidCol).as("qid"), F.col(qvecCol).as("__qv"))
    vecs
      .select(F.col(vecIdCol).cast("long").as("doc_id"), F.col(vecCol).as("__v"))
      .join(F.broadcast(qVecs))
      .select(F.col("qid"), F.col("doc_id"),
        native.cosine_sim(F.col("__v"), F.col("__qv")).as("__cos"))
      .groupBy("qid")
      .agg(aggregates.top_k_by_score(F.col("__cos"), F.col("doc_id"), n).as("__top"))
      .select(F.col("qid"), F.posexplode(F.col("__top")).as(Seq("__p", "__e")))
      .select(F.col("qid"), F.col("__e.id").as("doc_id"),
        (F.col("__p") + 1).cast("long").as("rank"))
  }

  /** RRF top-`k` per query — the convenience wrapper: [[lexicalLeg]]
    * + brute-force [[cosineLeg]] fused by [[rrfFuse]]. `queries`:
    * (qidCol, qtextCol, qvecCol) rows — one text AND one embedding
    * per query. `docs`: (idCol, textCol); `vecs`: (vecIdCol aligned
    * with idCol, vecCol). Output: (qid, doc_id, rrf, lex_rank,
    * vec_rank) — rank 0 means the leg did not surface the document in
    * its top `n`. When `knownDocCount` is None the df-cap count
    * rides the plan as a broadcast aggregate (see [[lexicalLeg]] —
    * no construction-time job).
    */
  def rrfSearch(docs: DataFrame, idCol: String, textCol: String,
                vecs: DataFrame, vecIdCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qtextCol: String, qvecCol: String,
                k: Int = 10, n: Int = 20, kRrf: Int = 60,
                maxDfFraction: Double = 0.1,
                knownDocCount: Option[Long] = None): DataFrame =
    rrfFuse(Seq(
      "lex" -> lexicalLeg(docs, idCol, textCol, queries, qidCol, qtextCol,
        n, maxDfFraction, knownDocCount),
      "vec" -> cosineLeg(vecs, vecIdCol, vecCol, queries, qidCol, qvecCol, n)),
      k, kRrf)
}
