package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.functions.{aggregates, native, text}

/** Hybrid retrieval — reciprocal-rank fusion (RRF, Cormack et al.
  * 2009) of a lexical leg and a vector leg, the standard shape of a
  * modern RAG / retrieval stack: lexical matching catches exact terms
  * the embedding smooths away, the embedding catches paraphrase the
  * lexical leg misses, and rank fusion needs no score calibration
  * between the two (only ranks enter: score = Σ_legs 1/(kRrf+rank)).
  *
  * Legs (both bounded by the [[graft.functions.TopKByScore]]
  * aggregate — ≤ n rows per query per partition enter each exchange,
  * never a cluster-wide sort):
  *  - lexical: Σ term-frequency of the query's distinct tokens in the
  *    document (query-likelihood form; integer arithmetic, so the
  *    oracle replays it exactly — production stacks can swap in the
  *    float TF-IDF weights of [[InvertedIndex.tfidf]] at the cost of
  *    libm-dependent scores). The (doc, token) tf table is the E5
  *    posting-list shape: explode → one row per distinct pair, then a
  *    token-keyed shuffle join against the (far smaller) query-token
  *    side.
  *  - vector: exact cosine against broadcast query vectors (the D1
  *    path; swap in the IVF/LSH/PQ routes of [[Similarity]] when the
  *    corpus outgrows brute force).
  *
  * Ranks come from the SORTED top-k arrays via posexplode — rank i is
  * array position i+1, no window over the corpus anywhere. Fusion is
  * a full outer join of two ≤n-row-per-query rank lists (tiny), and
  * 1/(kRrf+rank) on integer ranks is bit-exact IEEE division, so the
  * whole pipeline hash-replays across engines.
  */
object Hybrid {

  /** RRF top-`k` per query. `queries`: (qidCol, qtextCol, qvecCol)
    * rows — one text AND one embedding per query. `docs`:
    * (idCol, textCol); `vecs`: (vecIdCol aligned with idCol, vecCol).
    * Output: (qid, doc_id, rrf, lex_rank, vec_rank) — rank 0 means
    * the leg did not surface the document in its top `n`.
    */
  def rrfSearch(docs: DataFrame, idCol: String, textCol: String,
                vecs: DataFrame, vecIdCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qtextCol: String, qvecCol: String,
                k: Int = 10, n: Int = 20, kRrf: Int = 60,
                maxDfFraction: Double = 0.1,
                knownDocCount: Option[Long] = None): DataFrame = {
    require(k >= 1 && n >= 1, s"need k >= 1 and n >= 1, got k=$k n=$n")
    require(kRrf >= 1, s"kRrf must be positive, got $kRrf")
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0,1], got $maxDfFraction")

    // ----- lexical leg: Σ tf of the query's DISTINCT tokens per doc.
    // Two guards keep the fan-out join bounded (the E5a recipe):
    //  - the corpus token stream is SEMI-JOINED against the (small,
    //    broadcast) query-token set BEFORE the tf aggregation, so the
    //    groupBy shuffles only query-matching tokens;
    //  - query tokens present in more than `maxDfFraction` of the
    //    corpus are DROPPED — a stopword shared by q queries and d
    //    docs multiplies into q·d join rows while carrying no ranking
    //    signal (every document matches it); the cap is the classic
    //    stopword filter, made deterministic and oracle-replayable.
    val qTokens = queries
      .select(F.col(qidCol).as("qid"), F.explode(
        F.array_distinct(text.tokens(F.col(qtextCol)))).as("token"))
    // table stats supply the count at 100 TB (the corpus_mix
    // knownCounts pattern); the fixture path just counts
    val dfCap = knownDocCount.getOrElse(docs.count()) * maxDfFraction
    val tf = docs
      .select(F.col(idCol).as("doc_id"), text.tokens(F.col(textCol)).as("__toks"))
      .select(F.col("doc_id"), F.explode(F.col("__toks")).as("token"))
      .join(F.broadcast(qTokens.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy("doc_id", "token").agg(F.count(F.lit(1)).as("tf"))
    val rareTokens = tf.groupBy("token").agg(F.count(F.lit(1)).as("__df"))
      .filter(F.col("__df").cast("double") <= dfCap)
      .select("token")
    val lexTop = qTokens.join(F.broadcast(rareTokens), "token").join(tf, "token")
      .groupBy("qid", "doc_id")
      .agg(F.sum("tf").as("__score"))
      .groupBy("qid")
      .agg(aggregates.top_k_by_score(
        F.col("__score").cast("double"), F.col("doc_id"), n).as("__top"))
      .select(F.col("qid"), F.posexplode(F.col("__top")).as(Seq("__p", "__e")))
      .select(F.col("qid"), F.col("__e.id").as("doc_id"),
        (F.col("__p") + 1).cast("long").as("lex_rank"))

    // ----- vector leg: exact cosine vs broadcast queries (D1 shape)
    val qVecs = queries.select(F.col(qidCol).as("qid"), F.col(qvecCol).as("__qv"))
    val vecTop = vecs
      .select(F.col(vecIdCol).as("doc_id"), F.col(vecCol).as("__v"))
      .join(F.broadcast(qVecs))
      .select(F.col("qid"), F.col("doc_id"),
        native.cosine_sim(F.col("__v"), F.col("__qv")).as("__cos"))
      .groupBy("qid")
      .agg(aggregates.top_k_by_score(F.col("__cos"), F.col("doc_id"), n).as("__top"))
      .select(F.col("qid"), F.posexplode(F.col("__top")).as(Seq("__p", "__e")))
      .select(F.col("qid"), F.col("__e.id").as("doc_id"),
        (F.col("__p") + 1).cast("long").as("vec_rank"))

    // ----- fusion: two ≤n-row rank lists per query, full outer join;
    // absent leg contributes nothing (rank reported as 0)
    val fused = lexTop.join(vecTop, Seq("qid", "doc_id"), "full_outer")
      .select(F.col("qid"), F.col("doc_id"),
        (F.coalesce(F.lit(1.0) / (F.col("lex_rank") + kRrf), F.lit(0.0)) +
          F.coalesce(F.lit(1.0) / (F.col("vec_rank") + kRrf), F.lit(0.0))).as("rrf"),
        F.coalesce(F.col("lex_rank"), F.lit(0L)).as("lex_rank"),
        F.coalesce(F.col("vec_rank"), F.lit(0L)).as("vec_rank"))
    fused
      .groupBy("qid")
      .agg(aggregates.top_k_payload(F.col("rrf"), F.col("doc_id"),
        F.struct(F.col("doc_id"), F.col("rrf"), F.col("lex_rank"), F.col("vec_rank")), k)
        .as("__top"))
      .select(F.col("qid"), F.explode(F.col("__top")).as("__e"))
      .select(F.col("qid"), F.col("__e.doc_id").as("doc_id"), F.col("__e.rrf").as("rrf"),
        F.col("__e.lex_rank").as("lex_rank"), F.col("__e.vec_rank").as("vec_rank"))
  }
}
