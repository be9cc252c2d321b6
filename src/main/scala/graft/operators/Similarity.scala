package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.functions.{aggregates, native}

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2 D-block).
  *
  * Scale shape: the query set is small and broadcast; the corpus side
  * streams through a native cosine + a bounded TopKByScore aggregate.
  * Map-side partial aggregation reduces every partition to ≤ k rows
  * per query BEFORE the exchange, so no corpus-sized shuffle or sort
  * exists anywhere in the top-k path (a window row_number() would
  * sort every candidate per query across the cluster).
  */
object Similarity {

  /** Per-query top-k over a scored frame via the bounded aggregate;
    * ordering (cos desc, id asc) is deterministic, rank is 1-based.
    */
  private def topK(scored: DataFrame, qidCol: String, idCol: String, k: Int): DataFrame =
    scored.groupBy(F.col(qidCol))
      .agg(aggregates.top_k_by_score(F.col("cos"), F.col(idCol), k).as("top"))
      .select(F.col(qidCol), F.posexplode(F.col("top")).as(Seq("pos", "t")))
      .select(F.col(qidCol), F.col("t.id").as(idCol), F.col("t.score").as("cos"),
        (F.col("pos") + 1).cast("int").as("rank"))

  /** Exact cosine top-k per query vector (the correctness baseline). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val scored = corpus.as("c")
      .join(F.broadcast(queries.as("q")), F.col(qidCol) =!= F.col(idCol))
      .withColumn("cos", native.cosine_sim(F.col(qvecCol), F.col(vecCol)))
    topK(scored, qidCol, idCol, k)
  }

  /** IVF ANN: coarse-quantize the corpus into cells, search only the
    * `nprobe` cells whose centroids are nearest each query. Centroids
    * are computed with plain DataFrame aggregation (posexplode +
    * per-dimension mean → rebuilt array) — at 100 TB the centroid
    * table is tiny and broadcasts; the corpus is touched only for the
    * probed cells (partition-prunable when the table is written
    * partitioned by cell).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int = 3,
              cellCol: String = "label",
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    // per-cell centroid: mean per dimension, reassembled in index order
    val centroids = corpus
      .select(F.col(cellCol).as("cell"), F.posexplode(F.col(vecCol)).as(Seq("dim", "x")))
      .groupBy("cell", "dim").agg(F.avg("x").as("mx"))
      .groupBy("cell")
      .agg(F.array_sort(F.collect_list(F.struct(F.col("dim"), F.col("mx")))).as("pairs"))
      .select(F.col("cell"),
        F.transform(F.col("pairs"), p => p.getField("mx").cast("float")).as("centroid"))
    // nprobe nearest cells per query
    val probed = queries.join(F.broadcast(centroids))
      .withColumn("ccos", native.cosine_sim(F.col(qvecCol), F.col("centroid")))
    val probeTop = topKGeneric(probed, qidCol, "cell", "ccos", nprobe)
      .select(F.col(qidCol), F.col("cell"))
    // search only the probed cells
    val scored = corpus.withColumnRenamed(cellCol, "cell")
      .join(F.broadcast(probeTop.join(queries, qidCol)), Seq("cell"))
      .filter(F.col(qidCol) =!= F.col(idCol))
      .withColumn("cos", native.cosine_sim(F.col(qvecCol), F.col(vecCol)))
    topK(scored, qidCol, idCol, k)
  }

  /** topK over an arbitrary long-castable id column. */
  private def topKGeneric(scored: DataFrame, qidCol: String, idCol: String,
                          scoreCol: String, k: Int): DataFrame =
    scored.groupBy(F.col(qidCol))
      .agg(aggregates.top_k_by_score(F.col(scoreCol), F.col(idCol).cast("long"), k).as("top"))
      .select(F.col(qidCol), F.explode(F.col("top")).as("t"))
      .select(F.col(qidCol), F.col("t.id").as(idCol))

  /** LSH-bucketed ANN: native random-hyperplane signatures, banded so
    * a candidate only needs one matching 4-bit band of the 16-bit
    * signature; exact cosine ranks the candidates. Trades recall for
    * never touching most of the corpus — the scale path when brute
    * force is too hot.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val bands = 4
    val bandBits = planes / bands
    val mask = (1L << bandBits) - 1
    def withBands(df: DataFrame, vec: String, id: String, prefix: String): DataFrame =
      df.withColumn(s"${prefix}sig", native.hyperplane_sig(F.col(vec), planes))
        .select(F.col(id), F.col(vec),
          F.posexplode(F.array((0 until bands).map(b =>
            F.shiftright(F.col(s"${prefix}sig"), b * bandBits).bitwiseAND(mask)): _*))
            .as(Seq(s"${prefix}band", s"${prefix}bucket")))
    val c = withBands(corpus, vecCol, idCol, "c_")
    val q = withBands(queries, qvecCol, qidCol, "q_")
    val candidates = c.join(F.broadcast(q),
        F.col("c_band") === F.col("q_band") && F.col("c_bucket") === F.col("q_bucket") &&
          F.col(qidCol) =!= F.col(idCol))
      .select(F.col(qidCol), F.col(qvecCol), F.col(idCol), F.col(vecCol))
      .distinct()
    val scored = candidates.withColumn("cos", native.cosine_sim(F.col(qvecCol), F.col(vecCol)))
    topK(scored, qidCol, idCol, k)
  }
}
