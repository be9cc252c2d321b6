package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.functions.native

/** Deterministic Lloyd k-means over integer-quantized vectors — the
  * clustering stage a curation pipeline runs before SemDeDup-style
  * pruning, domain discovery, or IVF cell design (the engine's D3/D4
  * family seeds cells from labels; this operator LEARNS the cells).
  * The BigQuery analogue is `CREATE MODEL ... OPTIONS(model_type =
  * 'kmeans')` + `ML.PREDICT`; here the surface is one call returning
  * the assignment table.
  *
  * Why INTEGER vectors (loud otherwise): every cross-row float
  * reduction in Lloyd's update step is order-dependent, so a float
  * k-means can never be verified bit-for-bit against an independent
  * engine. With int8-quantized inputs ([[native.int8_quantize]] — the
  * compression a 100 TB embedding store runs anyway, 4× narrower
  * scans) the per-dimension centroid numerators are exact BIGINT sums
  * (order-free), each centroid component is ONE correctly-rounded
  * division, and the assignment distance folds in strict index order
  * — the whole training loop is bit-reproducible across engines and
  * partitionings, and the driver face is hash-gated end to end.
  *
  * Scale shape, per iteration: one map-only assignment pass (the
  * centroid table is plan-embedded, bounded k×dim — what a broadcast
  * would ship) and one aggregation whose shuffle moves k×dim partial
  * rows per task (posexplode collapses in the partial aggregate,
  * the [[Similarity.ivfCentroids]] discipline). Driver state is the
  * k×dim centroid matrix — never corpus-sized. iters is a fixed
  * constant, so the whole train is O(iters) corpus passes; at 100 TB
  * train on a sampled slice and assign the full corpus with the final
  * map-only pass, exactly like [[Similarity.trainCentroids]].
  *
  * Determinism: seeds are the k lowest-id vectors (rank order = id
  * order = cluster id), assignment ties keep the lowest cluster id,
  * an emptied cluster keeps its previous centroid. No randomness —
  * re-runs are byte-identical, and a k-means++ seeding at scale can
  * be layered by passing its chosen seed ids via `seedIds`.
  */
object Clustering {

  /** Assignment table (id, cluster, dist) after `iters` Lloyd steps;
    * `dist` is the SQUARED L2 distance to the final centroid.
    * `vecCol` must be an integral array (quantize floats first);
    * `seedIds` optionally pins the seed rows (default: k lowest ids).
    */
  def kmeansAssign(vectors: DataFrame, k: Int, iters: Int,
                   idCol: String = "vec_id", vecCol: String = "vec",
                   seedIds: Option[Seq[Long]] = None): DataFrame =
    assignToCentroids(vectors,
      kmeansTrain(vectors, k, iters, idCol, vecCol, seedIds), idCol, vecCol)

  /** Loud unless `vecCol` is an integral array — the family's
    * verifiability contract.
    */
  private def requireIntVector(df: DataFrame, vecCol: String): Unit = {
    val elem = df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(e, _) => e
      case other => throw new IllegalArgumentException(
        s"$vecCol must be an array column, got $other")
    }
    require(Seq("byte", "short", "integer", "long").contains(elem.typeName),
      s"k-means needs an INTEGER vector column (got array<${elem.typeName}>): " +
        "float centroids are order-dependent and unverifiable — quantize first " +
        "(functions.native.int8_quantize), the same compression a production " +
        "embedding store scans anyway")
  }

  /** Validated (id, int vector) projection — the shared entry gate. */
  private def intSrc(vectors: DataFrame, idCol: String, vecCol: String): DataFrame = {
    requireIntVector(vectors, vecCol)
    vectors.select(F.col(idCol).cast("long").as("__id"),
      F.col(vecCol).cast("array<int>").as("__v"))
  }

  /** The trained centroid matrix alone (k × dim doubles) — what a
    * model registry persists; [[assignToCentroids]] is the predict
    * half. Same contract as [[kmeansAssign]]. NOTE: cluster ids are
    * assigned by ASCENDING seed id (rank order), not by the order
    * `seedIds` was passed in — determinism must not depend on a Seq's
    * incidental ordering.
    */
  def kmeansTrain(vectors: DataFrame, k: Int, iters: Int,
                  idCol: String = "vec_id", vecCol: String = "vec",
                  seedIds: Option[Seq[Long]] = None): Seq[Seq[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val src = intSrc(vectors, idCol, vecCol)

    // seed centroids: the k lowest-id vectors, cluster id = rank
    val seedFrame = seedIds match {
      case Some(ids) =>
        require(ids.length == k, s"seedIds must have exactly k=$k entries")
        src.filter(F.col("__id").isin(ids: _*))
      case None => src.orderBy("__id").limit(k)
    }
    val seedRows = seedFrame.orderBy("__id").collect() // bounded: k rows
    require(seedRows.length == k,
      s"needed $k seed vectors, found ${seedRows.length}")
    var centroids: Seq[Seq[Double]] =
      seedRows.toSeq.map(_.getSeq[Int](1).map(_.toDouble))

    var it = 0
    while (it < iters) {
      // one corpus pass: assign + per-(cluster, dim) exact stats
      val stats = src
        .withColumn("__c", native.nearest_centroid_l2(F.col("__v"), centroids)
          .getField("cluster"))
        .select(F.col("__c"), F.posexplode(F.col("__v")).as(Seq("__dim", "__x")))
        .groupBy("__c", "__dim")
        .agg(F.sum(F.col("__x").cast("long")).as("__s"), F.count(F.lit(1)).as("__n"))
        .collect() // bounded: k × dim rows
      val byCluster = stats.groupBy(_.getInt(0))
      val next = centroids.zipWithIndex.map { case (prev, j) =>
        byCluster.get(j) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1)).toSeq
              .map(r => r.getLong(2).toDouble / r.getLong(3).toDouble)
          case None => prev // emptied cluster keeps its centroid
        }
      }
      // fixpoint: identical centroids make every further iteration a
      // no-op — stop burning corpus passes (BigQuery's early stop)
      if (next == centroids) it = iters else { centroids = next; it += 1 }
    }
    centroids
  }

  /** Map-only assignment of `vectors` to a trained centroid matrix:
    * (id, cluster, dist) with dist the squared L2 distance — the
    * predict half of [[kmeansTrain]], also the streaming-safe half
    * (stateless, plan-embedded centroids).
    */
  def assignToCentroids(vectors: DataFrame, centroids: Seq[Seq[Double]],
                        idCol: String = "vec_id", vecCol: String = "vec"): DataFrame =
    intSrc(vectors, idCol, vecCol)
      .withColumn("__a", native.nearest_centroid_l2(F.col("__v"), centroids))
      .select(F.col("__id").as(idCol),
        F.col("__a.cluster").cast("long").as("cluster"),
        F.col("__a.dist").as("dist"))

  /** Assignment that KEEPS every input column (the ML.PREDICT shape):
    * appends (clusterCol, distCol) from the plan-embedded centroid
    * table. Same integral-vector contract as the rest of the family.
    */
  def withClusterColumns(df: DataFrame, centroids: Seq[Seq[Double]], vecCol: String,
                         clusterCol: String = "cluster",
                         distCol: String = "dist"): DataFrame = {
    requireIntVector(df, vecCol)
    df.withColumn("__a",
        native.nearest_centroid_l2(F.col(vecCol).cast("array<int>"), centroids))
      .withColumn(clusterCol, F.col("__a.cluster").cast("long"))
      .withColumn(distCol, F.col("__a.dist"))
      .drop("__a")
  }

  /** The trained matrix as a (cell, centroid) frame — the shape the
    * cell consumers take ([[Similarity.ivfTopK]]'s `precomputed`,
    * [[Dedup.semanticDedup]]'s `centroids`, `writeCellLayout`):
    * cluster id becomes the cell id, components cast to float (the
    * cell-table storage type). This is the glue that completes the
    * published SemDeDup recipe — k-means the embeddings, THEN dedup
    * within learned cells.
    */
  def centroidsFrame(spark: org.apache.spark.sql.SparkSession,
                     centroids: Seq[Seq[Double]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, j) => (j.toLong, c.map(_.toFloat)) }
      .toDF("cell", "centroid")
  }

  /** Per-cluster summary of an assignment table: size and mean squared
    * distance (inertia / size). The sum is DOUBLE and therefore
    * order-sensitive — callers wanting bit-stable output should gate
    * on the assignment table (the driver face does) and treat this as
    * the human-facing report.
    */
  def clusterSizes(assign: DataFrame): DataFrame =
    assign.groupBy("cluster")
      .agg(F.count(F.lit(1)).as("size"), F.sum("dist").as("inertia"))
      .orderBy("cluster")
}
