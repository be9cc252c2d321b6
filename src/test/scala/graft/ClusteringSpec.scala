package graft

import graft.operators.Clustering

class ClusteringSpec extends SparkSuite {

  test("kmeansAssign: hand-computed two-cluster example, exact centroids and distances") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(0, 0)), (1L, Seq(10, 10)), (2L, Seq(1, 0)),
      (3L, Seq(11, 10)), (4L, Seq(0, 1)), (5L, Seq(10, 11)))
      .toDF("vec_id", "vec")
    val a = Clustering.kmeansAssign(vecs, k = 2, iters = 2).orderBy("vec_id").collect()
    // seeds: id0 -> cluster 0 at [0,0], id1 -> cluster 1 at [10,10];
    // first assignment splits evens/odds, update gives [1/3,1/3] and
    // [31/3,31/3], second iteration is stable
    assert(a.map(_.getLong(1)).toSeq == Seq(0L, 1L, 0L, 1L, 0L, 1L))
    val third = 1.0 / 3.0
    val d0 = (0 - third) * (0 - third) + (0 - third) * (0 - third)
    assert(a(0).getDouble(2) == d0)
    val c1 = 31.0 / 3.0
    val d1 = (10 - c1) * (10 - c1) + (10 - c1) * (10 - c1)
    assert(a(1).getDouble(2) == d1)
  }

  test("kmeansAssign: deterministic across reruns and repartitionings") {
    import spark.implicits._
    val vecs = (0 until 60).map(i => (i.toLong, Seq(i % 7, (i * 3) % 11, i % 5)))
      .toDF("vec_id", "vec")
    val r1 = Clustering.kmeansAssign(vecs, k = 4, iters = 3).orderBy("vec_id").collect()
    val r2 = Clustering.kmeansAssign(vecs.repartition(7), k = 4, iters = 3)
      .orderBy("vec_id").collect()
    assert(r1.toSeq == r2.toSeq)
  }

  test("kmeansAssign: emptied cluster keeps its centroid; ties go to the lowest cluster") {
    import spark.implicits._
    val same = Seq((0L, Seq(0, 0)), (1L, Seq(0, 0)), (2L, Seq(0, 0)))
      .toDF("vec_id", "vec")
    // both seeds coincide: every row ties -> cluster 0; cluster 1
    // empties and must carry its centroid through without crashing
    val a = Clustering.kmeansAssign(same, k = 2, iters = 2).orderBy("vec_id").collect()
    assert(a.map(_.getLong(1)).toSeq == Seq(0L, 0L, 0L))
    assert(a.forall(_.getDouble(2) == 0.0))
  }

  test("kmeansAssign: float vectors are loud; seedIds pins the seeds") {
    import spark.implicits._
    val floats = Seq((0L, Seq(0.5f, 1.0f))).toDF("vec_id", "vec")
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(floats, k = 1, iters = 1)
    }
    assert(e.getMessage.contains("quantize"))
    val vecs = Seq((0L, Seq(0, 0)), (5L, Seq(9, 9)), (9L, Seq(10, 10)))
      .toDF("vec_id", "vec")
    // pinned seeds 5,9: after one update c0 = mean([0,0],[9,9]) =
    // [4.5,4.5], and id5's [9,9] is now nearer c1's untouched [10,10]
    val a = Clustering.kmeansAssign(vecs, k = 2, iters = 1,
      seedIds = Some(Seq(5L, 9L))).orderBy("vec_id").collect()
    assert(a.map(_.getLong(1)).toSeq == Seq(0L, 1L, 1L))
  }

  test("centroidsFrame feeds the cell consumers: ivfTopK precomputed, full-probe = brute force") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val e = graft.sources.Tables.embeddings(spark, sf)
    val codes = e.select(F.col("vec_id"),
        graft.functions.native.int8_quantize(F.col("embedding")).as("q"))
      .select(F.col("vec_id"), F.col("q.codes").cast("array<int>").as("vec"))
    val cents = Clustering.centroidsFrame(spark,
      Clustering.kmeansTrain(codes, k = 4, iters = 2))
    val q = e.filter(F.col("vec_id") < 3)
      .select(F.col("vec_id").as("qid"), F.col("embedding").as("qvec"))
    // probing ALL learned cells must reduce to exact brute force —
    // the D3 contract holds under learned centroids too
    val ivf = graft.operators.Similarity.ivfTopK(e, q, k = 5, nprobe = 4,
        precomputed = Some(cents))
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = graft.operators.Similarity.bruteForceTopK(e, q, 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == bf)
  }

  test("clusterSizes: sizes sum to the corpus") {
    import spark.implicits._
    val vecs = (0 until 30).map(i => (i.toLong, Seq(i % 3, i % 4))).toDF("vec_id", "vec")
    val sizes = Clustering.clusterSizes(
      Clustering.kmeansAssign(vecs, k = 3, iters = 2)).collect()
    assert(sizes.map(_.getLong(1)).sum == 30L)
  }
}
