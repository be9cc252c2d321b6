package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSuite {

  private lazy val corpus = Tables.embeddings(spark, sf)
  private lazy val queries = corpus.filter(F.col("vec_id") < 5)
    .select(F.col("vec_id").as("qid"), F.col("embedding").as("qvec"))

  private lazy val exact: Map[Long, Seq[Long]] =
    Similarity.bruteForceTopK(corpus, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

  test("bruteForceTopK matches a driver-side exact computation") {
    val rows = corpus.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    val byId = rows.toMap
    for (q <- 0L until 5L) {
      val want = rows.filter(_._1 != q)
        .map { case (id, v) => (id, cos(byId(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
      assert(exact(q) == want, s"query $q")
    }
  }

  test("ivfTopK with nprobe=3 of 10 cells reaches reasonable recall") {
    val approx = Similarity.ivfTopK(corpus, queries, 10, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = (0L until 5L).map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q).toSet).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall $mean too low: $recalls")
  }

  test("lshTopK reaches reasonable recall vs exact top-10") {
    val approx = Similarity.lshTopK(corpus, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = (0L until 5L).map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q).toSet).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall $mean too low: $recalls")
  }
}
