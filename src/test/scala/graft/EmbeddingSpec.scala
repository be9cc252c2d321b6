package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.{Clustering, Embedding}

class EmbeddingSpec extends SparkSuite {

  /** Reference scatter under the repo hash law (52-bit md5 prefix). */
  private def refEmbed(text: String, dim: Int): Seq[Int] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    val grams = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    val v = new Array[Int](dim)
    val md = java.security.MessageDigest.getInstance("MD5")
    grams.foreach { g =>
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 13), 16) % (2L * dim)
      if (h < dim) v(h.toInt % dim) += 1 else v((h % dim).toInt) -= 1
    }
    v.toSeq
  }

  test("hashEmbedding matches the reference scatter under the repo hash law") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat"), (2L, "a"), (3L, "x y x y")).toDF("doc_id", "text")
    val got = Embedding.hashEmbedding(docs, "doc_id", "text", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == refEmbed("the cat sat", 8))
    assert(got(2L) == refEmbed("a", 8))
    assert(got(3L) == refEmbed("x y x y", 8))
    // components are signed counts: total mass equals the gram count
    // in absolute-sum terms only when no cancellation hits — the
    // sanity bound is |sum| <= grams
    val grams3 = 4 + 3
    assert(got(3L).map(math.abs).sum <= grams3)
  }

  test("hashEmbedding is repartition-invariant and feeds k-means directly") {
    import spark.implicits._
    val docs = Tables10.docs(spark, sf)
    val e1 = Embedding.hashEmbedding(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val e2 = Embedding.hashEmbedding(docs.repartition(7), "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(e1 == e2)
    // the integer components are kmeans-ready with no quantization step
    val assign = Clustering.kmeansAssign(
      Embedding.hashEmbedding(docs, "doc_id", "text", 16),
      k = 3, iters = 2, idCol = "doc_id", vecCol = "embedding")
    assert(assign.count() == docs.count())
    assert(assign.select("cluster").distinct().count() > 1)
  }

  test("normalized: unit norms (zero vectors stay zero), cosine-ready floats") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "")).toDF("doc_id", "text")
    val n = Embedding.normalized(docs, "doc_id", "text", 8)
      .select(F.col("doc_id"),
        F.aggregate(F.col("embedding"), F.lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(n(1L) - 1.0) < 1e-6)
  }

  private object Tables10 {
    def docs(s: org.apache.spark.sql.SparkSession, d: String) =
      graft.sources.Tables.documents(s, d).limit(60)
  }
}
