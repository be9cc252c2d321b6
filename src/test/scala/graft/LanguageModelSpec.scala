package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.LanguageModel
import graft.sources.Tables

class LanguageModelSpec extends SparkSuite {
  import spark.implicits._

  test("bigram surprisal matches an independent driver-side model within 1e-9") {
    val docs = Tables.documents(spark, sf)
    val got = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap

    // reference: count tables + Laplace scoring, built independently
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val big = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for ((_, t) <- texts; w <- toks(t)) uni(w) += 1
    for ((_, t) <- texts; Seq(a, b) <- toks(t).sliding(2) if true) big((a, b)) += 1
    val v = uni.size.toDouble
    for ((id, t) <- texts) {
      val bgs = toks(t).sliding(2).filter(_.size == 2).toSeq
      val (wantN, wantS) =
        if (bgs.isEmpty) (0L, Double.NaN)
        else (bgs.size.toLong, bgs.map { case Seq(a, b) =>
          math.log(uni(a) + v) - math.log(big((a, b)) + 1.0)
        }.sum / bgs.size)
      val (gotN, gotS) = got(id)
      assert(gotN == wantN, s"doc $id bigram count")
      if (wantN == 0L) assert(gotS.isNaN, s"doc $id must be scoreless")
      else assert(math.abs(gotS - wantS) < 1e-9, s"doc $id: $gotS vs $wantS")
    }
    assert(got.values.exists(_._1 > 0), "fixture must contain scoreable docs")
  }

  test("precomputed model scores a foreign stream; unseen grams stay finite") {
    val train = Seq((1L, "a b c a b"), (2L, "a b a b")).toDF("doc_id", "text")
    val uni = LanguageModel.unigramCounts(train, "text")
    val big = LanguageModel.bigramCounts(train, "text")
    assert(uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 4L, "b" -> 4L, "c" -> 1L))
    assert(big.filter(F.col("w1") === "a" && F.col("w2") === "b")
      .head().getLong(2) == 4L) // two per training doc
    // score a doc of entirely unseen tokens against the trained model:
    // every bigram backs off to ln(V) - ln(1) = ln(3)
    val foreign = Seq((9L, "x y z")).toDF("doc_id", "text")
    val s = LanguageModel.bigramSurprisal(foreign, "doc_id", "text", Some((uni, big)))
      .head()
    assert(s.getLong(1) == 2L)
    assert(math.abs(s.getDouble(2) - math.log(3.0)) < 1e-12)
    // and a fluent in-model doc scores LOWER than the unseen one
    val fluent = Seq((8L, "a b a b")).toDF("doc_id", "text")
    val fs = LanguageModel.bigramSurprisal(fluent, "doc_id", "text", Some((uni, big)))
      .head().getDouble(2)
    assert(fs < s.getDouble(2), s"fluent $fs should beat foreign ${s.getDouble(2)}")
  }

  test("sub-two-token docs surface with zero bigrams and NULL score") {
    val docs = Seq((1L, "only"), (2L, ""), (3L, "two words")).toDF("doc_id", "text")
    val out = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.isNullAt(2)))).toMap
    assert(out(1L) == ((0L, true)))
    assert(out(2L) == ((0L, true)))
    assert(out(3L)._1 == 1L && !out(3L)._2)
  }
}
