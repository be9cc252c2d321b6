package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Hybrid
import graft.sources.Tables

class HybridSpec extends SparkSuite {
  import spark.implicits._

  test("RRF laws on the fixture corpus: self top by vector, bounds, k rows") {
    val docs = Tables.documents(spark, sf)
    val vecs = Tables.embeddings(spark, sf)
    val queries = docs.filter(F.col("doc_id") % 50 === 0)
      .select(F.col("doc_id").as("qid"), F.col("text").as("qtext"))
      .join(vecs.select(F.col("vec_id").as("qid"), F.col("embedding").as("qvec")), "qid")
    val out = Hybrid.rrfSearch(docs, "doc_id", "text", vecs, "vec_id", "embedding",
      queries, "qid", "qtext", "qvec", k = 10, n = 20).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every query returns exactly k rows (corpus is far bigger than k)
    val perQuery = rows.groupBy(_.getLong(0)).values.map(_.length).toSet
    assert(perQuery == Set(10), s"expected 10 rows per query, got sizes $perQuery")
    // a query's own document has cosine 1.0 -> vector rank 1
    val self = rows.filter(r => r.getLong(0) == r.getLong(1))
    assert(self.nonEmpty, "self docs must surface")
    assert(self.forall(_.getLong(4) == 1L), "self similarity must rank 1 on the vector leg")
    // rrf bounds: 0 < rrf <= 2/(1+60)
    assert(rows.forall(r => r.getDouble(2) > 0.0 && r.getDouble(2) <= 2.0 / 61.0))
    // a rank of 0 means the leg missed the doc; then rrf is the other leg alone
    rows.filter(_.getLong(3) == 0L).foreach { r =>
      assert(math.abs(r.getDouble(2) - 1.0 / (r.getLong(4) + 60)) < 1e-15)
    }
  }

  test("legs fuse: lexical-only and vector-only docs both surface with rank 0 on the other leg") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"), (3L, "eta theta iota"),
      (4L, "kappa lambda mu"), (5L, "nu xi omicron")).toDF("doc_id", "text")
    // embeddings: doc 2 is near the query vector, others far; doc 1 has no vector at all
    def v(xs: Float*) = xs.toArray
    val vecs = Seq(
      (2L, v(1f, 0f)), (3L, v(0f, 1f)), (4L, v(-1f, 0f)), (5L, v(0f, -1f)))
      .toDF("vec_id", "embedding")
    // the query's text matches ONLY doc 1; its vector matches doc 2 best
    val queries = Seq((100L, "alpha beta", v(1f, 0.1f))).toDF("qid", "qtext", "qvec")
    val out = Hybrid.rrfSearch(docs, "doc_id", "text", vecs, "vec_id", "embedding",
      queries, "qid", "qtext", "qvec", k = 5, n = 2, maxDfFraction = 1.0)
      .orderBy(F.desc("rrf")).collect()
    val byDoc = out.map(r => r.getLong(1) -> r).toMap
    // doc 1: lexical rank 1, vector leg never saw it
    assert(byDoc(1L).getLong(3) == 1L && byDoc(1L).getLong(4) == 0L)
    // doc 2: vector rank 1, lexical leg never saw it
    assert(byDoc(2L).getLong(4) == 1L && byDoc(2L).getLong(3) == 0L)
    // both fuse to the same rrf (rank 1 on exactly one leg each) and tie
    assert(byDoc(1L).getDouble(2) == byDoc(2L).getDouble(2))
    // docs outside both top-n lists don't appear (n=2 vector cutoff)
    assert(!byDoc.contains(5L) || byDoc(5L).getLong(4) > 0)
  }

  test("ubiquitous query tokens are dropped (stopword df cap), rare ones still score") {
    // "the" appears in every doc — with the cap it must contribute
    // nothing, so only "needle" decides the lexical ranking
    val docs = (1L to 20L).map { i =>
      (i, if (i == 7L) "the needle here" else s"the filler w$i")
    }.toDF("doc_id", "text")
    def v(xs: Float*) = xs.toArray
    val vecs = Seq((1L, v(1f, 0f))).toDF("vec_id", "embedding")
    val queries = Seq((100L, "the needle", v(0f, 1f))).toDF("qid", "qtext", "qvec")
    val out = Hybrid.rrfSearch(docs, "doc_id", "text", vecs, "vec_id", "embedding",
      queries, "qid", "qtext", "qvec", k = 5, n = 5, maxDfFraction = 0.5)
      .collect()
    val lexRanked = out.filter(_.getLong(3) > 0L)
    assert(lexRanked.map(_.getLong(1)).toSet == Set(7L),
      s"only the needle doc may score lexically, got ${lexRanked.mkString(",")}")
  }

  test("rrfFuse over the extracted legs is bit-identical to rrfSearch") {
    val docs = Tables.documents(spark, sf)
    val vecs = Tables.embeddings(spark, sf)
    val queries = docs.filter(F.col("doc_id") % 50 === 0)
      .select(F.col("doc_id").as("qid"), F.col("text").as("qtext"))
      .join(vecs.select(F.col("vec_id").as("qid"), F.col("embedding").as("qvec")), "qid")
    val viaWrapper = Hybrid.rrfSearch(docs, "doc_id", "text", vecs, "vec_id", "embedding",
      queries, "qid", "qtext", "qvec", k = 10, n = 20).collect().map(_.toString).sorted
    val viaLegs = Hybrid.rrfFuse(Seq(
      "lex" -> Hybrid.lexicalLeg(docs, "doc_id", "text", queries, "qid", "qtext", n = 20),
      "vec" -> Hybrid.cosineLeg(vecs, "vec_id", "embedding", queries, "qid", "qvec", n = 20)),
      k = 10).collect().map(_.toString).sorted
    assert(viaWrapper.sameElements(viaLegs),
      "wrapper and explicit-leg fusion must produce identical rows")
  }

  test("a PQ-layout ANN leg drops into rrfFuse (three-leg fusion)") {
    import graft.operators.Similarity
    val docs = Tables.documents(spark, sf)
    val vecs = Tables.embeddings(spark, sf)
    val queries = docs.filter(F.col("doc_id") % 100 === 0)
      .select(F.col("doc_id").as("qid"), F.col("text").as("qtext"))
      .join(vecs.select(F.col("vec_id").as("qid"), F.col("embedding").as("qvec")), "qid")
    val dir = java.nio.file.Files.createTempDirectory("graft-hybrid-pq-").toString
    val cb = Similarity.pqTrain(vecs, m = 8, ksub = 16, iters = 1)
    Similarity.writePqCodesLayout(vecs, dir, cb)
    val pqTop = Similarity.pqTopKFromLayout(spark, dir, vecs, queries, 20, cb)
    val out = Hybrid.rrfFuse(Seq(
      "lex" -> Hybrid.lexicalLeg(docs, "doc_id", "text", queries, "qid", "qtext", n = 20),
      "vec" -> Hybrid.cosineLeg(vecs, "vec_id", "embedding", queries, "qid", "qvec", n = 20),
      "pq" -> Hybrid.leg(pqTop, "qid", "vec_id")),
      k = 10).cache()
    assert(out.columns.toSeq ==
      Seq("qid", "doc_id", "rrf", "lex_rank", "vec_rank", "pq_rank"))
    val rows = out.collect()
    val perQuery = rows.groupBy(_.getLong(0)).values.map(_.length).toSet
    assert(perQuery == Set(10), s"expected 10 rows per query, got sizes $perQuery")
    // rrf on a 3-leg fusion is bounded by 3/(1+60) and the sum of legs
    rows.foreach { r =>
      val expected = Seq(r.getLong(3), r.getLong(4), r.getLong(5))
        .filter(_ > 0).map(rank => 1.0 / (rank + 60)).sum
      assert(math.abs(r.getDouble(2) - expected) < 1e-15,
        s"rrf must equal the sum over surfacing legs: $r")
    }
    // the PQ leg agrees with the exact vector leg on the easy case:
    // a query's own vector is its nearest neighbor minus self-exclusion,
    // so SOME doc must carry a pq_rank — the leg is genuinely fused
    assert(rows.exists(_.getLong(5) > 0L), "pq leg never surfaced a doc")
  }

  /** Independent driver-side BM25 under the same contract (Lucene
    * positive idf, k1/b, length norm, distinct query tokens).
    */
  private def refBm25(docs: Seq[(Long, String)], queries: Seq[(Long, String)],
                      k1: Double, b: Double): Map[(Long, Long), Double] = {
    def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val dl = docs.map { case (id, t) => id -> toks(t).size.toDouble }.toMap
    val avgdl = dl.values.sum / dl.size
    val n = docs.size.toDouble
    val tf = docs.flatMap { case (id, t) => toks(t).map(w => (id, w)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df = tf.keys.groupBy(_._2).map { case (w, v) => w -> v.size.toDouble }
    (for {
      (qid, qt) <- queries; w <- toks(qt).distinct
      ((did, _), f) <- tf.filter(_._1._2 == w)
    } yield {
      val idf = math.log(1.0 + (n - df(w) + 0.5) / (df(w) + 0.5))
      val sat = f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dl(did) / avgdl))
      ((qid, did), idf * sat)
    }).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
  }

  test("bm25Leg matches an independent reference; idf and length-norm laws hold") {
    val docs = Seq(
      (1L, "rare gem inside ordinary prose today"),
      (2L, "ordinary prose about ordinary things in ordinary ways today"),
      (3L, "rare rare rare gem gem stacked"),
      (4L, "a short doc with gem"),
      (5L, "gem " + (1 to 40).map(i => s"filler$i").mkString(" ")))
      .toDF("doc_id", "text")
    val queries = Seq((100L, "rare gem"), (200L, "ordinary today")).toDF("qid", "qtext")
    val got = Hybrid.bm25Leg(docs, "doc_id", "text", queries, "qid", "qtext",
        n = 10, maxDfFraction = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    val want = refBm25(
      docs.as[(Long, String)].collect().toSeq,
      Seq((100L, "rare gem"), (200L, "ordinary today")), k1 = 1.25, b = 0.75)
    assert(got.keySet == want.keySet)
    want.foreach { case (k, s) =>
      assert(math.abs(got(k)._1 - s) < 1e-9, s"pair $k: ${got(k)._1} vs $s") }
    // idf law: for query 100, doc 4 ("gem", 5 tokens) must outrank
    // doc 5 ("gem" + 40 fillers) — same tf, length norm decides
    assert(got((100L, 4L))._1 > got((100L, 5L))._1, "length norm must favor the short doc")
    // saturation: doc 3's tf=3 "rare" scores less than 3x doc 1's tf=1
    val idfRare = math.log(1.0 + (5.0 - 2.0 + 0.5) / (2.0 + 0.5))
    assert(got((100L, 3L))._1 < 3.0 * got((100L, 1L))._1 + 1e-9)
    assert(idfRare > 0)
  }

  test("bm25 scores are bit-identical across partitionings; leg fuses into rrfFuse") {
    val docs = Tables.documents(spark, sf)
    val queries = docs.filter(F.col("doc_id") % 50 === 0)
      .select(F.col("doc_id").as("qid"), F.col("text").as("qtext"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Hybrid.bm25Leg(d, "doc_id", "text", queries, "qid", "qtext", n = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val a = run(docs)
    assert(a.nonEmpty)
    // the sorted in-row fold makes double scores BIT-identical, not
    // merely close, under a different partitioning
    assert(run(docs.repartition(7)) == a)
    // pluggability: the bm25 leg fuses beside the raw-tf lexical leg
    val fused = Hybrid.rrfFuse(Seq(
      "bm25" -> Hybrid.leg(
        Hybrid.bm25Leg(docs, "doc_id", "text", queries, "qid", "qtext", n = 10),
        "qid", "doc_id"),
      "lex" -> Hybrid.lexicalLeg(docs, "doc_id", "text", queries, "qid", "qtext", n = 10)),
      k = 5)
    val rows = fused.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) > 0L || r.getLong(4) > 0L))
  }

  test("stats deferral: deferred ≡ eager ≡ table-stats bit-for-bit; construction runs no job") {
    val docs = Tables.documents(spark, sf)
    val queries = docs.filter(F.col("doc_id") % 100 === 0)
      .select(F.col("doc_id").as("qid"), F.col("text").as("qtext"))
    def collectB(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val deferred = collectB(Hybrid.bm25Leg(docs, "doc_id", "text",
      queries, "qid", "qtext", n = 10, maxDfFraction = 0.5))
    assert(deferred.nonEmpty)
    // eager collect (the old construction-time job) — bit-identical,
    // including the df-cap cut at maxDfFraction=0.5
    val eager = collectB(Hybrid.bm25Leg(docs, "doc_id", "text",
      queries, "qid", "qtext", n = 10, maxDfFraction = 0.5, deferStats = false))
    assert(eager == deferred, "deferred stats must equal the eager collect bit-for-bit")
    // table-stats route: feed the same (N, avgdl) as known values
    val st = docs.agg(F.count(F.lit(1)),
      F.avg(F.size(graft.functions.text.tokens(F.col("text"))))).head()
    val known = collectB(Hybrid.bm25Leg(docs, "doc_id", "text",
      queries, "qid", "qtext", n = 10, maxDfFraction = 0.5,
      knownDocCount = Some(st.getLong(0)), knownAvgDl = Some(st.getDouble(1))))
    assert(known == deferred, "known stats must equal the deferred route bit-for-bit")
    // lexical leg: deferred ≡ eager under a biting df cap
    def collectL(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._3)).toSeq
    val lexD = collectL(Hybrid.lexicalLeg(docs, "doc_id", "text",
      queries, "qid", "qtext", n = 10, maxDfFraction = 0.5))
    val lexE = collectL(Hybrid.lexicalLeg(docs, "doc_id", "text",
      queries, "qid", "qtext", n = 10, maxDfFraction = 0.5, deferStats = false))
    assert(lexD.nonEmpty && lexD == lexE)
    // job-freeness, deterministically: a corpus whose SCAN raises must
    // still CONSTRUCT under deferral (no stats job fires), and only
    // fail at action time; the eager route fails at construction
    val poisoned = docs.withColumn("text",
      F.when(F.col("doc_id") >= 0, F.raise_error(F.lit("scan fired")))
        .otherwise(F.col("text")).cast("string"))
    val lazyLeg = Hybrid.bm25Leg(poisoned, "doc_id", "text",
      queries, "qid", "qtext", n = 10) // must not throw
    intercept[Exception] { lazyLeg.collect() }
    intercept[Exception] {
      Hybrid.bm25Leg(poisoned, "doc_id", "text", queries, "qid", "qtext",
        n = 10, deferStats = false) // the old eager job fires the poison
    }
  }

  test("no Window over the corpus: ranks come from bounded top-k arrays") {
    val docs = Tables.documents(spark, sf)
    val vecs = Tables.embeddings(spark, sf)
    val queries = docs.filter(F.col("doc_id") === 0)
      .select(F.col("doc_id").as("qid"), F.col("text").as("qtext"))
      .join(vecs.select(F.col("vec_id").as("qid"), F.col("embedding").as("qvec")), "qid")
    val out = Hybrid.rrfSearch(docs, "doc_id", "text", vecs, "vec_id", "embedding",
      queries, "qid", "qtext", "qvec")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank must not come from a window:\n${plan.take(800)}")
    assert(plan.toLowerCase.contains("topk"),
      "bounded top-k aggregate missing from the plan")
  }
}
