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

  test("bigramHits: integer face matches a driver-side reference; classes partition") {
    // train on one half, score both — all three Laplace classes fire
    val train = Seq((0L, "a b c a b")).toDF("doc_id", "text")
    val docs = Seq((0L, "a b c a b"), (1L, "a b x c"), (2L, "q"), (3L, ""))
      .toDF("doc_id", "text")
    val model = (LanguageModel.unigramCounts(train, "text"),
      LanguageModel.bigramCounts(train, "text"))
    val got = LanguageModel.bigramHits(docs, "doc_id", "text", Some(model))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // doc 0: bigrams ab bc ca ab — all seen; c12: ab=2,bc=1,ca=1 →
    // position sum 2+1+1+2 = 6; unigrams a=2,b=2,c=1 → position sum
    // over w1 (a,b,c,a) = 2+2+1+2 = 7
    assert(got(0L) == ((4L, 4L, 0L, 0L, 6L, 7L)))
    // doc 1: ab (seen, c12=2, c1(a)=2), bx (ctx: b known, bx unseen,
    // c1(b)=2), xc (unseen: x not in vocab)
    assert(got(1L) == ((3L, 1L, 1L, 1L, 2L, 4L)))
    // docs with <2 tokens: all-zero row, never dropped
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    // classes partition n_bigrams on a real corpus slice
    val corpus = Tables.documents(spark, sf).limit(50)
    val even = corpus.filter(F.col("doc_id") % 2 === 0)
    val m2 = (LanguageModel.unigramCounts(even, "text"),
      LanguageModel.bigramCounts(even, "text"))
    val bad = LanguageModel.bigramHits(corpus, "doc_id", "text", Some(m2))
      .filter(F.col("n_seen") + F.col("n_ctx") + F.col("n_unseen") =!= F.col("n_bigrams"))
      .count()
    assert(bad == 0L, "the three classes must partition the bigram positions")
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

  /** Independent driver-side Stupid Backoff: count tables + the
    * longest-available-context rule, restated from the contract.
    */
  private def refBackoff(train: Seq[String], score: Seq[(Long, String)],
                         alpha: Double): Map[Long, (Seq[Long], Double)] = {
    def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val bi = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    val tri = scala.collection.mutable.Map.empty[(String, String, String), Long].withDefaultValue(0L)
    for (t <- train; ts = toks(t); i <- ts.indices) {
      uni(ts(i)) += 1
      if (i >= 1) bi((ts(i - 1), ts(i))) += 1
      if (i >= 2) tri((ts(i - 2), ts(i - 1), ts(i))) += 1
    }
    val n = uni.values.sum.toDouble
    score.map { case (id, t) =>
      val ts = toks(t)
      val perPos = ts.indices.map { i =>
        val (p1, p2) = (if (i >= 1) Some(ts(i - 1)) else None,
          if (i >= 2) Some(ts(i - 2)) else None)
        val avail = if (p2.isDefined) 2 else if (p1.isDefined) 1 else 0
        val (lvl, s) =
          if (p2.isDefined && tri((p2.get, p1.get, ts(i))) > 0)
            (3, tri((p2.get, p1.get, ts(i))).toDouble / bi((p2.get, p1.get)).toDouble)
          else if (p1.isDefined && bi((p1.get, ts(i))) > 0)
            (2, bi((p1.get, ts(i))).toDouble / uni(p1.get).toDouble)
          else if (uni(ts(i)) > 0) (1, uni(ts(i)).toDouble / n)
          else (0, 1.0 / n)
        val used = if (lvl == 3) 2 else if (lvl == 2) 1 else 0
        (lvl, -math.log(math.pow(alpha, (avail - used).toDouble) * s))
      }
      val counts = Seq(perPos.size.toLong) ++
        (3 to 0 by -1).map(l => perPos.count(_._1 == l).toLong)
      id -> ((counts, perPos.map(_._2).sum / perPos.size))
    }.toMap
  }

  test("stupid backoff matches an independent reference; all four levels fire on a foreign stream") {
    val train = Seq((0L, "the cat sat on the mat every day"),
      (2L, "the cat sat on a chair near the mat"))
    val score = train ++ Seq(
      (1L, "the cat sat quietly"), // tri hits then backoff
      (3L, "the dog barked loudly"), // bi/uni mix with unseen words
      (5L, "zzz qqq www")) // unseen everywhere
    val model = LanguageModel.trainStupidBackoff(train.toDF("doc_id", "text"), "text")
    val got = LanguageModel.stupidBackoff(score.toDF("doc_id", "text"), "doc_id", "text",
        Some(model))
      .collect().map(r => r.getLong(0) ->
        ((Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)),
          r.getDouble(6)))).toMap
    val want = refBackoff(train.map(_._2), score, 0.4)
    for ((id, (wc, ws)) <- want) {
      assert(got(id)._1 == wc, s"doc $id level counts: ${got(id)._1} vs $wc")
      assert(math.abs(got(id)._2 - ws) < 1e-9, s"doc $id: ${got(id)._2} vs $ws")
    }
    // the foreign docs exercise every backoff level across the fixture
    val levels = want.collect { case (id, (c, _)) if id % 2 == 1 => c.drop(1) }
    assert((0 to 3).forall(l => levels.exists(_(3 - l) > 0)),
      s"fixture must fire all levels: $levels")
  }

  test("self-trained backoff: every position >= 3 is a trigram hit, nothing unseen") {
    val docs = Tables.documents(spark, sf).limit(50)
    val out = LanguageModel.stupidBackoff(docs, "doc_id", "text")
    val bad = out.filter(
      F.col("n_unseen") =!= 0L ||
        F.col("n_tri") =!= F.greatest(F.col("n_tokens") - 2, F.lit(0L)))
    assert(bad.count() == 0, "self-scoring must resolve every full-context position at order 3")
  }

  /** Independent interpolated-KN reference: same tokenization law,
    * plain Scala maps — counts exact, surprisal for the 1e-9 pin.
    */
  private def refKn(train: Seq[String], score: Seq[(Long, String)],
                    d: Double): Map[Long, (Seq[Long], Option[Double])] = {
    def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val big = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for (t <- train; ts = toks(t); i <- 1 until ts.size) big((ts(i - 1), ts(i))) += 1
    val ctx = big.groupBy(_._1._1).map { case (w1, m) => w1 -> (m.values.sum, m.size) }
    val cont = big.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size }
    val b = big.size.toDouble
    score.map { case (id, t) =>
      val ts = toks(t)
      val perPos = (1 until ts.size).map { i =>
        val (w1, w2) = (ts(i - 1), ts(i))
        val pc = cont.getOrElse(w2, 0).toDouble / b
        val lvl = if (big((w1, w2)) > 0) 2 else if (cont.contains(w2)) 1 else 0
        val pMain = ctx.get(w1) match {
          case Some((tot, n1p)) =>
            math.max(big((w1, w2)).toDouble - d, 0.0) / tot + d * n1p / tot * pc
          case None => pc
        }
        val p = if (pMain > 0.0) pMain else 1.0 / (b + 1.0)
        (lvl, -math.log(p))
      }
      val counts = Seq(perPos.size.toLong) ++
        (2 to 0 by -1).map(l => perPos.count(_._1 == l).toLong)
      id -> ((counts,
        if (perPos.isEmpty) None else Some(perPos.map(_._2).sum / perPos.size)))
    }.toMap
  }

  test("interpolated KN matches an independent reference; all three mass classes fire") {
    val train = Seq((0L, "the cat sat on the mat every day"),
      (2L, "the cat sat on a chair near the mat"))
    val score = train ++ Seq(
      (1L, "the cat sat quietly"),  // observed bigrams then continuation backoff
      (3L, "mat the dog"),          // unseen bigram, known continuation ('the')
      (5L, "zzz qqq www"),          // unseen everywhere -> floor
      (7L, "single"))               // no bigrams: 0s + NULL surprisal
    val model = LanguageModel.trainKneserNey(train.toDF("doc_id", "text"), "text")
    val got = LanguageModel.kneserNey(score.toDF("doc_id", "text"), "doc_id", "text",
        Some(model))
      .collect().map(r => r.getLong(0) ->
        ((Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    val want = refKn(train.map(_._2), score, 0.75)
    for ((id, (wc, ws)) <- want) {
      assert(got(id)._1 == wc, s"doc $id mass-class counts: ${got(id)._1} vs $wc")
      (got(id)._2, ws) match {
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-9, s"doc $id: $g vs $w")
        case (g, w) => assert(g == w, s"doc $id surprisal presence: $g vs $w")
      }
    }
    // the fixture exercises observed / continuation-only / unseen
    val classes = want.collect { case (id, (c, _)) if id % 2 == 1 => c.drop(1) }
    assert((0 to 2).forall(l => classes.exists(_(2 - l) > 0)),
      s"fixture must fire all mass classes: $classes")
  }

  test("KN probabilities are a proper distribution over the training vocabulary") {
    // Σ_w2 P(w2|w1) over observed continuations + interpolated mass on
    // the rest must be 1 for a seen context — the property Stupid
    // Backoff gives up and KN keeps
    val train = Seq((0L, "a b a c a b d c a e"))
    val model = LanguageModel.trainKneserNey(train.toDF("doc_id", "text"), "text")
    val big = model.big.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ctx = model.ctx.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val cont = model.cont.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = (big.keys.map(_._1) ++ big.keys.map(_._2)).toSet
    val b = model.totalBigramTypes.toDouble
    val d = 0.75
    for (w1 <- vocab if ctx.contains(w1)) {
      val (tot, n1p) = ctx(w1)
      val sum = vocab.toSeq.map { w2 =>
        val pc = cont.getOrElse(w2, 0L).toDouble / b
        math.max(big.getOrElse((w1, w2), 0L).toDouble - d, 0.0) / tot + d * n1p / tot * pc
      }.sum
      // the continuation distribution sums to 1 over the vocab by
      // construction, so the interpolation preserves total mass
      assert(math.abs(sum - 1.0) < 1e-12, s"context '$w1' mass $sum")
    }
  }

  /** Independent trigram interpolated KN (raw counts on top,
    * continuation counts below), mirroring the operator's contract.
    */
  private def refKn3(train: Seq[String], score: Seq[(Long, String)],
                     d: Double): Map[Long, (Seq[Long], Option[Double])] = {
    def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val tri = scala.collection.mutable.Map.empty[(String, String, String), Long].withDefaultValue(0L)
    val big = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for (t <- train; ts = toks(t)) {
      for (i <- 2 until ts.size) tri((ts(i - 2), ts(i - 1), ts(i))) += 1
      for (i <- 1 until ts.size) big((ts(i - 1), ts(i))) += 1
    }
    val ctx12 = tri.groupBy(k => (k._1._1, k._1._2))
      .map { case (k, m) => k -> (m.values.sum, m.size) }
    val n23 = tri.groupBy(k => (k._1._2, k._1._3)).map { case (k, m) => k -> m.size }
    val mid2 = tri.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size }
    val n1p2 = n23.groupBy(_._1._1).map { case (w2, m) => w2 -> m.size }
    val cont1 = big.groupBy(_._1._2).map { case (w3, m) => w3 -> m.size }
    val b = big.size.toDouble
    score.map { case (id, t) =>
      val ts = toks(t)
      val perPos = (2 until ts.size).map { i =>
        val (w1, w2, w3) = (ts(i - 2), ts(i - 1), ts(i))
        val pc = cont1.getOrElse(w3, 0).toDouble / b
        val p2c = mid2.get(w2) match {
          case Some(m2) =>
            math.max(n23.getOrElse((w2, w3), 0).toDouble - d, 0.0) / m2 +
              d * n1p2(w2) / m2.toDouble * pc
          case None => pc
        }
        val p3 = ctx12.get((w1, w2)) match {
          case Some((tot, n1p)) =>
            math.max(tri((w1, w2, w3)).toDouble - d, 0.0) / tot +
              d * n1p / tot.toDouble * p2c
          case None => p2c
        }
        val lvl = if (tri((w1, w2, w3)) > 0) 3
          else if (n23.contains((w2, w3))) 2
          else if (cont1.contains(w3)) 1 else 0
        val p = if (p3 > 0.0) p3 else 1.0 / (b + 1.0)
        (lvl, -math.log(p))
      }
      val counts = Seq(perPos.size.toLong) ++
        (3 to 0 by -1).map(l => perPos.count(_._1 == l).toLong)
      id -> ((counts,
        if (perPos.isEmpty) None else Some(perPos.map(_._2).sum / perPos.size)))
    }.toMap
  }

  test("trigram interpolated KN matches an independent reference; all four mass classes fire") {
    val train = Seq((0L, "the cat sat on the mat every day"),
      (2L, "the cat sat on a chair near the mat"))
    val score = train ++ Seq(
      (1L, "the cat sat quietly"),   // observed trigram then lower-mass
      (3L, "mat the cat naps"),      // unseen trigram, known (w2,w3) continuation
      (5L, "dog saw the mat"),       // 'the mat': continuation; 'saw': cont1-only/unseen
      (7L, "zzz qqq www vvv"),       // unseen everywhere -> floor
      (9L, "no"))                    // <3 tokens: no trigram positions
    val model = LanguageModel.trainKneserNey3(train.toDF("doc_id", "text"), "text")
    val got = LanguageModel.kneserNey3(score.toDF("doc_id", "text"), "doc_id", "text",
        Some(model))
      .collect().map(r => r.getLong(0) ->
        ((Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    val want = refKn3(train.map(_._2), score, 0.75)
    for ((id, (wc, ws)) <- want) {
      assert(got(id)._1 == wc, s"doc $id mass-class counts: ${got(id)._1} vs $wc")
      (got(id)._2, ws) match {
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-9, s"doc $id: $g vs $w")
        case (g, w) => assert(g == w, s"doc $id surprisal presence: $g vs $w")
      }
    }
    // the fixture exercises every mass class somewhere
    val classes = want.values.map(_._1.drop(1)).toSeq
    assert((0 to 3).forall(l => classes.exists(_(3 - l) > 0)),
      s"fixture must fire all four mass classes: $classes")
    assert(got(9L)._1.head == 0L && got(9L)._2.isEmpty)
  }

  test("trigram KN is a proper distribution over the vocabulary for seen contexts") {
    val train = Seq((0L, "a b a c a b d c a e a b c"))
    val model = LanguageModel.trainKneserNey3(train.toDF("doc_id", "text"), "text")
    val tri = model.tri.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val ctx12 = model.ctx12.collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val n23 = model.n23.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val w2tab = model.w2tab.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val cont1 = model.cont1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = cont1.keySet ++ tri.keys.map(_._1)
    val b = model.totalBigramTypes.toDouble
    val d = 0.75
    for (((w1, w2), (tot, n1p)) <- ctx12) {
      val sum = vocab.toSeq.map { w3 =>
        val pc = cont1.getOrElse(w3, 0L).toDouble / b
        val p2c = w2tab.get(w2) match {
          case Some((m2, np2)) =>
            math.max(n23.getOrElse((w2, w3), 0L).toDouble - d, 0.0) / m2 +
              d * np2 / m2.toDouble * pc
          case None => pc
        }
        math.max(tri.getOrElse((w1, w2, w3), 0L).toDouble - d, 0.0) / tot +
          d * n1p / tot.toDouble * p2c
      }.sum
      assert(math.abs(sum - 1.0) < 1e-12, s"context '$w1 $w2' mass $sum")
    }
  }

  test("trigram KN level counts are partition-order-free") {
    val train = Seq((0L, "alpha beta gamma delta epsilon"), (2L, "alpha beta zeta eta theta"))
      .toDF("doc_id", "text")
    val score = (0 until 30).map(i => (i.toLong, s"alpha beta gamma token$i tail"))
      .toDF("doc_id", "text")
    val m = LanguageModel.trainKneserNey3(train, "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      LanguageModel.kneserNey3(df, "doc_id", "text", Some(m))
        .select("doc_id", "n_trigrams", "n_tri", "n_cont2", "n_cont1", "n_unseen")
        .collect().map(_.toString).sorted.toSeq
    assert(run(score) == run(score.repartition(7)))
  }

  test("backoff level counts are partition-order-free") {
    val train = Seq((0L, "alpha beta gamma delta"), (2L, "alpha beta epsilon zeta"))
      .toDF("doc_id", "text")
    val score = (0 until 40).map(i => (i.toLong, s"alpha beta gamma token$i tail"))
      .toDF("doc_id", "text")
    val m = LanguageModel.trainStupidBackoff(train, "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      LanguageModel.stupidBackoff(df, "doc_id", "text", Some(m))
        .select("doc_id", "n_tokens", "n_tri", "n_bi", "n_uni", "n_unseen")
        .collect().map(_.toString).sorted.toSeq
    assert(run(score) == run(score.repartition(7)))
  }
}
