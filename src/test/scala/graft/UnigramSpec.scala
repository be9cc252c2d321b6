package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.Unigram
import graft.sources.Tables

/** Unigram-LM tokenizer (SentencePiece hard-EM): exact equality with
  * an independent driver-side reference, Viterbi determinism, unknown
  * handling, token-count bounds, partition invariance.
  */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  // ── independent reference: plain Scala, no Spark, same contract ──

  private def refViterbi(w: String, table: Map[String, Double], maxLen: Int): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    score(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i if score(j) > Double.NegativeInfinity) {
      val piece = w.substring(j, i)
      val s = table.get(piece) match {
        case Some(lp) => score(j) + lp
        case None if i - j == 1 => score(j) + graft.functions.UnigramSegment.UnknownLogp
        case None => Double.NegativeInfinity
      }
      if (s > score(i)) { score(i) = s; back(i) = j }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += w.substring(back(k), k); k = back(k) }
    out.reverse.toSeq
  }

  private def refTrain(words: Map[String, Long], vocabSize: Int, rounds: Int,
                       maxPieceLen: Int, seedSize: Int): Seq[(String, Double)] = {
    def substrWeights(maxL: Int): Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long]
      for ((w, n) <- words; l <- 1 to math.min(maxL, w.length);
           i <- 0 to w.length - l) {
        val p = w.substring(i, i + l)
        m(p) = m.getOrElse(p, 0L) + n
      }
      m.toMap
    }
    implicit val u8: Ordering[String] =
      (x: String, y: String) => org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
    val seeded = substrWeights(maxPieceLen).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    val singles = substrWeights(1).toSeq
    var counts: Map[String, Long] =
      (seeded ++ singles).groupBy(_._1).map { case (p, ws) => p -> ws.map(_._2).max }
    def toLogp(c: Map[String, Long]): Seq[(String, Double)] = {
      val total = c.valuesIterator.map(_ + 1L).sum.toDouble
      c.toSeq.sortBy { case (p, n) => (-n, p) }
        .map { case (p, n) => (p, math.log((n + 1L) / total)) }
    }
    var logp = toLogp(counts)
    val maxLenNow = () => counts.keysIterator.map(_.length).max
    for (round <- 1 to rounds) {
      val table = logp.toMap
      val estep = scala.collection.mutable.Map.empty[String, Long]
      for ((w, n) <- words; p <- refViterbi(w, table, maxLenNow()))
        estep(p) = estep.getOrElse(p, 0L) + n
      counts = counts.flatMap { case (p, _) =>
        val c = estep.getOrElse(p, 0L)
        if (c == 0L && p.length > 1) None else Some(p -> c)
      }
      if (round == rounds) {
        val (keepAlways, candidates) = counts.toSeq.partition(_._1.length == 1)
        val room = math.max(0, vocabSize - keepAlways.size)
        counts = (keepAlways ++
          candidates.sortBy { case (p, c) => (-c, p) }.take(room)).toMap
      }
      logp = toLogp(counts)
    }
    logp
  }

  private def wordFreqs(): Map[String, Long] =
    Tables.documents(spark, sf)
      .select(F.explode(graft.functions.text.tokens(F.col("text"))).as("w"))
      .filter(F.length(F.col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("train matches the independent reference implementation exactly") {
    val got = Unigram.train(Tables.documents(spark, sf), "text",
      vocabSize = 120, rounds = 3, maxPieceLen = 4, seedSize = 300)
    val want = refTrain(wordFreqs(), vocabSize = 120, rounds = 3,
      maxPieceLen = 4, seedSize = 300)
    assert(got.map(_._1) == want.map(_._1), {
      val g = got.map(_._1).toSet; val w = want.map(_._1).toSet
      s"piece sets differ: only-got=${(g -- w).take(5)} only-want=${(w -- g).take(5)}"
    })
    got.zip(want).foreach { case ((gp, gl), (wp, wl)) =>
      assert(gp == wp && gl == wl, s"($gp,$gl) != ($wp,$wl)")
    }
    assert(got.size <= 120 + got.count(_._1.length == 1))
  }

  test("Viterbi picks the max-probability split; ties keep the longer piece; unknowns are single chars") {
    val table = Seq(
      ("ab", math.log(0.30)), ("cd", math.log(0.30)), ("abc", math.log(0.25)),
      ("a", math.log(0.05)), ("b", math.log(0.04)), ("c", math.log(0.03)),
      ("d", math.log(0.03)))
    def seg(w: String): Seq[String] =
      Seq(w).toDF("w").select(Unigram.encode(F.col("w"), table).as("s"))
        .head().getSeq[String](0)
    // ab|cd (log .3+.3) beats abc|d (.25*.03) and singles
    assert(seg("abcd") == Seq("ab", "cd"))
    // abc wins over ab|c when nothing follows: .25 vs .3*.03
    assert(seg("abc") == Seq("abc"))
    // unknown char segments alone without sinking the neighbors
    assert(seg("abxcd") == Seq("ab", "x", "cd"))
    assert(seg("") == Seq.empty)
    // deterministic tie: with equal-prob ab/cd vs equal-prob a|b...
    val tied = Seq(("ab", math.log(0.25)), ("a", math.log(0.5)), ("b", math.log(0.5)))
    def seg2(w: String): Seq[String] =
      Seq(w).toDF("w").select(Unigram.encode(F.col("w"), tied).as("s"))
        .head().getSeq[String](0)
    // a|b (.5*.5=.25) TIES ab (.25): the longer piece stands
    assert(seg2("ab") == Seq("ab"))
  }

  test("tokenCount bounds and encode/train consistency on real documents") {
    val docs = Tables.documents(spark, sf)
    val pieces = Unigram.train(docs, "text", vocabSize = 150, rounds = 2,
      maxPieceLen = 4, seedSize = 300)
    assert(pieces.nonEmpty && pieces.forall(_._2 < 0.0))
    val tc = Unigram.tokenCount(docs, "doc_id", "text", pieces)
    val base = docs.select(F.col("doc_id"),
      F.size(graft.functions.text.tokens(F.col("text"))).as("n_words"),
      F.length(F.regexp_replace(F.col("text"), "\\s", "")).as("n_chars"))
    val joined = tc.join(base, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (uni, words, chars) = (r.getLong(1), r.getInt(2), r.getInt(3))
      assert(uni >= words && uni <= chars, s"doc ${r.getLong(0)}: $uni not in [$words, $chars]")
    }
  }

  test("subword regularization: valid segmentations, salt-determinism, k=1 = Viterbi, alpha shapes the draw") {
    import graft.functions.UnigramSample
    val table = Seq(
      ("ab", math.log(0.30)), ("cd", math.log(0.30)), ("abc", math.log(0.25)),
      ("a", math.log(0.05)), ("b", math.log(0.04)), ("c", math.log(0.03)),
      ("d", math.log(0.03)))
    def sample(w: String, salt: String, k: Int, alpha: Double): Seq[String] =
      Seq((w, salt)).toDF("w", "s")
        .select(Unigram.sampleEncode(F.col("w"), F.col("s"), table, k, alpha).as("x"))
        .head().getSeq[String](0)
    // every sample is a VALID segmentation (concat reconstructs)
    for (salt <- (0 until 40).map(_.toString)) {
      val s = sample("abcdabcd", salt, k = 8, alpha = 0.2)
      assert(s.mkString == "abcdabcd", s"invalid segmentation $s")
    }
    // same salt → same draw (RNG-free determinism)
    assert(sample("abcd", "s7", 8, 0.2) == sample("abcd", "s7", 8, 0.2))
    // k = 1 degenerates to Viterbi for any salt
    for (salt <- Seq("x", "y", "z"))
      assert(sample("abcd", salt, 1, 0.2) == Seq("ab", "cd"))
    // high alpha concentrates on the best segmentation
    val highAlpha = (0 until 60).map(i => sample("abcd", s"h$i", 8, 50.0))
    assert(highAlpha.forall(_ == Seq("ab", "cd")), "alpha=50 must pin the Viterbi split")
    // low alpha spreads: several distinct segmentations appear
    val spread = (0 until 60).map(i => sample("abcd", s"l$i", 8, 0.0)).distinct
    assert(spread.size > 1, s"alpha=0 over k-best must vary, got $spread")
    // the k-best list itself is sound: scores descend, head = Viterbi
    val expr = UnigramSample(null, null, table, 8, 0.2)
    val kb = expr.kBest("abcd")
    assert(kb.head._2 == Seq("ab", "cd"))
    assert(kb.map(_._1) == kb.map(_._1).sorted(Ordering[Double].reverse))
    assert(kb.map(_._2).distinct.size == kb.size, "k-best paths must be distinct")
  }

  test("training is partition-order invariant") {
    val docs = Tables.documents(spark, sf)
    val a = Unigram.train(docs, "text", vocabSize = 100, rounds = 2,
      maxPieceLen = 3, seedSize = 200)
    val b = Unigram.train(docs.repartition(7), "text", vocabSize = 100, rounds = 2,
      maxPieceLen = 3, seedSize = 200)
    assert(a == b)
  }
}
