package graft

import graft.operators.InvertedIndex

class InvertedIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran"),
    (3L, "dogs ran fast")).toDF("doc_id", "text")

  test("termStats: df counts documents, tf_total counts occurrences") {
    val stats = InvertedIndex.termStats(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats("the") == ((2L, 2L)))
    assert(stats("cat") == ((2L, 2L)))
    assert(stats("ran") == ((2L, 2L)))
    assert(stats("sat") == ((1L, 1L)))
    assert(stats("dogs") == ((1L, 1L)))
    assert(stats.size == 6)
  }

  test("termStats counts repeated tokens within one doc once for df, n times for tf") {
    val rep = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val stats = InvertedIndex.termStats(rep, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats("a") == ((1L, 3L)))
    assert(stats("b") == ((1L, 1L)))
  }

  test("phraseOccurrences: adjacency not bag-of-words, overlaps count, first_pos exact") {
    val pd = Seq(
      (1L, "the cat sat on the cat mat"),
      (2L, "cat the sat"),
      (3L, "a a a b"),
      (4L, "the cat")).toDF("doc_id", "text")
    val two = InvertedIndex.phraseOccurrences(pd, "doc_id", "text", Seq("the", "cat"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1 has "the cat" at 0 and 4; doc 2 has both words but never
    // adjacent in order; doc 4 matches at 0
    assert(two == Map(1L -> ((2L, 0L)), 4L -> ((1L, 0L))))
    // overlapping occurrences each count: "a a" in "a a a" at 0 and 1
    val ov = InvertedIndex.phraseOccurrences(pd, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ov == Map(3L -> 2L))
    // three-term phrase spans the repeated middle word
    val three = InvertedIndex.phraseOccurrences(pd, "doc_id", "text", Seq("cat", "sat", "on"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(three == Map(1L -> ((1L, 1L))))
    // louds: multi-word and non-lowercase terms
    assert(intercept[IllegalArgumentException] {
      InvertedIndex.phraseOccurrences(pd, "doc_id", "text", Seq("the cat"))
    }.getMessage.contains("single tokens"))
    assert(intercept[IllegalArgumentException] {
      InvertedIndex.phraseOccurrences(pd, "doc_id", "text", Seq("The"))
    }.getMessage.contains("lowercase"))
  }

  test("phraseFromPostings over a persisted index is bit-equal to the direct scan") {
    val pd = Seq(
      (1L, "the cat sat on the cat mat"),
      (2L, "cat the sat"),
      (4L, "the cat")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-postings-").toString
    InvertedIndex.positionalPostings(pd, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val fromIdx = InvertedIndex.phraseFromPostings(
        spark.read.parquet(dir), Seq("the", "cat"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = InvertedIndex.phraseOccurrences(pd, "doc_id", "text", Seq("the", "cat"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromIdx == direct && fromIdx.nonEmpty)
  }

  test("searchFromPostings: all-terms containment equals the direct token-set recompute") {
    val pd = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog"),
      (3L, "cat mat"),
      (4L, "the cat mat and more")).toDF("doc_id", "text")
    val postings = InvertedIndex.positionalPostings(pd, "doc_id", "text")
    def got(terms: String*) =
      InvertedIndex.searchFromPostings(postings, terms)
        .collect().map(_.getLong(0)).toSet
    assert(got("the", "cat", "mat") == Set(1L, 4L))
    assert(got("cat") == Set(1L, 3L, 4L))
    // duplicate query terms collapse (containment, not counting)
    assert(got("the", "the", "dog") == Set(2L))
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.searchFromPostings(postings, Seq("The"))
    }
    assert(e.getMessage.contains("lowercase"))
  }

  test("phraseOccurrences: single corpus pass — the token scan appears once in the plan") {
    val pd = Seq((1L, "x y z x y")).toDF("doc_id", "text")
    val plan = InvertedIndex.phraseOccurrences(pd, "doc_id", "text", Seq("x", "y"))
      .queryExecution.optimizedPlan.toString
    // the staged positional table replaces per-term re-tokenization:
    // posexplode must appear at most once in the optimized plan
    assert("(?i)posexplode|generate".r.findAllIn(plan).size <= 2, plan.take(800))
  }

  test("tfidf: weight = tf * ln((N+1)/(df+1)), rare tokens outweigh common ones") {
    val w = InvertedIndex.tfidf(docs, "doc_id", "text", corpusSize = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val idfCommon = math.log(4.0 / 3.0) // df=2
    val idfRare = math.log(4.0 / 2.0)   // df=1
    assert(math.abs(w((1L, "the")) - idfCommon) < 1e-12)
    assert(math.abs(w((1L, "sat")) - idfRare) < 1e-12)
    assert(w((1L, "sat")) > w((1L, "the")))
  }

  test("contaminationPairs finds exactly the docs sharing enough shingles") {
    val bench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // verbatim copy: contaminated
      (11L, "a quick brown fox jumps over the lazy dog yesterday"), // heavy overlap
      (12L, "completely different words about something else entirely here now"))
      .toDF("doc_id", "text")
    val pairs = InvertedIndex.contaminationPairs(corpus, bench, "doc_id", "text", minShared = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(pairs.map(_._1).toSeq == Seq(10L, 11L), s"got $pairs")
    assert(pairs.head._3 == 8, "verbatim copy shares every shingle (10 tokens -> 8 trigrams)")
    // maxBenchDf drops ubiquitous shingles: with cap 0 nothing can match
    assert(InvertedIndex.contaminationPairs(corpus, bench, "doc_id", "text",
      minShared = 1, maxBenchDf = 0).count() == 0)
  }

  test("tfidf non-broadcast path: same weights, no BroadcastExchange") {
    val broad = InvertedIndex.tfidf(docs, "doc_id", "text", corpusSize = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val shuffled = InvertedIndex.tfidf(docs, "doc_id", "text", corpusSize = 3, broadcastIdf = false)
    val plan = shuffled.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"), plan.take(1500))
    val sw = shuffled.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(sw == broad, "broadcast and shuffle paths must produce identical weights")
  }

  test("maxBenchDf caps join fan-out on a skewed ubiquitous shingle") {
    // every bench doc shares one boilerplate phrase ("answer the following
    // question now") — the skew hazard: a corpus doc carrying it would
    // otherwise pair with EVERY bench doc
    val nBench = 40
    val bench = (1L to nBench.toLong)
      .map(i => (i, s"answer the following question now item$i detail$i extra$i"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "answer the following question now unrelated filler text here"), // boilerplate only
      (101L, s"answer the following question now item7 detail7 extra7"))       // true copy of bench 7
      .toDF("doc_id", "text")
    // uncapped: doc 100 pairs with all 40 bench docs off 3 boilerplate shingles
    val uncapped = InvertedIndex.contaminationPairs(corpus, bench, "doc_id", "text",
      minShared = 1, maxBenchDf = Int.MaxValue)
    assert(uncapped.filter($"corpus_id" === 100L).count() == nBench.toLong,
      "without the cap the ubiquitous shingle fans doc 100 out to every bench doc")
    // default cap (100) is above nBench here, so it must not fire either —
    // proves the default only removes genuinely eval-suite-wide boilerplate
    assert(InvertedIndex.contaminationPairs(corpus, bench, "doc_id", "text", minShared = 1)
      .filter($"corpus_id" === 100L).count() == nBench.toLong)
    // a cap below the boilerplate's bench-df kills the skew pairs but keeps
    // the true contamination signal (doc 101 still matches bench doc 7 on
    // its unique-content shingles)
    val capped = InvertedIndex.contaminationPairs(corpus, bench, "doc_id", "text",
      minShared = 1, maxBenchDf = 10)
    assert(capped.filter($"corpus_id" === 100L).count() == 0,
      "cap must drop pairs supported only by the ubiquitous shingle")
    val hits = capped.filter($"corpus_id" === 101L).collect()
    assert(hits.map(_.getLong(1)).toSeq == Seq(7L),
      s"true copy must survive the cap, got ${hits.mkString(",")}")
  }

  test("no countDistinct Expand in the termStats plan") {
    val plan = InvertedIndex.termStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(1500))
  }

  test("text_surprisal equals a driver-side unigram cross-entropy recompute") {
    val spark2 = spark
    val got = graft.SparkEntry.queries("text_surprisal")(spark2, sf)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // independent recompute: corpus unigram counts, per-doc weighted
    // mean of -ln(p(token))
    val tf = InvertedIndex.termFrequencies(
        graft.sources.Tables.documents(spark2, sf), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val corpusCt = tf.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val n = corpusCt.values.sum.toDouble
    val byDoc = tf.groupBy(_._1)
    assert(got.keySet == byDoc.keySet)
    for ((doc, rows) <- byDoc) {
      val toks = rows.map(_._3).sum
      val want = rows.map { case (_, t, k) => k * -math.log(corpusCt(t) / n) }.sum / toks
      val (gotS, gotN) = got(doc)
      assert(gotN == toks, s"doc $doc token count")
      assert(math.abs(gotS - want) < 1e-9, s"doc $doc: $gotS vs $want")
    }
    // sanity: a doc made of the corpus's most common token scores the
    // minimum possible surprisal
    val minP = -math.log(corpusCt.values.max / n)
    assert(got.values.forall(_._1 >= minP - 1e-9))
  }
}
