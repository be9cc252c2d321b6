package graft

import org.apache.spark.sql.{functions => F}
import graft.functions.{text => T}

class TextSpec extends SparkSuite {
  import spark.implicits._

  test("token counts") {
    val df = Seq("the quick  brown fox", "a b c").toDF("text")
    val out = df.select(T.tokenCount(F.col("text"))).as[Int].collect()
    assert(out.toSeq == Seq(4, 3))
  }

  test("bpeish segments split alpha runs, digits, and punctuation marks") {
    val out = Seq("hello world42 x!").toDF("text")
      .select(T.bpeishCount(F.col("text"))).as[Int].collect()
    // hello, world, 42, x, !
    assert(out.head == 5)
  }

  test("fingerprint is order- and duplication-insensitive") {
    val df = Seq("red green blue", "blue blue red green", "red green yellow").toDF("text")
    val fps = df.select(T.fingerprint(F.col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("stopword ratio and quality score ranges") {
    val df = Seq("the cat sat on the mat", "zz xx yy ww").toDF("text")
    val sw = df.select(T.stopwordRatio(F.col("text"))).as[Double].collect()
    assert(math.abs(sw(0) - 3.0 / 6.0) < 1e-12)
    assert(sw(1) == 0.0)
    val q = df.select(T.qualityScore(F.col("text"))).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("redact scrubs emails, urls, phones, and long digit runs with typed placeholders") {
    val cases = Seq(
      ("contact bob.smith+x@example.co.uk for info", "contact <EMAIL> for info"),
      ("see https://example.com/a?b=1 now", "see <URL> now"),
      ("call +1 (555) 123-4567 today", "call <PHONE> today"),
      ("dial 555-123-4567 or 555 0123 now", "dial <PHONE> or <PHONE> now"),
      ("order 12345678 shipped", "order <NUM> shipped"),
      ("clean text stays clean", "clean text stays clean"),
      // non-PII numeric text must survive the scrub untouched: ISO
      // dates, decimals, versions, times (the round-3 <PHONE> pattern
      // over-matched all of these)
      ("released 2024-01-05 at 12:34:56", "released 2024-01-05 at 12:34:56"),
      ("pi is 3.14159 not 2.71828", "pi is 3.14159 not 2.71828"),
      ("upgrade 1.2.3.400 to 10.20.30.40", "upgrade 1.2.3.400 to 10.20.30.40"),
      ("totals 12 34 56 78 90", "totals 12 34 56 78 90"),
      // an email inside a URL is ONE redaction (patterns apply in order)
      ("https://a.io/mail?to=x@y.org rest", "<URL> rest"))
    val out = cases.map(_._1).toDF("text")
      .select(F.col("text"), T.redact(F.col("text")).as("r"), T.redactionCount(F.col("text")).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    for ((in, want) <- cases)
      assert(out(in)._1 == want, s"redact('$in') = '${out(in)._1}'")
    assert(out("clean text stays clean")._2 == 0)
    assert(out("contact bob.smith+x@example.co.uk for info")._2 == 1)
    assert(out("https://a.io/mail?to=x@y.org rest")._2 == 1,
      "sequential counting must not double-count the email inside the URL")
    // stability contract: two docs differing only in their PII redact
    // to the same text (dedup/fingerprint keys survive the scrub)
    val a = T.redact(F.lit("reach me at alice@a.com or 99887766 thanks"))
    val b = T.redact(F.lit("reach me at bob@b.org or 11223344 thanks"))
    val Seq((ra, rb)) = Seq(1).toDF("x").select(a, b).collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(ra == rb)
  }

  test("stripMarkup removes structure, keeps prose, decodes entities in the safe order") {
    def strip(s: String): String = {
      val df = Seq(s).toDF("x")
      df.select(T.stripMarkup(F.col("x"))).collect()(0).getString(0)
    }
    assert(strip("<html><body><p>hello <b>world</b></p></body></html>") == "hello world")
    // script/style subtrees go entirely, including their text and any
    // '<' in code; comments too, even multi-line
    assert(strip("a<script>if(1<2)x(\"q\")</script>b<style>p{}</style>c<!-- x\ny -->d") == "a b c d")
    // entities decode AFTER tag removal: literal &lt;p&gt; in prose
    // survives as visible text, never stripped as markup
    assert(strip("Q&amp;A says &lt;p&gt; is a tag") == "Q&A says <p> is a tag")
    // &amp; decodes last: double-escaped stays single-escaped
    assert(strip("&amp;lt;") == "&lt;")
    assert(strip("x&nbsp;&#39;y&#39;&nbsp;&quot;z&quot;") == "x 'y' \"z\"")
    // attributes (with quotes and slashes) vanish with the tag; doctype too
    assert(strip("<!DOCTYPE html><a href=\"http://e.com/p?a=1\">link</a>") == "link")
    // plain text is a fixed point
    assert(strip("no markup here, just text.") == "no markup here, just text.")
    // whitespace collapses to single spaces, trimmed
    assert(strip("  a\t\tb\r\nc  ") == "a b c")
  }

  test("language guess picks the matching lexicon") {
    val df = Seq(
      "the cat and the dog is in that house it seems",
      "el perro y la casa de los amigos en que vivimos",
      "der hund und die katze ist nicht ein problem zu haben",
      "qqq www eee").toDF("text")
    val out = df.select(T.langGuess(F.col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "und"))
  }

  test("classifier score matches an independent driver-side fold; model arity is checked") {
    import graft.operators.TextClassifier
    val w = TextClassifier.hashedWeights(4096)
    assert(w.forall(x => x >= -500 && x <= 500))
    val docs = Seq((1L, "the quick brown fox"), (2L, "single"), (3L, ""),
      (4L, "a a a repeated a a")).toDF("doc_id", "text")
    val got = TextClassifier.score(docs, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    def refScore(text: String): (Long, Double) = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val feats = toks ++ toks.zip(toks.drop(1)).map { case (x, y) => s"${x}_$y" }
      def h52(s: String): Long = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(13), 16)
      val raw = feats.map(f => w((h52(f) % 4096).toInt).toLong).sum
      (feats.size.toLong, raw.toDouble / (feats.size.toDouble * 1000.0))
    }
    for ((id, text) <- Seq(1L -> "the quick brown fox", 2L -> "single", 3L -> "",
        4L -> "a a a repeated a a"))
      assert(got(id) == refScore(text), s"doc $id")
    // empty text tokenizes to [''] — one unigram feature, never a 0/0
    assert(got(3L)._1 == 1L)

    intercept[IllegalArgumentException] {
      TextClassifier.score(docs, "doc_id", "text", w, buckets = 1024)
    }
  }

  test("classifier score is map-only: no Exchange in the plan") {
    import graft.operators.TextClassifier
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextClassifier.score(docs, "doc_id", "text",
      TextClassifier.hashedWeights(64), buckets = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scorer must not shuffle:\n${plan.take(1000)}")
  }

  /** Independent driver-side batch perceptron under the same feature
    * law (unigrams + '_'-bigrams, 52-bit md5-prefix % buckets).
    */
  private def refPerceptron(docs: Seq[(Long, String, Long)], buckets: Int,
                            epochs: Int, lr: Int): (Array[Long], Seq[Long]) = {
    def h52(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13), 16)
    val feats = docs.map { case (id, t, y) =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      val fs = toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"${a}_$b" }
      (id, y, fs.map(f => (h52(f) % buckets).toInt))
    }
    val w = Array.ofDim[Long](buckets)
    val hist = Seq.newBuilder[Long]
    for (_ <- 1 to epochs) {
      var mistakes = 0L
      val delta = Array.ofDim[Long](buckets)
      feats.foreach { case (_, y, bs) =>
        val raw = bs.map(w(_)).sum
        if (raw * y <= 0) { mistakes += 1; bs.foreach(b => delta(b) += lr.toLong * y) }
      }
      for (b <- 0 until buckets) w(b) += delta(b)
      hist += mistakes
    }
    (w, hist.result())
  }

  test("perceptron trainer matches an independent driver-side reference, epoch by epoch") {
    import graft.operators.TextClassifier
    val docs = Seq(
      (1L, "good clean prose with structure", 1L),
      (2L, "spam spam buy now spam", -1L),
      (3L, "good prose again with more structure", 1L),
      (4L, "buy buy now spam offer", -1L),
      (5L, "", -1L))
    for (epochs <- Seq(1, 2, 3)) {
      val (refW, refHist) = refPerceptron(docs, 256, epochs, lr = 1)
      val (gotW, gotHist) = TextClassifier.train(
        docs.toDF("doc_id", "text", "y"), "doc_id", "text", "y",
        buckets = 256, epochs = epochs)
      assert(gotW.map(_.toLong).toSeq == refW.toSeq, s"epochs=$epochs")
      assert(gotHist == refHist, s"epochs=$epochs")
    }
  }

  test("perceptron trainer solves a separable corpus; trained weights drive score()") {
    import graft.operators.TextClassifier
    val pos = (0 until 20).map(i => (i.toLong, s"alpha beta gamma doc$i", 1L))
    val neg = (0 until 20).map(i => (100L + i, s"zeta eta theta doc$i", -1L))
    val df = (pos ++ neg).toDF("doc_id", "text", "y")
    val (w, hist) = TextClassifier.train(df, "doc_id", "text", "y",
      buckets = 512, epochs = 8)
    assert(hist.last == 0L, s"expected convergence on a separable corpus, got $hist")
    val scored = TextClassifier.score(df, "doc_id", "text", w, buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    pos.foreach { case (id, _, _) => assert(scored(id) > 0, s"doc $id") }
    neg.foreach { case (id, _, _) => assert(scored(id) < 0, s"doc $id") }
  }

  test("perceptron training is partition-order-free; labels are validated") {
    import graft.operators.TextClassifier
    val docs = (0 until 60).map(i =>
      (i.toLong, s"word$i token${i % 7} filler${i % 3} tail", if (i % 2 == 0) 1L else -1L))
    val df = docs.toDF("doc_id", "text", "y")
    val (w1, h1) = TextClassifier.train(df, "doc_id", "text", "y", buckets = 128, epochs = 3)
    val (w2, h2) = TextClassifier.train(df.repartition(7), "doc_id", "text", "y",
      buckets = 128, epochs = 3)
    assert(w1.toSeq == w2.toSeq && h1 == h2)
    intercept[IllegalArgumentException] {
      TextClassifier.train(
        Seq((1L, "some text", 0L)).toDF("doc_id", "text", "y"),
        "doc_id", "text", "y", buckets = 64, epochs = 1)
    }
    // a NULL label must be rejected, not silently dropped from the fold
    intercept[IllegalArgumentException] {
      TextClassifier.train(
        Seq((1L, "fine text", Some(1L)), (2L, "doc with null label", None))
          .toDF("doc_id", "text", "y"),
        "doc_id", "text", "y", buckets = 64, epochs = 1)
    }
    // NULL text trains like empty text (one '' feature), no crash
    val (_, h) = TextClassifier.train(
      Seq((1L, Some("alpha beta"), 1L), (2L, None, -1L))
        .toDF("doc_id", "text", "y"),
      "doc_id", "text", "y", buckets = 64, epochs = 2)
    assert(h.size == 2)
  }

  test("one-vs-rest on 2 classes is exactly the binary perceptron and its mirror") {
    import graft.operators.TextClassifier
    val docs = (0 until 40).map { i =>
      val lang = if (i % 3 == 0) "en" else "xx"
      (i.toLong, s"word$i tok${i % 7} fill${i % 3} tail common", lang)
    }
    val df = docs.toDF("doc_id", "text", "lang")
    val bin = df.withColumn("y", F.when(F.col("lang") === "en", 1L).otherwise(-1L))
    for (epochs <- Seq(1, 3)) {
      val (bw, bh) = TextClassifier.train(bin, "doc_id", "text", "y",
        buckets = 256, epochs = epochs)
      val (ws, hist) = TextClassifier.trainOneVsRest(df, "doc_id", "text", "lang",
        Seq("en", "xx"), buckets = 256, epochs = epochs)
      // head 0 sees the same ±1 labels as the binary trainer; head 1
      // sees them negated, and the perceptron update is antisymmetric
      // (raw negates with the weights, so the SAME docs miss), so its
      // weights are the exact mirror and both heads share the binary
      // mistake history
      assert(ws(0).toSeq == bw.toSeq, s"epochs=$epochs head 0")
      assert(ws(1).toSeq == bw.map(-_).toSeq, s"epochs=$epochs head 1")
      assert(hist.map(_(0)) == bh && hist.map(_(1)) == bh, s"epochs=$epochs history")
      // argmax(raw, -raw) with ties to the lower index ⇒ predict
      // 'en' exactly when the binary raw score is >= 0
      val pred = TextClassifier.predictClasses(df, "doc_id", "text",
        Seq("en", "xx"), ws, buckets = 256)
        .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
      val rawBin = TextClassifier.score(df, "doc_id", "text", bw, buckets = 256)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      docs.foreach { case (id, _, _) =>
        val expected = if (rawBin(id) >= 0) "en" else "xx"
        assert(pred(id)._1 == expected, s"doc $id: ${pred(id)} vs raw ${rawBin(id)}")
      }
    }
  }

  test("one-vs-rest solves a separable 3-language corpus; argmax predicts every label") {
    import graft.operators.TextClassifier
    val docs =
      (0 until 15).map(i => (i.toLong, s"alpha beta gamma doc$i", "aa")) ++
      (0 until 15).map(i => (100L + i, s"zeta eta theta doc$i", "bb")) ++
      (0 until 15).map(i => (200L + i, s"omega sigma kappa doc$i", "cc"))
    val df = docs.toDF("doc_id", "text", "lang")
    val classes = Seq("aa", "bb", "cc")
    val (ws, hist) = TextClassifier.trainOneVsRest(df, "doc_id", "text", "lang",
      classes, buckets = 512, epochs = 8)
    assert(hist.last.forall(_ == 0L), s"expected all heads converged, got $hist")
    val pred = TextClassifier.predictClasses(df, "doc_id", "text", classes, ws, 512)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    docs.foreach { case (id, _, lang) => assert(pred(id) == lang, s"doc $id") }
  }

  test("one-vs-rest training is partition-order-free; labels outside the class set are loud") {
    import graft.operators.TextClassifier
    val docs = (0 until 60).map(i =>
      (i.toLong, s"word$i token${i % 7} filler${i % 3} tail", Seq("aa", "bb", "cc")(i % 3)))
    val df = docs.toDF("doc_id", "text", "lang")
    val classes = Seq("aa", "bb", "cc")
    val (w1, h1) = TextClassifier.trainOneVsRest(df, "doc_id", "text", "lang",
      classes, buckets = 128, epochs = 3)
    val (w2, h2) = TextClassifier.trainOneVsRest(df.repartition(7), "doc_id", "text", "lang",
      classes, buckets = 128, epochs = 3)
    assert(w1.map(_.toSeq) == w2.map(_.toSeq) && h1 == h2)
    intercept[IllegalArgumentException] {
      TextClassifier.trainOneVsRest(
        Seq((1L, "some text", "zz")).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang", classes, buckets = 64, epochs = 1)
    }
    // a NULL label must be rejected, not silently dropped
    intercept[IllegalArgumentException] {
      TextClassifier.trainOneVsRest(
        Seq((1L, "fine text", Some("aa")), (2L, "null label doc", None))
          .toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang", classes, buckets = 64, epochs = 1)
    }
    // zero-feature ties predict the FIRST class deterministically
    val zeroW = classes.map(_ => Array.ofDim[Int](64))
    val tied = TextClassifier.predictClasses(
      Seq((1L, "anything")).toDF("doc_id", "text"), "doc_id", "text",
      classes, zeroW, buckets = 64).collect()
    assert(tied.head.getString(2) == "aa" && tied.head.getLong(3) == 0L)
  }

  test("normalize/foldAccents: UAX #15 parity with java.text.Normalizer, idempotence, dedup rescue") {
    import graft.functions.{text => T}
    val fixtures = Seq(
      "Café",                    // combining acute → composes
      "Ångström",          // two combining marks
      "mañana",                   // already NFC: fast-path no-op
      "plain ascii",
      "élève",
      "ﬁn")                       // ﬁ ligature: NFC keeps, NFKC splits
    val df = fixtures.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = df.select($"id", T.normalize($"s").as("nfc"),
        T.normalize($"s", "NFKC").as("nfkc"), T.foldAccents($"s").as("folded"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    import java.text.Normalizer
    got.foreach { case (i, nfc, nfkc, folded) =>
      val s = fixtures(i.toInt)
      assert(nfc == Normalizer.normalize(s, Normalizer.Form.NFC), s"NFC drift on $i")
      assert(nfkc == Normalizer.normalize(s, Normalizer.Form.NFKC), s"NFKC drift on $i")
      val ref = Normalizer.normalize(s.toLowerCase, Normalizer.Form.NFD)
        .replaceAll("\\p{Mn}", "")
      assert(folded == ref, s"fold drift on $i")
    }
    // the canonical pair: composed and combining spellings become one
    assert(got(0)._2 == "Café" && got(0)._4 == "cafe")
    assert(got(5)._3 == "fin") // NFKC splits the ligature
    // idempotence: normalize ∘ normalize = normalize
    val twice = df.select(T.normalize(T.normalize($"s")).as("a"), T.normalize($"s").as("b"))
      .filter($"a" =!= $"b").count()
    assert(twice == 0)
    // nulls pass through; unknown form is loud at construction
    assert(Seq((1L, null: String)).toDF("id", "s")
      .select(T.normalize($"s")).head().isNullAt(0))
    intercept[IllegalArgumentException] { T.normalize($"s", "NFX") }

    // dedup rescue: the SAME text under two spellings collapses only
    // after normalization (the reason this stage runs before hashing)
    val pair = Seq((1L, "Café au lait"), (2L, "Café au lait")).toDF("doc_id", "text")
    def dupGroups(df: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Dedup.exact(df, "text", "doc_id").filter($"n_dups" > 1).count()
    assert(dupGroups(pair) == 0 &&
      dupGroups(pair.withColumn("text", T.normalize($"text"))) == 1)

    // SQL registration
    graft.functions.native.registerAll(spark)
    pair.createOrReplaceTempView("norm_t")
    assert(spark.sql("SELECT COUNT(DISTINCT graft_normalize(text, 'NFC')) AS n FROM norm_t")
      .head().getLong(0) == 1L)
  }

  test("SEARCH(): all-token containment under the ASCII analyzer; BigQuery spelling registered") {
    import graft.functions.native
    val docs = Seq(
      (1L, "The quick brown Fox, jumps!"),
      (2L, "quick fox"),
      (3L, "the slow brown dog"),
      (4L, null: String)).toDF("id", "t")
    val got = docs.select($"id",
        native.search($"t", F.lit("Quick FOX")).as("a"),
        native.search($"t", F.lit("fox dog")).as("b"),
        native.search($"t", F.lit("...")).as("c"),
        native.search($"t", F.lit("jumps")).as("d"))
      .collect().map(r => r.getLong(0) ->
        (0 to 3).map(i => if (r.isNullAt(i + 1)) null else r.getBoolean(i + 1))).toMap
    assert(got(1L) == Seq(true, false, true, true))   // punctuation splits; case folds
    assert(got(2L) == Seq(true, false, true, false))
    assert(got(3L) == Seq(false, false, true, false))
    assert(got(4L) == Seq(null, null, null, null))    // NULL data → NULL
    // null query → NULL
    assert(docs.filter($"id" === 1L)
      .select(native.search($"t", F.lit(null).cast("string"))).head().isNullAt(0))
    // BigQuery spelling through SQL
    native.registerAll(spark)
    docs.createOrReplaceTempView("search_t")
    assert(spark.sql(
      "SELECT COUNT(*) FROM search_t WHERE SEARCH(t, 'brown the')").head().getLong(0) == 2L)
  }
}
