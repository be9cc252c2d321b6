package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.Spans

class SpansSpec extends SparkSuite {
  import spark.implicits._

  private val k = 4

  /** Driver-side reference: literal restatement of the contract. */
  private def reference(docs: Seq[(Long, String)], k: Int, minDf: Int): Map[Long, (String, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val occurrences = for {
      (id, ts) <- toks.toSeq; p <- 0 to ts.length - k
    } yield (ts.slice(p, p + k).mkString(" "), id, p)
    val dup = occurrences.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= minDf).keySet
    docs.map { case (id, _) =>
      val ts = toks(id)
      val covered = (for {
        p <- 0 to ts.length - k
        if dup(ts.slice(p, p + k).mkString(" "))
        i <- p until p + k
      } yield i).toSet
      val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> (kept.mkString(" "), covered.size.toLong)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], minDf: Int = 2): Map[Long, (String, Long)] =
    Spans.dropDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k, minDf)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("a paragraph duplicated across two docs is cut from both; unique prose survives") {
    val quote = "to be or not to be that is the question"
    val docs = Seq(
      (1L, s"alice wrote about spark plans and then quoted $quote before closing with her own words"),
      (2L, s"bob had other ideas entirely but also quoted $quote and then kept going differently"),
      (3L, "carol wrote something completely original with no shared content at all here"))
    val got = run(docs)
    assert(got == reference(docs, k, 2))
    // the quote is gone from both carriers, their own prose intact
    assert(!got(1L)._1.contains("to be or not"))
    assert(!got(2L)._1.contains("to be or not"))
    assert(got(1L)._1.startsWith("alice wrote about spark plans"))
    assert(got(2L)._1.startsWith("bob had other ideas"))
    assert(got(3L) == (docs(2)._2, 0L))
  }

  test("an exact whole-document duplicate is cut to nothing") {
    val body = "the same exact document body repeated verbatim in two places today"
    val docs = Seq((1L, body), (2L, body), (3L, "something else entirely unrelated to those two"))
    val got = run(docs)
    assert(got == reference(docs, k, 2))
    assert(got(1L)._1 == "" && got(2L)._1 == "")
    assert(got(3L)._2 == 0L)
  }

  test("docs shorter than k tokens pass through untouched, even if identical") {
    val docs = Seq((1L, "tiny doc here"), (2L, "tiny doc here"), (3L, ""))
    val got = run(docs)
    assert(got == reference(docs, k, 2))
    assert(got(1L) == ("tiny doc here", 0L))
    assert(got(2L) == ("tiny doc here", 0L))
  }

  test("within-doc repetition alone is not cut (cross-document df only)") {
    val docs = Seq(
      (1L, "again and again and again and again and again we looped through it"),
      (2L, "entirely different content with no overlap whatsoever to the first doc"))
    val got = run(docs)
    assert(got == reference(docs, k, 2))
    assert(got(1L)._2 == 0L)
  }

  test("overlapping duplicated runs merge into one covered region; minDf=3 needs three carriers") {
    val shared = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, s"head_a $shared tail_a"), (2L, s"head_b $shared tail_b"), (3L, s"head_c $shared tail_c"))
    for (minDf <- Seq(2, 3)) {
      val got = run(docs, minDf)
      assert(got == reference(docs, k, minDf), s"minDf=$minDf")
      // the shared run (10 tokens = 7 overlapping windows) drops as one block
      assert(got(1L)._1 == "head_a tail_a", s"minDf=$minDf")
      assert(got(1L)._2 == 10L)
    }
    // with a 4th doc sharing nothing, minDf=4 cuts nothing
    val got4 = run(docs :+ (4L -> "totally fresh text"), minDf = 4)
    assert(got4(1L)._1.contains(shared))
  }

  /** Driver-side decontamination reference: the contract restated —
    * covered = union of corpus windows present in the bench window set.
    */
  private def referenceDecon(corpus: Seq[(Long, String)], bench: Seq[String],
                             k: Int): Map[Long, (String, Long)] = {
    val benchWin = (for {
      b <- bench; ts = b.trim.split("\\s+").toSeq; if ts.length >= k
      p <- 0 to ts.length - k
    } yield ts.slice(p, p + k).mkString(" ")).toSet
    corpus.map { case (id, t) =>
      val ts = t.trim.split("\\s+").toSeq
      val covered = (for {
        p <- 0 to ts.length - k
        if benchWin(ts.slice(p, p + k).mkString(" "))
        i <- p until p + k
      } yield i).toSet
      val kept = ts.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
      id -> (kept.mkString(" "), covered.size.toLong)
    }.toMap
  }

  private def runDecon(corpus: Seq[(Long, String)], bench: Seq[String],
                       broadcastBench: Boolean = true): Map[Long, (String, Long)] =
    Spans.decontaminateSpans(corpus.toDF("doc_id", "text"),
        bench.map(Tuple1(_)).toDF("text"), "doc_id", "text", k,
        broadcastBench = broadcastBench)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("decontamination: a bench span is cut from its SINGLE corpus carrier") {
    // the key semantic difference vs dropDuplicateSpans: df-based dedup
    // needs >= 2 carriers; contamination cuts at df = 1
    val leak = "which of the following best describes the causes"
    val corpus = Seq(
      (1L, s"some scraped page that embeds $leak plus surrounding prose of its own"),
      (2L, "a perfectly clean document sharing nothing with any benchmark at all"))
    val bench = Seq(s"exam question one $leak answer key follows")
    val got = runDecon(corpus, bench)
    assert(got == referenceDecon(corpus, bench, k))
    assert(!got(1L)._1.contains("which of the following"))
    assert(got(1L)._1.startsWith("some scraped page that embeds"))
    assert(got(2L) == (corpus(1)._2, 0L))
    // sanity vs the df-2 dedup: the same corpus alone cuts nothing
    assert(run(corpus)(1L)._2 == 0L)
  }

  test("decontamination: short corpus docs and short bench docs are inert") {
    val corpus = Seq((1L, "tiny doc"), (2L, "tiny doc but this one is longer than k tokens"))
    val bench = Seq("tiny doc", "") // < k tokens: contributes no windows
    val got = runDecon(corpus, bench)
    assert(got == referenceDecon(corpus, bench, k))
    assert(got(1L) == ("tiny doc", 0L))
    assert(got(2L)._2 == 0L)
  }

  test("decontamination: overlapping bench windows merge; shuffled-semi path bit-identical") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"lead_in $shared trail_out"),
      (2L, s"$shared standing at the very front here"),
      (3L, "unrelated content entirely free of benchmark overlap today"))
    val bench = Seq(s"prefix words $shared suffix words")
    val got = runDecon(corpus, bench)
    assert(got == referenceDecon(corpus, bench, k))
    assert(got(1L)._1 == "lead_in trail_out" && got(1L)._2 == 8L)
    // broadcastBench=false (the giant-holdout routing) is bit-identical
    assert(runDecon(corpus, bench, broadcastBench = false) == got)
  }

  test("matches the reference on the real documents corpus (with its exact duplicates)") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = run(docs)
    val want = reference(docs, k, 2)
    assert(got == want)
    // the corpus's replicated docs guarantee real spans get cut
    assert(got.values.map(_._2).sum > 0, "expected duplicated spans in the fixture corpus")
  }
}
