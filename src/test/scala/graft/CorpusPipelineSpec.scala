package graft

import java.nio.file.Files
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

class CorpusPipelineSpec extends SparkSuite {

  import spark.implicits._

  private val header = "SITE NAVIGATION: home about contact the and of to"

  /** Synthetic corpus exercising every stage: boilerplate chrome,
    * an exact dup pair, a near-dup pair, a junk (low-quality) doc,
    * and skewed sources.
    */
  private lazy val corpus = {
    val body = (1 to 40).map(i =>
      (100L + i, s"$header\nthe quick document number $i talks about the state of the " +
        s"engine and of the data it is processing in run $i today", "web"))
    val rare = Seq(
      (1L, s"$header\nthe rare book source document one about the history of the engine and its design", "books"),
      (2L, s"$header\nthe rare book source document two about the future of the engine and its users", "books"))
    val dups = Seq(
      (11L, s"$header\nthe exact duplicate candidate document about the cost of the shuffle in the engine", "web"),
      (12L, s"$header\nthe exact duplicate candidate document about the cost of the shuffle in the engine", "web"),
      (13L, s"$header\nthe near duplicate candidate document about the cost of the shuffle in the engine today", "web"))
    val junk = Seq((21L, "zzz", "web")) // fails the quality floor
    (body ++ rare ++ dups ++ junk).toDF("doc_id", "text", "source")
  }

  test("end-to-end: filters junk, strips chrome, drops dups, mixes, packs, exports") {
    val dir = Files.createTempDirectory("graft-corpus-").toString
    val cfg = CorpusPipeline.Config(packBuckets = 4, packBudget = 512L, maxSeqsPerShard = 4)
    val mixed = CorpusPipeline.run(spark, corpus, "doc_id", "text", "source", dir, cfg)
      .cache()
    val kept = mixed.select("doc_id").as[Long].collect().toSet

    // junk doc gated out; at most one of the exact-dup pair (and the
    // near dup of it) survives into the mix candidates
    assert(!kept.contains(21L))
    assert(Seq(11L, 12L, 13L).count(kept.contains) <= 1)

    // chrome is stripped from every surviving doc
    val texts = mixed.select("text").as[String].collect()
    assert(texts.nonEmpty && texts.forall(!_.contains("SITE NAVIGATION")))

    // shards exist, are readable, and every sequence respects the budget
    val shards = spark.read.parquet(dir)
    assert(shards.count() > 0)
    assert(shards.agg(F.sum("n_docs")).head().getLong(0) == mixed.count())
    val overBudget = shards.filter(F.col("total_cost") > cfg.packBudget && F.col("n_docs") > 1)
    assert(overBudget.count() == 0)
  }

  test("the pipeline is deterministic: two runs produce identical shards") {
    val d1 = Files.createTempDirectory("graft-corpus-a-").toString
    val d2 = Files.createTempDirectory("graft-corpus-b-").toString
    val cfg = CorpusPipeline.Config(packBuckets = 4, packBudget = 512L)
    CorpusPipeline.run(spark, corpus, "doc_id", "text", "source", d1, cfg)
    CorpusPipeline.run(spark, corpus, "doc_id", "text", "source", d2, cfg)
    val a = spark.read.parquet(d1).orderBy("bucket", "seq")
      .collect().map(_.toString).toSeq
    val b = spark.read.parquet(d2).orderBy("bucket", "seq")
      .collect().map(_.toString).toSeq
    assert(a == b, "same input must produce byte-identical shard rows")
  }

  test("budgeted mix stage: up-sampling epochs pack as distinct units; determinism holds") {
    // budgets that force the rare 'books' source into 3 full epochs +
    // a partial, while 'web' downsamples to a partial only
    val dir1 = Files.createTempDirectory("graft-corpus-bud1-").toString
    // budgets are set against the totals the mix stage will actually
    // see — the DEDUPED corpus (the 40 near-dup web bodies collapse
    // to a handful of survivors)
    val tot = CorpusPipeline.dedup(
        CorpusPipeline.filterAndClean(corpus, "doc_id", "text", "source",
          CorpusPipeline.Config()),
        "doc_id", "text", CorpusPipeline.Config())
      .groupBy("source").agg(F.sum(F.length($"text")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cfg = CorpusPipeline.Config(packBuckets = 4, packBudget = 512L,
      budgets = Some(Map(
        "books" -> (3 * tot("books") + tot("books") / 2),
        "web" -> tot("web") / 2)))
    val mixed = CorpusPipeline.run(spark, corpus, "doc_id", "text", "source", dir1, cfg)
      .cache()
    // every surviving books doc appears in epochs 0..2 (full copies)
    val bookEpochs = mixed.filter($"source" === "books")
      .groupBy("doc_id").agg(F.collect_set("epoch").as("es")).collect()
    assert(bookEpochs.nonEmpty)
    bookEpochs.foreach { r =>
      val es = r.getSeq[Int](1).toSet
      assert(Set(0, 1, 2).subsetOf(es), s"books doc ${r.getLong(0)} epochs $es")
    }
    // web only ever has epoch 0 (partial downsample)
    assert(mixed.filter($"source" === "web" && $"epoch" > 0).count() == 0)
    // shards carry replica instances as distinct pack units under the
    // composite id·(maxEpochs+1)+epoch key
    val k = 101L // default maxEpochs + 1
    val shardDocs = spark.read.parquet(dir1)
      .select(F.explode(F.col("doc_ids")).as("d")).as[Long].collect()
    // packGreedy's contract excludes zero-cost rows (doc 11 survives
    // dedup with an EMPTY cleaned text: its only line was chrome) —
    // every positive-cost replica instance packs exactly once
    assert(shardDocs.length == mixed.filter(F.length($"text") > 0).count(),
      "every positive-cost replica instance must pack exactly once")
    assert(shardDocs.exists(_ % k == 2L), "3-epoch source must contribute epoch-2 instances")
    assert(shardDocs.distinct.length == shardDocs.length)

    // determinism: a second run produces identical shards
    val dir2 = Files.createTempDirectory("graft-corpus-bud2-").toString
    CorpusPipeline.run(spark, corpus, "doc_id", "text", "source", dir2, cfg)
    val a = spark.read.parquet(dir1).orderBy("bucket", "seq").collect().map(_.toString).toSeq
    val b = spark.read.parquet(dir2).orderBy("bucket", "seq").collect().map(_.toString).toSeq
    assert(a == b)
    mixed.unpersist()
  }

  test("the regex gate evaluates once: downstream plans read the stage, not the gate subtree") {
    val cleaned = CorpusPipeline.filterAndClean(corpus, "doc_id", "text", "source",
      CorpusPipeline.Config())
    val plan = cleaned.queryExecution.optimizedPlan.toString
    // staging materialized langGuess/quality/redact already — if any
    // regex or observe node survives here, the gate would re-run per
    // downstream reference (and double-fire the funnel metric)
    assert(!plan.toLowerCase.contains("regexp"), plan.take(1500))
    assert(!plan.contains("CollectMetrics"), plan.take(1500))
    // durable staging path: byte-identical result
    val dir = Files.createTempDirectory("graft-corpus-stage-").toString
    val durable = CorpusPipeline.filterAndClean(corpus, "doc_id", "text", "source",
      CorpusPipeline.Config(stagingDir = Some(s"$dir/stages")))
    assert(durable.orderBy("doc_id").collect().toSeq == cleaned.orderBy("doc_id").collect().toSeq)
    graft.operators.Staging.drop(spark, dir)
  }

  test("funnel metrics fire exactly once per run") {
    import org.apache.spark.sql.Observation
    // Observation registers a listener keyed to the observe name; a
    // double-evaluated gate subtree would throw on re-registration or
    // report a doubled count. 43 gated docs = 48 - junk(21) - 4 books/web
    // chrome... counted directly against the corpus below.
    val obs = Observation("corpus_gate_check")
    val gated = corpus
      .observe(obs, F.count(F.lit(1)).as("docs_in"))
    val cfg = CorpusPipeline.Config()
    val cleaned = CorpusPipeline.filterAndClean(gated, "doc_id", "text", "source", cfg)
    cleaned.collect()
    assert(obs.get("docs_in") == corpus.count(),
      "the input subtree must be evaluated exactly once (staged), not once per reference")
  }

  test("stage 0: a markup-wrapped crawl yields the same survivors as the plain corpus") {
    // the same corpus rendered as HTML pages, per-doc distinct tag
    // attributes so raw texts differ even between exact-dup pairs'
    // pages; stripMarkup must collapse them back
    val pages = corpus.select(
      F.col("doc_id"),
      F.concat(
        F.lit("<html><body><div id=\"p"), F.col("doc_id"), F.lit("\"><p>"),
        F.col("text"), F.lit("</p></div><!-- footer --></body></html>")).as("text"),
      F.col("source"))
    val cfg = CorpusPipeline.Config(packBuckets = 4, packBudget = 512L, maxSeqsPerShard = 4)
    val dirPlain = Files.createTempDirectory("graft-corpus-plain-").toString
    val dirPages = Files.createTempDirectory("graft-corpus-pages-").toString
    val plain = CorpusPipeline.run(spark, corpus, "doc_id", "text", "source", dirPlain, cfg)
      .select("doc_id").as[Long].collect().toSet
    val strippedRun = CorpusPipeline.run(spark, pages, "doc_id", "text", "source", dirPages,
        cfg.copy(stripMarkup = true)).cache()
    val stripped = strippedRun.select("doc_id").as[Long].collect().toSet
    assert(stripped == plain)
    // and the surviving text is prose, not tag soup
    assert(strippedRun.filter(F.col("text").contains("<div") ||
      F.col("text").contains("</p>")).count() == 0)
  }

  test("spans + chunk stages: duplicated spans cut, chunks forked, determinism and single-fire hold") {
    import org.apache.spark.sql.Observation
    // two docs embed the same long span in different surroundings —
    // exactly what document-level dedup misses and span dedup cuts
    val span = "the grand canonical replay of the span removal experiment in this pipeline run"
    val spanny = corpus.unionByName(Seq(
      (41L, s"$header\nthe first host document where $span appears among otherwise unique prose about graphs", "web"),
      (42L, s"$header\nthe second host carrier text has $span inside a different story about engines", "web"))
      .toDF("doc_id", "text", "source"))
    val cfg = CorpusPipeline.Config(packBuckets = 4, packBudget = 512L, maxSeqsPerShard = 4,
      spanK = Some(8), chunkTokens = Some(32), chunkOverlap = 8)
    val d1 = Files.createTempDirectory("graft-corpus-sc1-").toString
    val d2 = Files.createTempDirectory("graft-corpus-sc2-").toString

    val obs = Observation("corpus_spans_gate_check")
    val observed = spanny.observe(obs, F.count(F.lit(1)).as("docs_in"))
    val mixed = CorpusPipeline.run(spark, observed, "doc_id", "text", "source", d1, cfg).cache()
    // even with BOTH forks on (shards + chunks reference the deduped
    // survivors), the input subtree evaluated exactly once
    assert(obs.get("docs_in") == spanny.count(),
      "input must evaluate once despite the two-sink fan-out")

    // the duplicated span is cut from every surviving text
    val texts = mixed.select("text").as[String].collect()
    assert(texts.nonEmpty && texts.forall(!_.contains(span)),
      "cross-document duplicated span must be removed")
    // the chunk fork wrote beside the shards: provenance kept, every
    // chunk within budget, chunk doc_ids ⊆ survivors
    val chunks = spark.read.parquet(s"$d1-chunks")
    assert(chunks.columns.contains("source") && chunks.columns.contains("chunk_text"))
    assert(chunks.filter(F.size(F.split(F.col("chunk_text"), "\\s+")) > 32).count() == 0)
    val chunkDocs = chunks.select("doc_id").distinct().as[Long].collect().toSet
    val survivorDocs = CorpusPipeline.dedup(
      CorpusPipeline.dropSpans(
        CorpusPipeline.filterAndClean(spanny, "doc_id", "text", "source", cfg),
        "doc_id", "text", "source", cfg),
      "doc_id", "text", cfg).select("doc_id").as[Long].collect().toSet
    assert(chunkDocs.subsetOf(survivorDocs))
    // hosts survive DOCUMENT-level dedup (their remainders differ) —
    // the mix stage may still sample either out of the training cut
    assert(survivorDocs.contains(41L) && survivorDocs.contains(42L))

    // byte-identical rerun: shards AND chunks
    CorpusPipeline.run(spark, spanny, "doc_id", "text", "source", d2, cfg)
    def rows(p: String) = spark.read.parquet(p).orderBy("bucket", "seq")
      .collect().map(_.toString).toSeq
    def crows(p: String) = spark.read.parquet(p).orderBy("doc_id", "chunk_id")
      .collect().map(_.toString).toSeq
    assert(rows(d1) == rows(d2), "span+chunk pipeline must stay shard-deterministic")
    assert(crows(s"$d1-chunks") == crows(s"$d2-chunks"), "chunk fork must be deterministic")
  }

  test("benchDocs stage: benchmark spans are cut before dedup and the mix; determinism holds") {
    // one corpus doc embeds a benchmark question verbatim — the
    // single-carrier case document dedup AND span-df dedup both miss
    val leak = "which of the following statements best describes the observed behavior of the system"
    val contaminated = corpus.unionByName(Seq(
      (51L, s"$header\nthe scraped page copied $leak into its body beside its own original commentary", "web"))
      .toDF("doc_id", "text", "source"))
    val bench = Seq((9001L, s"exam item: $leak answer: none of the above"))
      .toDF("bench_id", "text")
    val cfg = CorpusPipeline.Config(packBuckets = 4, packBudget = 512L, maxSeqsPerShard = 4,
      benchDocs = Some(bench), benchK = 8)
    val d1 = Files.createTempDirectory("graft-corpus-dc1-").toString
    val d2 = Files.createTempDirectory("graft-corpus-dc2-").toString
    val mixed = CorpusPipeline.run(spark, contaminated, "doc_id", "text", "source", d1, cfg).cache()

    // nothing the mix selected carries any bench text
    assert(mixed.select("text").as[String].collect()
      .forall(!_.contains("which of the following statements")))

    // at the SURVIVORS level (pre-mix, so the √-temperature draw can't
    // make the assertion vacuous): the leak is cut, the host's own
    // prose survives (surgical cut, not a document drop) — and the
    // decon-off control keeps the leak, proving the stage removed it
    def survivors(c: CorpusPipeline.Config) = CorpusPipeline.dedup(
      CorpusPipeline.decontaminate(
        CorpusPipeline.filterAndClean(contaminated, "doc_id", "text", "source", c),
        "doc_id", "text", "source", c),
      "doc_id", "text", c).select("doc_id", "text").as[(Long, String)].collect().toMap
    val on = survivors(cfg)
    assert(on.contains(51L) && !on(51L).contains("which of the following statements"))
    assert(on(51L).contains("original commentary"), s"host remainder must survive: ${on(51L)}")
    val off = survivors(cfg.copy(benchDocs = None))
    assert(off(51L).contains(leak),
      "control: the contaminated text must survive the decon-off pipeline")

    // byte-identical rerun with the stage on
    CorpusPipeline.run(spark, contaminated, "doc_id", "text", "source", d2, cfg)
    def rows(p: String) = spark.read.parquet(p).orderBy("bucket", "seq")
      .collect().map(_.toString).toSeq
    assert(rows(d1) == rows(d2), "decon pipeline must stay shard-deterministic")
  }

  test("sourceReport: one scan, exact buckets, totals consistent with direct counts") {
    val docs = Tables.documents(spark, sf)
    // plan check FIRST: once a report is cached, the cache manager
    // substitutes InMemoryRelation into any later identical plan
    val plan = CorpusPipeline.sourceReport(docs, "text", "source", "lang")
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"report must be one scan:\n${plan.take(800)}")
    val report = CorpusPipeline.sourceReport(docs, "text", "source", "lang").cache()
    val rows = report.collect()
    assert(rows.nonEmpty)
    // bucket partition: n_low + n_mid + n_high == n_docs, every row
    rows.foreach { r =>
      assert(r.getAs[Long]("n_low") + r.getAs[Long]("n_mid") + r.getAs[Long]("n_high") ==
        r.getAs[Long]("n_docs"), s"buckets must partition the docs: $r")
      assert(r.getAs[Double]("min_quality") <= r.getAs[Double]("max_quality"))
    }
    // grand totals match direct aggregation
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val directTokens = docs.select(F.sum(F.size(F.split(F.lower(F.trim(F.col("text"))), "\\s+"))
      .cast("long"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("total_tokens")).sum == directTokens)
    report.unpersist()
  }

  test("gopherRules gate: a rule-breaking doc is dropped in stage 1, everything else unchanged") {
    import graft.operators.QualityRules.GopherThresholds
    // passes the lang/quality gate but breaks the bullet-line rule
    val bulletDoc = Seq((31L,
      header + "\n" + (1 to 12).map(i =>
        s"• the point number $i about the state of the engine and of the data").mkString("\n"),
      "web")).toDF("doc_id", "text", "source")
    val docs = corpus.unionByName(bulletDoc)
    val t = GopherThresholds(
      minWords = 5, maxWords = 100000, minMeanWordLen = 1.0, maxMeanWordLen = 20.0,
      maxSymbolWordRatio = 1.0, maxBulletLineFrac = 0.5, maxEllipsisLineFrac = 1.0,
      minAlphaWordFrac = 0.5, minStopwords = 1,
      stopwords = Seq("the", "and", "of", "to"))
    val off = CorpusPipeline.filterAndClean(docs, "doc_id", "text", "source",
      CorpusPipeline.Config())
    val on = CorpusPipeline.filterAndClean(docs, "doc_id", "text", "source",
      CorpusPipeline.Config(gopherRules = Some(t)))
    val offIds = off.select("doc_id").collect().map(_.getLong(0)).toSet
    val onIds = on.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(offIds.contains(31L), "gate off: the bullet doc passes lang/quality")
    assert(offIds - 31L == onIds, "gate on: exactly the rule-breaking doc is gone")
  }

  test("dedup runs on CLEANED text: chrome variants still collapse as duplicates") {
    // docs identical except for their (stripped) chrome line — exact
    // dups only AFTER boilerplate removal
    // each chrome line appears in TWO docs (so it clears minDf and is
    // stripped); 31/32 share a payload but differ in chrome, so they
    // become exact dups only AFTER cleaning
    val tricky = corpus.unionByName(Seq(
      (31L, s"EXTRA CHROME A: the and of to in is that it\nthe payload shared by chrome variants about the engine state",
        "web"),
      (32L, s"EXTRA CHROME B: the and of to in is that it\nthe payload shared by chrome variants about the engine state",
        "web"),
      (33L, s"EXTRA CHROME A: the and of to in is that it\nthe unrelated first filler document about the chrome host page",
        "web"),
      (34L, s"EXTRA CHROME B: the and of to in is that it\nthe unrelated second filler document about the chrome host page",
        "web")).toDF("doc_id", "text", "source"))
    val cleaned = CorpusPipeline.filterAndClean(tricky, "doc_id", "text", "source",
      CorpusPipeline.Config())
    val survivors = CorpusPipeline.dedup(cleaned, "doc_id", "text", CorpusPipeline.Config())
      .select("doc_id").as[Long].collect().toSet
    assert(Seq(31L, 32L).count(survivors.contains) <= 1,
      s"chrome variants must collapse after cleaning: $survivors")
  }
}
