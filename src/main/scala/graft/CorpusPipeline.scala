package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import graft.functions.text
import graft.operators.{Boilerplate, Chunking, Dedup, Mixing, Packing, QualityRules, Sampling, Spans, Staging}

/** The corpus-preparation pipeline end-to-end: what [[FxPipeline]] is
  * to the reference's FX DAGs, this is to the brief's LLM-training-data
  * surface — the individual operators (quality/lang filters, PII
  * redaction, boilerplate removal, dedup droplist, √-temperature mix,
  * sequence packing, shard export) wired in their canonical order as
  * ONE lazy plan per stage boundary, with `observe` metrics at every
  * stage so a production run reports its own funnel (docs in → kept by
  * filters → surviving dedup → selected by mix) without extra passes.
  *
  * Stage order is the standard one (filter cheap-first, dedup before
  * mix so duplicate mass cannot distort source shares, pack last):
  *
  *   0. EXTRACT  — optional markup→prose strip for web crawls
  *   1. FILTER   — optional Gopher rule gate (`gopherRules`, E16) +
  *                 language allow-list + quality floor (map-only)
  *   2. CLEAN    — PII redaction + cross-doc boilerplate line removal
  *   3a. SPANS   — optional cross-document exact-substring span
  *                 removal (Lee et al. 2022; `spanK` turns it on) —
  *                 BEFORE document dedup, so near-dup detection sees
  *                 span-cleaned text
  *   3b. DECON   — optional span-level benchmark decontamination
  *                 (`benchDocs` turns it on): every k-token window
  *                 shared with the eval corpus is cut (C14) BEFORE
  *                 dedup, so near-dup detection and the training mix
  *                 never see benchmark text
  *   3. DEDUP    — exact + MinHash-LSH droplist over the CLEANED text
  *                 (cleaning first, or chrome/PII variants defeat
  *                 exact-hash collapse)
  *   4. MIX      — √-temperature source reweighting, or budgeted
  *                 mixing with up-sampling epochs (`cfg.budgets`)
  *   5. PACK     — greedy budget packing → bucket-partitioned shards
  *   5b. CHUNK   — optional retrieval fork (`chunkTokens` turns it
  *                 on): the DEDUPED survivors also chunk into
  *                 fixed-budget overlapping windows → parquet beside
  *                 the shards — the embedding-index input, built from
  *                 the same cleaned corpus as the training shards
  *
  * Every stage is deterministic (hash-law sampling, anchored-greedy
  * packing), so re-running the pipeline on the same input byte-for-byte
  * reproduces the shards — the property that makes a 100 TB corpus
  * build debuggable at all.
  */
object CorpusPipeline {

  final case class Config(
      stripMarkup: Boolean = false,
      langs: Seq[String] = Seq("en"),
      minQuality: Double = 0.3,
      boilerplateMinDf: Int = 2,
      dedupThreshold: Double = 0.5,
      mixNumer: Int = 1, mixDenom: Int = 2,
      packBudget: Long = 2048L, packBuckets: Int = 32,
      maxSeqsPerShard: Int = 1024,
      budgets: Option[Map[String, Long]] = None, maxEpochs: Int = 100,
      spanK: Option[Int] = None, spanMinDf: Int = 2,
      chunkTokens: Option[Int] = None, chunkOverlap: Int = 0,
      gopherRules: Option[QualityRules.GopherThresholds] = None,
      benchDocs: Option[DataFrame] = None, benchK: Int = 8,
      stagingDir: Option[String] = None)

  /** Stages 1–2: language/quality gate, then redaction + boilerplate
    * removal. Returns (idCol, sourceCol, clean text under textCol).
    *
    * The gate (langGuess + qualityScore + redact — three regex-heavy
    * passes over full text, the pipeline's most expensive map stage)
    * is STAGED so it evaluates exactly once: boilerplate removal
    * references its input several times (df/droplist/rebuild
    * subtrees), and an unstaged plan would re-run the regexes per
    * reference — and double-fire the `corpus_filtered` observe
    * metric. `cfg.stagingDir` picks the durability ([[Staging]]:
    * None = localCheckpoint, Some(dir) = durable parquet — the
    * cluster setting). `sourceCol` rides through the boilerplate pass
    * as a payload column instead of a join-back against the gate.
    */
  def filterAndClean(docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
                     cfg: Config): DataFrame = {
    // stage 0 (web crawls): markup → prose BEFORE any signal runs, so
    // language/quality score the text a reader sees, not tag soup, and
    // dedup keys can't diverge on markup-only differences. Part of the
    // same staged map pass — no extra scan.
    val extracted =
      if (cfg.stripMarkup)
        docs.withColumn(textCol, text.stripMarkup(F.col(textCol)))
      else docs
    // optional published rule gate (E16): the Gopher rules run in the
    // SAME map pass as the language/quality gate — rule-based filters
    // go first in every published pipeline (cheap, deterministic,
    // catches the obviously-broken pages the statistical signals
    // would mis-score). Applied to the extracted (pre-redaction)
    // text, which is what the published thresholds are calibrated on.
    val ruleGate = cfg.gopherRules
      .map(t => QualityRules.gopherPass(F.col(textCol), t))
      .getOrElse(F.lit(true))
    val gated = extracted
      .observe("corpus_in", F.count(F.lit(1)).as("docs_in"))
      .filter(ruleGate &&
        text.langGuess(F.col(textCol)).isin(cfg.langs: _*) &&
        text.qualityScore(F.col(textCol)) >= cfg.minQuality)
      .select(F.col(idCol), F.col(sourceCol), text.redact(F.col(textCol)).as(textCol))
      .observe("corpus_filtered", F.count(F.lit(1)).as("docs_kept"))
    val staged = Staging.stage(gated, cfg.stagingDir, "gated")
    Boilerplate.dropBoilerplateLines(staged, idCol, textCol, cfg.boilerplateMinDf,
        payloadCols = Seq(sourceCol))
      .select(F.col(idCol), F.col(sourceCol), F.col("clean_text").as(textCol))
  }

  /** Stage 3a (optional — `cfg.spanK`): cross-document duplicated
    * SPAN removal over the cleaned text, the C12 operator in its
    * pipeline slot. The input is staged first: the span operator
    * references its input from both the window-hash and the rebuild
    * subtrees, and upstream holds the regex gate that must not
    * re-run. Provenance (`sourceCol`) joins back on the id (the span
    * output carries only id + rebuilt text).
    */
  def dropSpans(cleaned: DataFrame, idCol: String, textCol: String, sourceCol: String,
                cfg: Config): DataFrame =
    cfg.spanK match {
      case None => cleaned
      case Some(k) =>
        val staged = Staging.stage(cleaned, cfg.stagingDir, "pre-spans")
        Spans.dropDuplicateSpans(staged, idCol, textCol, k, cfg.spanMinDf)
          .join(staged.select(F.col(idCol), F.col(sourceCol)), Seq(idCol))
          .select(F.col(idCol), F.col(sourceCol), F.col("clean_text").as(textCol))
          .observe("corpus_spans", F.count(F.lit(1)).as("docs_span_cleaned"))
    }

  /** Stage 3b (optional — `cfg.benchDocs`): span-level benchmark
    * decontamination, the C14 operator in its pipeline slot — every
    * published pretraining pipeline removes benchmark n-gram overlap
    * before the corpus reaches the training mix. The bench frame must
    * carry `textCol`; its window set is eval-suite-sized and
    * broadcasts (the operator's default). Runs BEFORE dedup so
    * near-dup detection scores the decontaminated text. The input is
    * staged for the same two-subtree reason as [[dropSpans]].
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
                    cfg: Config): DataFrame =
    cfg.benchDocs match {
      case None => docs
      case Some(bench) =>
        val staged = Staging.stage(docs, cfg.stagingDir, "pre-decon")
        Spans.decontaminateSpans(staged, bench, idCol, textCol, cfg.benchK)
          .join(staged.select(F.col(idCol), F.col(sourceCol)), Seq(idCol))
          .select(F.col(idCol), F.col(sourceCol), F.col("clean_text").as(textCol))
          .observe("corpus_decontaminated", F.count(F.lit(1)).as("docs_decontaminated"))
    }

  /** Stage 5b (optional — `cfg.chunkTokens`): the retrieval fork.
    * Chunks the deduped survivors (what an embedding index should
    * hold: every surviving document, NOT the mix — source reweighting
    * is a training-share concern) into fixed-budget overlapping
    * windows and writes them as parquet. Map-only over rows already
    * in hand; determinism inherits from the chunk contract.
    */
  def chunkFork(survivors: DataFrame, idCol: String, textCol: String, sourceCol: String,
                chunkPath: String, cfg: Config): Unit =
    cfg.chunkTokens.foreach { ct =>
      Chunking.chunkByTokens(survivors, idCol, textCol, ct, cfg.chunkOverlap,
          payloadCols = Seq(sourceCol))
        .write.mode("overwrite").parquet(chunkPath)
    }

  /** Corpus health report — the first query a data engineer runs
    * against a new crawl, as one scan: per (source, lang) doc counts,
    * token/char volume, and a quality histogram (the E1 score bucketed
    * at `lowCut`/`highCut`). Every measure is exact and order-free
    * (integer sums, counts, double min/max — no double SUM, whose
    * accumulation order would make the report nondeterministic across
    * runs and engines), so the report itself hash-replays. Scale
    * shape: ONE scan, one keyed aggregate with map-side partials;
    * output is |sources × langs| rows — bounded. At 100 TB this is
    * the cheapest look at the corpus that still decides the
    * [[Config]] knobs (langs allow-list, minQuality, mix shares).
    */
  def sourceReport(docs: DataFrame, textCol: String, sourceCol: String, langCol: String,
                   lowCut: Double = 0.3, highCut: Double = 0.7): DataFrame = {
    require(lowCut <= highCut, s"lowCut $lowCut must be <= highCut $highCut")
    val t = F.col(textCol)
    val q = F.col("__q")
    docs
      .select(F.col(sourceCol), F.col(langCol),
        text.tokenCount(t).as("__tok"), F.length(t).as("__chars"),
        text.qualityScore(t).as("__q"))
      .groupBy(sourceCol, langCol)
      .agg(
        F.count(F.lit(1)).as("n_docs"),
        F.sum(F.col("__tok").cast("long")).as("total_tokens"),
        F.sum(F.col("__chars").cast("long")).as("total_chars"),
        F.min(q).as("min_quality"),
        F.max(q).as("max_quality"),
        F.sum(F.when(q < lowCut, 1L).otherwise(0L)).as("n_low"),
        F.sum(F.when(q >= lowCut && q < highCut, 1L).otherwise(0L)).as("n_mid"),
        F.sum(F.when(q >= highCut, 1L).otherwise(0L)).as("n_high"))
  }

  /** Stage 3: drop exact + near duplicates of the cleaned text (one
    * row per survivor; the drop list itself is available separately
    * via [[Dedup.textDropList]] for audit).
    */
  def dedup(cleaned: DataFrame, idCol: String, textCol: String, cfg: Config): DataFrame = {
    val drops = Dedup.textDropList(cleaned, idCol, textCol, cfg.dedupThreshold)
      .select(F.col("drop_id").as(idCol))
    cleaned.join(drops, Seq(idCol), "left_anti")
      .observe("corpus_deduped", F.count(F.lit(1)).as("docs_surviving"))
  }

  /** Stages 4–5: mix, pack, export. Writes shards to `shardPath` and
    * returns the mixed frame (pre-packing) for inspection.
    *
    * `cfg.budgets` switches stage 4 from √-temperature DOWN-sampling
    * (S4) to budgeted mixing with UP-sampling epochs (S13,
    * [[Mixing.mixToBudget]] on character cost): replica instances
    * pack as DISTINCT units under an `id#epoch` pack key, so a
    * 3-epoch source's copies spread across sequences/shards instead
    * of collapsing into one pack row — the shards' `doc_ids`
    * provenance then names the replica instance. Both routes stay
    * fully deterministic (byte-identical reruns, spec-pinned).
    */
  def mixAndPack(deduped: DataFrame, idCol: String, textCol: String, sourceCol: String,
                 shardPath: String, cfg: Config): DataFrame = cfg.budgets match {
    case None =>
      val mixed = Mixing.temperatureMixBySqrt(deduped, idCol, sourceCol, cfg.mixNumer, cfg.mixDenom)
        .withColumn("__cost", F.length(F.col(textCol)).cast("long"))
        .observe("corpus_mixed", F.count(F.lit(1)).as("docs_selected"))
      Packing.exportSequences(mixed, idCol, textCol, "__cost",
        cfg.packBudget, cfg.packBuckets, shardPath, cfg.maxSeqsPerShard)
      mixed.drop("__cost")
    case Some(budgets) =>
      val sized = deduped.withColumn("__cost", F.length(F.col(textCol)).cast("long"))
      // replica instances pack under the injective composite key
      // id·(maxEpochs+1) + epoch (epoch < maxEpochs+1 ⇒ unique; the
      // shards' doc_ids provenance decodes as id = key div (maxEpochs
      // +1), epoch = key mod (maxEpochs+1))
      val k = cfg.maxEpochs + 1
      val mixed = Mixing.mixToBudget(sized, idCol, sourceCol, "__cost",
          budgets, cfg.maxEpochs)
        .withColumn("__mix_id",
          F.col(idCol).cast("long") * k + F.col("epoch").cast("long"))
        .observe("corpus_mixed", F.count(F.lit(1)).as("docs_selected"))
      Packing.exportSequences(mixed, "__mix_id", textCol, "__cost",
        cfg.packBudget, cfg.packBuckets, shardPath, cfg.maxSeqsPerShard)
      mixed.drop("__cost", "__mix_id")
  }

  /** The whole pipeline: docs(id, text, source) → shards at
    * `shardPath`; returns the surviving mixed docs.
    */
  def run(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
          sourceCol: String, shardPath: String, cfg: Config = Config()): DataFrame = {
    val cleaned = filterAndClean(docs, idCol, textCol, sourceCol, cfg)
    val spanned = dropSpans(cleaned, idCol, textCol, sourceCol, cfg)
    val deconned = decontaminate(spanned, idCol, textCol, sourceCol, cfg)
    val deduped = dedup(deconned, idCol, textCol, cfg)
    // with the chunk fork on, the survivors feed TWO sinks (shards +
    // chunks); stage them so the dedup subtree runs once and the
    // corpus_deduped observe cannot double-fire
    val survivors =
      if (cfg.chunkTokens.isDefined) Staging.stage(deduped, cfg.stagingDir, "survivors")
      else deduped
    chunkFork(survivors, idCol, textCol, sourceCol, s"$shardPath-chunks", cfg)
    mixAndPack(survivors, idCol, textCol, sourceCol, shardPath, cfg)
  }
}
