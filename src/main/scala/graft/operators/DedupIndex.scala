package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import graft.functions.native
import graft.sources.Layout

/** Persisted incremental dedup index: dedup a daily batch against a
  * 100 TB corpus WITHOUT rescanning the corpus.
  *
  * One-shot dedup APIs ([[Dedup]]) re-sketch the whole corpus per run
  * — the right shape for a backfill, the wrong one for the steady
  * state, where a crawl delivers batches into an ever-growing corpus
  * (the same O(batch)-vs-O(table) contract [[graft.FxPipeline]]
  * establishes for the reference's ingest, applied to dedup;
  * idempotent_fx_pipeline.py:75-92 is the check-then-append analog).
  *
  * The index is two bucketed tables ([[Layout.writeBucketed]] — the
  * A13 co-location machinery):
  *   - `<name>_sigs`  (id, sig),          bucketed by id
  *   - `<name>_bands` (id, band, bucket), bucketed by (band, bucket)
  *
  * `ingest` probes with the batch's banded signatures: both the
  * candidate join (on (band, bucket)) and the verify join (on id) hit
  * a table bucketed on exactly that key, so THE CORPUS SIDE NEVER
  * SHUFFLES — the only exchange is the batch's own (spec-asserted).
  * Survivors' signatures append as new bucket files (O(batch) write,
  * no table rewrite). Cost per batch: O(batch · bands) probe rows +
  * O(candidates) verify — independent of corpus size.
  *
  * Drop policy is verified-pair greedy, same as the one-shot APIs: a
  * batch doc drops if (est-Jaccard ≥ threshold) against any indexed
  * doc, else against any surviving smaller-id batch doc. Near-dup is
  * not transitive — a batch doc whose only near-dup link was itself
  * dropped survives; run [[Dedup.connectedComponents]] offline when
  * transitive semantics are required. Re-ingesting a batch drops every
  * doc (signature self-match = 1.0), making ingest idempotent.
  *
  * Contract: ids must be unique corpus-wide (they are the index key);
  * the index stores ids and signatures only — corpus payloads live in
  * the caller's table layout.
  *
  * Concurrency/crash semantics: ingest is SINGLE-WRITER — two
  * concurrent ingests each probe the pre-append index and can both
  * admit the same near-dup (the check-then-append race the reference's
  * idempotent DAG also serializes; run ingests from one scheduler
  * slot, as [[Layout.compactDays]] documents for compaction vs
  * ingest). A crash between the sig and band appends leaves the tail
  * batch's docs invisible to candidate probes, so re-ingesting that
  * batch re-admits them and appends again. RESULTS stay correct —
  * duplicate index rows only fan out candidate pairs, and the
  * `distinct()` on candidates plus the drop-set `distinct()` absorb
  * the fan-out — but the index accrues redundant rows bounded by the
  * crashed batch (rebuild with `create` to reclaim).
  */
object DedupIndex {

  final case class Meta(k: Int, bands: Int, buckets: Int)

  private def sigTable(name: String) = s"${name}_sigs"
  private def bandTable(name: String) = s"${name}_bands"
  private def metaPath(path: String) = new org.apache.hadoop.fs.Path(path, "_graft_index_meta.json")

  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(s"""{"k":${m.k},"bands":${m.bands},"buckets":${m.buckets}}""".getBytes("UTF-8"))
    out.close()
  }

  /** Index parameters are part of the physical contract (a probe built
    * with different k/bands would silently miss every candidate) — so
    * they are persisted at create and re-read, never trusted to the
    * caller's memory.
    */
  def readMeta(spark: SparkSession, path: String): Meta = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(n: String): Int =
      s""""$n":(\\d+)""".r.findFirstMatchIn(text)
        .getOrElse(throw new IllegalStateException(s"corrupt index meta at $p: $text"))
        .group(1).toInt
    Meta(field("k"), field("bands"), field("buckets"))
  }

  private def bandedOf(sigs: DataFrame, m: Meta): DataFrame =
    sigs.select(F.col("id"),
      F.posexplode(Dedup.bandHashes(F.col("sig"), m.bands, m.k / m.bands)).as(Seq("band", "bucket")))

  /** Build the index over an existing corpus. `buckets` is the
    * physical parallelism of every future probe — size it so one
    * bucket of signatures fits an executor core (ids+sigs only, ~0.5 KB
    * per doc at k=64).
    */
  def create(spark: SparkSession, name: String, path: String,
             corpus: DataFrame, idCol: String, textCol: String,
             k: Int = 64, bands: Int = 16, buckets: Int = 32): Unit = {
    require(k % bands == 0, s"k=$k must be a multiple of bands=$bands")
    val m = Meta(k, bands, buckets)
    val sigs = Dedup.signatures(corpus, idCol, textCol, k).select("id", "sig")
    Layout.writeBucketed(sigs, sigTable(name), s"$path/sigs", buckets, Seq("id"))
    Layout.writeBucketed(bandedOf(spark.table(sigTable(name)), m),
      bandTable(name), s"$path/bands", buckets, Seq("band", "bucket"))
    writeMeta(spark, path, m)
  }

  /** Dedup `batch` against the index (then against itself), append the
    * survivors' signatures, and return the surviving batch rows with
    * their original schema. Set `append = false` for a dry-run check.
    *
    * `checkpointDir`: staging durability for the materialized batch
    * signatures and survivor set ([[Staging]] — `None` =
    * `localCheckpoint`, executor-block-backed, the local[n] default;
    * `Some(dir)` = durable parquet stages, the cluster setting: an
    * executor loss mid-ingest recomputes from files instead of killing
    * the job on truncated lineage). The returned frame reads from the
    * last stage — delete `dir` only after consuming it.
    */
  def ingest(spark: SparkSession, name: String, path: String,
             batch: DataFrame, idCol: String, textCol: String,
             threshold: Double = 0.5, append: Boolean = true,
             checkpointDir: Option[String] = None): DataFrame = {
    val m = readMeta(spark, path)
    // the batch is bounded (that is the point of incremental ingest) —
    // materialize its signatures once instead of re-sketching per use
    // (probe, verify, internal pairs, append); same pattern as
    // FxPipeline's batch staging
    val bsigs = Staging.stage(
      Dedup.signatures(batch, idCol, textCol, m.k).select("id", "sig"), checkpointDir, "batch-sigs")
    val probe = bandedOf(bsigs, m).select(
      F.col("id").as("batch_id"), F.col("band"), F.col("bucket"))
    val candidates = spark.table(bandTable(name))
      .join(probe, Seq("band", "bucket"))
      .select(F.col("batch_id"), F.col("id").as("corpus_id")).distinct()
    val dropVsCorpus = candidates
      .join(spark.table(sigTable(name)).select(F.col("id").as("corpus_id"), F.col("sig").as("c_sig")),
        "corpus_id")
      .join(bsigs.select(F.col("id").as("batch_id"), F.col("sig").as("b_sig")), "batch_id")
      .filter(native.sig_match_fraction(F.col("b_sig"), F.col("c_sig")) >= threshold)
      .select("batch_id").distinct()
    val afterCorpus = batch.join(dropVsCorpus,
      batch(idCol) === dropVsCorpus("batch_id"), "left_anti")
    // internal (batch-vs-batch) pairs from the ALREADY-STAGED batch
    // signatures, filtered to the corpus survivors — a signature is a
    // pure function of the text, so this equals re-sketching
    // afterCorpus while skipping one tokenize→shingle→minhash pass per
    // batch (r16: guide §1.2, don't recompute what you hold)
    val afterCorpusSigs = bsigs.join(dropVsCorpus,
      bsigs("id") === dropVsCorpus("batch_id"), "left_anti")
    val internalDrops = Dedup.minhashPairsFromSignatures(
        afterCorpusSigs, m.bands, m.k / m.bands, threshold)
      .select(F.col("id_b").as("__drop")).distinct()
    // MATERIALIZE before appending: the returned frame must reflect
    // the pre-append index state — lazily evaluated after the append,
    // the dedup would re-run against the grown index and every
    // survivor would match its own just-appended signature (an empty
    // result). Staged like the batch signatures.
    val survivors = Staging.stage(
      afterCorpus.join(internalDrops,
        afterCorpus(idCol) === internalDrops("__drop"), "left_anti"),
      checkpointDir, "survivors")
    // the survivors stage is durable; the batch-sigs stage still feeds
    // the append path's newSigs semi-join, so it is dropped only once
    // nothing reads it (end of the append branch / right here on a
    // dry run)
    if (!append) checkpointDir.foreach(d => Staging.drop(spark, s"$d/batch-sigs"))
    if (append) {
      // survivors' signatures = the staged batch signatures semi-joined
      // to the survivor ids (same purity argument as afterCorpusSigs) —
      // the third re-sketch pass of the old shape, gone
      val newSigs = Staging.stage(
        bsigs.join(survivors.select(F.col(idCol).as("__sid")),
            bsigs("id") === F.col("__sid"), "left_semi")
          .select("id", "sig"),
        checkpointDir, "new-sigs")
      newSigs.write.mode("append").format("parquet")
        .bucketBy(m.buckets, "id").sortBy("id").saveAsTable(sigTable(name))
      bandedOf(newSigs, m).write.mode("append").format("parquet")
        .bucketBy(m.buckets, "band", "bucket").sortBy("band", "bucket").saveAsTable(bandTable(name))
      // both appends are complete: the sig stage is garbage (the
      // survivors stage still backs the returned frame — caller-owned)
      checkpointDir.foreach { d =>
        Staging.drop(spark, s"$d/new-sigs"); Staging.drop(spark, s"$d/batch-sigs")
      }
    }
    survivors
  }
}
