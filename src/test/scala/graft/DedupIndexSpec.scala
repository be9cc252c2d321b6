package graft

import java.nio.file.Files
import graft.operators.DedupIndex
import org.apache.spark.sql.{functions => F}

class DedupIndexSpec extends SparkSuite {

  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  private val corpusRows = Seq(
    doc(1L, "the quick brown fox jumps over the lazy dog again and again today"),
    doc(2L, "spark shuffles data between executors when keys must be colocated somewhere"),
    doc(3L, "completely different third document about corpus construction and sampling methods")
  )

  /** Batch: 11=exact dup of 1, 12=near dup of 2 (one word appended),
    * 13=novel, 14=novel, 15=near dup of 14 (internal pair).
    */
  private val batchRows = Seq(
    doc(11L, "the quick brown fox jumps over the lazy dog again and again today"),
    doc(12L, "spark shuffles data between executors when keys must be colocated somewhere else"),
    doc(13L, "a genuinely novel document that resembles nothing in the existing index"),
    doc(14L, "another fresh piece of text about benchmarking distributed query engines properly"),
    doc(15L, "another fresh piece of text about benchmarking distributed query engines properly okay")
  )

  private def freshIndex(tag: String): String = {
    val path = Files.createTempDirectory(s"graft-dedupindex-$tag-").toString
    DedupIndex.create(spark, s"dix_$tag", path,
      corpusRows.toDF("doc_id", "text"), "doc_id", "text", k = 64, bands = 16, buckets = 4)
    path
  }

  test("ingest drops exact and near dups of the corpus, keeps novel docs, dedups the batch internally") {
    val path = freshIndex("main")
    val survivors = DedupIndex.ingest(spark, "dix_main", path,
        batchRows.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(13L, 14L), s"got $survivors")
  }

  test("re-ingesting the same batch is a no-op: every doc now matches the index") {
    val path = freshIndex("idem")
    val first = DedupIndex.ingest(spark, "dix_idem", path,
      batchRows.toDF("doc_id", "text"), "doc_id", "text")
    assert(first.count() == 2)
    val again = DedupIndex.ingest(spark, "dix_idem", path,
      batchRows.toDF("doc_id", "text"), "doc_id", "text")
    assert(again.count() == 0, "idempotency: previously-appended survivors must now match")
  }

  test("ingest reliable-checkpoint path: identical survivors, only the survivors stage remains") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dix-ckpt-").toString
    val path = freshIndex("ckpt")
    val survivors = DedupIndex.ingest(spark, "dix_ckpt", path,
        batchRows.toDF("doc_id", "text"), "doc_id", "text", checkpointDir = Some(dir))
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(13L, 14L), s"got $survivors")
    // batch-sigs and new-sigs are dropped once the appends land; the
    // survivors stage backs the returned frame (caller deletes the dir)
    val stages = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(stages == Set("survivors"), s"got $stages")
    // idempotency through the durable path too
    val dir2 = java.nio.file.Files.createTempDirectory("graft-dix-ckpt2-").toString
    val again = DedupIndex.ingest(spark, "dix_ckpt", path,
      batchRows.toDF("doc_id", "text"), "doc_id", "text", checkpointDir = Some(dir2))
    assert(again.count() == 0)
    graft.operators.Staging.drop(spark, dir)
    graft.operators.Staging.drop(spark, dir2)
  }

  test("append=false is a dry run: the index does not grow") {
    val path = freshIndex("dry")
    val a = DedupIndex.ingest(spark, "dix_dry", path,
      batchRows.toDF("doc_id", "text"), "doc_id", "text", append = false)
    assert(a.count() == 2)
    val b = DedupIndex.ingest(spark, "dix_dry", path,
      batchRows.toDF("doc_id", "text"), "doc_id", "text", append = false)
    assert(b.count() == 2, "dry-run must not have appended anything")
  }

  test("meta is persisted and validated: a probe reuses the index's own k/bands") {
    val path = freshIndex("meta")
    val m = DedupIndex.readMeta(spark, path)
    assert(m == DedupIndex.Meta(64, 16, 4))
  }

  test("the corpus side of the candidate probe never shuffles (bucketed co-location)") {
    val path = freshIndex("plan")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force the SMJ path
    try {
      // the probe's candidate join, reconstructed exactly as ingest plans it
      val m = DedupIndex.readMeta(spark, path)
      val bsigs = graft.operators.Dedup.signatures(
        batchRows.toDF("doc_id", "text"), "doc_id", "text", m.k).select("id", "sig")
      val probe = bsigs.select(F.col("id").as("batch_id"),
        F.posexplode(graft.operators.Dedup.bandHashes(F.col("sig"), m.bands, m.k / m.bands))
          .as(Seq("band", "bucket")))
      val cand = spark.table("dix_plan_bands").join(probe, Seq("band", "bucket"))
      cand.collect()
      // AQE's toString appends an "== Initial Plan ==" section that
      // would double-count nodes — inspect the final plan only
      val plan = cand.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected exactly one exchange (the batch side), got $exchanges:\n${plan.take(3000)}")
      assert(plan.contains("SortMergeJoin"), plan.take(1000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("empty batch ingests as a no-op") {
    val path = freshIndex("empty")
    val s = DedupIndex.ingest(spark, "dix_empty", path,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    assert(s.count() == 0)
    assert(spark.table("dix_empty_sigs").count() == corpusRows.size)
  }

  test("duplicate index rows (crash-retry residue) fan out candidates but not results") {
    val path = freshIndex("crash")
    // simulate a crash-retry double append: every corpus sig/band row twice
    val sigs = spark.table("dix_crash_sigs")
    sigs.write.mode("append").format("parquet")
      .bucketBy(4, "id").sortBy("id").saveAsTable("dix_crash_sigs")
    val bands = spark.table("dix_crash_bands")
    bands.write.mode("append").format("parquet")
      .bucketBy(4, "band", "bucket").sortBy("band", "bucket").saveAsTable("dix_crash_bands")
    val survivors = DedupIndex.ingest(spark, "dix_crash", path,
        batchRows.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(13L, 14L), s"duplicate index rows must not change results: $survivors")
  }

  test("survivors keep the batch's full schema") {
    val path = freshIndex("schema")
    val batch = batchRows.toDF("doc_id", "text").withColumn("source", F.lit("crawl"))
    val s = DedupIndex.ingest(spark, "dix_schema", path, batch, "doc_id", "text")
    assert(s.columns.toSeq == Seq("doc_id", "text", "source"))
    assert(s.filter(F.col("source") === "crawl").count() == s.count())
  }
}
