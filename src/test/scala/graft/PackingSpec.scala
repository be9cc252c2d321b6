package graft

import graft.operators.{Packing, Sampling}
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

class PackingSpec extends SparkSuite {

  import spark.implicits._

  private val budget = 1000L
  private val buckets = 8

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val packed =
    Packing.packGreedy(docs, "doc_id", "n_chars", budget, buckets).cache()

  test("every eligible doc is packed exactly once") {
    val eligible = docs.filter(F.col("doc_id").isNotNull && F.col("n_chars") > 0).count()
    assert(packed.count() == eligible)
    assert(packed.select("doc_id").distinct().count() == eligible)
  }

  test("no sequence exceeds the budget unless it is a single oversized doc") {
    val seqs = packed.join(docs.select("doc_id", "n_chars"), "doc_id")
      .groupBy("bucket", "seq")
      .agg(F.sum("n_chars").as("total"), F.count(F.lit(1)).as("n"))
      .collect()
    for (r <- seqs) {
      val (total, n) = (r.getLong(2), r.getLong(3))
      assert(total <= budget || n == 1, s"bucket ${r.getLong(0)} seq ${r.getLong(1)}: $total in $n docs")
    }
  }

  test("greedy is tight: consecutive sequences cannot merge") {
    // for every non-final sequence in a bucket: its fill plus the
    // FIRST doc of the next sequence must exceed the budget — else
    // greedy would not have split there
    val withCost = packed.join(docs.select("doc_id", "n_chars"), "doc_id")
    val fills = withCost.groupBy("bucket", "seq").agg(F.sum("n_chars").as("fill"))
    val heads = withCost.filter(F.col("slot") === 1)
      .select(F.col("bucket"), F.col("seq"), F.col("n_chars").as("head_cost"))
    val joined = fills.join(heads.withColumn("seq", F.col("seq") - 1), Seq("bucket", "seq"))
      .collect()
    assert(joined.nonEmpty)
    for (r <- joined)
      assert(r.getLong(2) + r.getLong(3) > budget,
        s"bucket ${r.getLong(0)} seq ${r.getLong(1)}: ${r.getLong(2)}+${r.getLong(3)} <= $budget")
  }

  test("seq is dense from 0 and slot is dense from 1 in sorted order") {
    val bySeq = packed.groupBy("bucket").agg(
      F.min("seq").as("mn"), F.max("seq").as("mx"),
      F.count_distinct(F.col("seq")).as("n")).collect()
    for (r <- bySeq) {
      assert(r.getLong(1) == 0, s"bucket ${r.getLong(0)}: first seq ${r.getLong(1)}")
      assert(r.getLong(3) == r.getLong(2) + 1, s"bucket ${r.getLong(0)}: seqs not dense")
    }
    val bySlot = packed.groupBy("bucket", "seq").agg(
      F.min("slot").as("mn"), F.max("slot").as("mx"), F.count(F.lit(1)).as("n")).collect()
    for (r <- bySlot)
      assert(r.getLong(2) == 1 && r.getLong(3) == r.getLong(4),
        s"bucket ${r.getLong(0)} seq ${r.getLong(1)}: slots not dense")
  }

  test("assignment matches a driver-side replay of the greedy law") {
    val input = docs.filter(F.col("n_chars") > 0)
      .select(F.col("doc_id"), F.col("n_chars"),
        Sampling.hash52(F.col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = input
      .groupBy { case (id, _, h) => ((h % buckets) + buckets) % buckets }
      .flatMap { case (bucket, ds) =>
        var seq = 0L; var fill = 0L; var slot = 0L
        ds.toList.sortBy { case (id, _, h) => (h, id) }.map { case (id, cost, _) =>
          if (fill > 0 && fill + cost > budget) { seq += 1; fill = 0; slot = 0 }
          fill += cost; slot += 1
          (id, bucket, seq, slot)
        }
      }.toSet
    val got = packed.select("doc_id", "bucket", "seq", "slot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("an oversized doc is isolated in its own sequence") {
    val data = Seq((1L, 300L), (2L, 5000L), (3L, 400L), (4L, 200L), (5L, 900L))
      .toDF("doc_id", "n_chars")
    val p = Packing.packGreedy(data, "doc_id", "n_chars", budget, buckets = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val oversizedSeq = p(2L)._1
    assert(p.count { case (_, (s, _)) => s == oversizedSeq } == 1,
      s"oversized doc must sit alone: $p")
  }

  test("exportSequences writes slot-ordered shards bounded by maxSeqsPerFile") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pack-export-").toString
    Packing.exportSequences(docs, "doc_id", "text", "n_chars", budget, buckets,
      dir, maxSeqsPerFile = 5, sep = 1.toChar.toString)
    val shards = spark.read.parquet(dir)
    // every sequence from the assignment is exported, docs conserved
    val nSeqs = packed.select("bucket", "seq").distinct().count()
    assert(shards.count() == nSeqs)
    val eligible = docs.filter(F.col("n_chars") > 0).count()
    assert(shards.agg(F.sum("n_docs")).head().getLong(0) == eligible)
    // text is the members joined in slot order
    val wantText = packed.join(docs.select("doc_id", "text"), "doc_id")
      .groupBy("bucket", "seq")
      .agg(F.concat_ws(1.toChar.toString,
        F.transform(F.array_sort(F.collect_list(F.struct(F.col("slot"), F.col("text")))),
          x => x.getField("text"))).as("want"))
    val joined = shards.join(wantText, Seq("bucket", "seq"))
    assert(joined.filter(F.col("text") =!= F.col("want")).count() == 0)
    assert(joined.count() == nSeqs)
    // total_cost equals the sequence fill
    val wantCost = packed.join(docs.select("doc_id", "n_chars"), "doc_id")
      .groupBy("bucket", "seq").agg(F.sum("n_chars").as("want_cost"))
    assert(shards.join(wantCost, Seq("bucket", "seq"))
      .filter(F.col("total_cost") =!= F.col("want_cost")).count() == 0)
    // shard-size bound: no parquet file holds more than maxSeqsPerFile rows
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    for (f <- files)
      assert(spark.read.parquet(f.getAbsolutePath).count() <= 5,
        s"${f.getName} exceeds maxSeqsPerFile")
  }

  test("doc boundaries: every doc's span in the packed text is recoverable from doc_starts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pack-bounds-").toString
    val sep = "\n\n"
    Packing.exportSequences(docs, "doc_id", "text", "n_chars", budget, buckets, dir, sep = sep)
    val byId = docs.filter(F.col("n_chars") > 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = spark.read.parquet(dir)
      .select("text", "doc_ids", "doc_starts", "n_docs").collect()
    assert(rows.nonEmpty)
    var checked = 0
    for (r <- rows) {
      val text = r.getString(0)
      val ids = r.getSeq[Long](1)
      val starts = r.getSeq[Long](2)
      assert(ids.length == r.getLong(3) && starts.length == ids.length)
      for ((id, start) <- ids.zip(starts)) {
        val doc = byId(id)
        assert(text.substring(start.toInt, start.toInt + doc.length) == doc,
          s"doc $id span mismatch at offset $start")
        checked += 1
      }
    }
    assert(checked == byId.size, "every doc's boundary checked exactly once")
  }

  test("null ids and non-positive costs are excluded") {
    val data = Seq((Option(1L), Option(300L)), (Option.empty[Long], Option(10L)),
        (Option(3L), Option(0L)), (Option(4L), Option.empty[Long]))
      .toDF("doc_id", "n_chars")
    val p = Packing.packGreedy(data, "doc_id", "n_chars", budget, buckets = 2)
    assert(p.select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("shuffleOrder: deterministic seeded permutation into balanced shards") {
    val docs = (0L until 2000L).toDF("doc_id")
    val a = Packing.shuffleOrder(docs, "doc_id", seed = 7L, nShards = 8)
      .orderBy("shard", "pos").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Packing.shuffleOrder(docs, "doc_id", seed = 7L, nShards = 8)
      .orderBy("shard", "pos").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq, "same seed must reproduce the permutation bit-for-bit")
    // every doc exactly once; pos dense 1..size within each shard
    assert(a.map(_._1).toSet.size == 2000)
    for ((_, rows) <- a.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    // balanced: no shard further than 30% from the mean
    val sizes = a.groupBy(_._2).values.map(_.length).toSeq
    assert(sizes.size == 8 && sizes.max < 250 * 1.3 && sizes.min > 250 * 0.7,
      s"unbalanced shards: $sizes")
    // a different seed re-deals the order
    val c = Packing.shuffleOrder(docs, "doc_id", seed = 8L, nShards = 8)
      .orderBy("shard", "pos").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(c.toSeq != a.toSeq)
    // decorrelation: consecutive input ids rarely share a shard
    val shardOf = a.map(r => r._1 -> r._2).toMap
    val adjacentSame = (0L until 1999L).count(i => shardOf(i) == shardOf(i + 1))
    assert(adjacentSame < 2000 * 0.25, s"$adjacentSame adjacent pairs share a shard")
  }
}
