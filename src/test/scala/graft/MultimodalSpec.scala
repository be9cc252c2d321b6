package graft

import graft.multimodal.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSuite {

  test("payload plumbing: byte_len equals text length, features deterministic") {
    val docs = Tables.documents(spark, sf)
    val withBin = Multimodal.withPayload(docs)
    val feats = Multimodal.decodeFeatures(spark, withBin)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3)))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feats.keySet == texts.keySet)
    texts.foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val (len, head, sum) = feats(id)
      assert(len == bytes.length.toLong, s"doc $id")
      assert(head == (bytes.head & 0xff))
      var s = 0L; bytes.foreach(b => s = s * 31 + (b & 0xff))
      assert(sum == s)
    }
  }

  test("resize stub emits bounded thumbnails; frame sampling strides deterministically") {
    val docs = Tables.documents(spark, sf)
    val withBin = Multimodal.withPayload(docs)
    val resized = Multimodal.resizeStub(withBin, targetBytes = 64)
    assert(resized.agg(org.apache.spark.sql.functions.max("thumb_len")).head().getInt(0) <= 64)
    assert(resized.count() == docs.count())

    val frames = Multimodal.frameSampleStub(withBin, frameBytes = 32, stride = 4)
    val one = frames.filter(org.apache.spark.sql.functions.col("doc_id") === 0L)
      .orderBy("frame_idx").collect()
    assert(one.nonEmpty)
    assert(one.map(_.getInt(1)).forall(_ % 4 == 0), "only every 4th frame kept")
    val text0 = docs.filter(org.apache.spark.sql.functions.col("doc_id") === 0L)
      .head().getString(1)
    assert(one.head.getAs[Array[Byte]](2).sameElements(text0.getBytes("UTF-8").take(32)))

    // thumbnail content is the exact strided-byte formula
    val bytes0 = text0.getBytes("UTF-8")
    val m = math.min(64, bytes0.length)
    val wantThumb = Array.tabulate(m)(i => bytes0((i.toLong * bytes0.length / m).toInt))
    val gotThumb = resized.filter(org.apache.spark.sql.functions.col("doc_id") === 0L)
      .head().getAs[Array[Byte]]("thumb")
    assert(gotThumb.sameElements(wantThumb))
  }

  test("frame slicing reassembles to the original payload at stride 1") {
    val docs = Tables.documents(spark, sf).limit(20)
    val withBin = Multimodal.withPayload(docs)
    val frames = Multimodal.frameSampleStub(withBin, frameBytes = 32, stride = 1)
      .orderBy("doc_id", "frame_idx").collect()
    val byDoc = frames.groupBy(_.getLong(0))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, fs) <- byDoc) {
      val reassembled = fs.sortBy(_.getInt(1)).flatMap(_.getAs[Array[Byte]](2))
      assert(reassembled.sameElements(texts(id).getBytes("UTF-8")), s"doc $id")
    }
  }

  /** Independent driver-side aHash: strided sample → floor-mean →
    * threshold bits → little-endian pack, restated from the contract.
    */
  private def refAHash(payload: Array[Byte], thumbBytes: Int): Option[Long] = {
    if (payload.isEmpty) return None
    val m = math.min(thumbBytes, payload.length)
    val thumb = Array.tabulate(m)(i => payload((i.toLong * payload.length / m).toInt) & 0xff)
    val mean = thumb.map(_.toLong).sum / m
    Some(thumb.zipWithIndex.map { case (b, j) => if (b > mean) 1L << j else 0L }.sum)
  }

  test("average hash matches an independent driver-side reference; empty payloads NULL") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(80)
    val withBin = Multimodal.withPayload(docs)
    val got = Multimodal.averageHash(withBin)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, t) =>
      assert(got(id) == refAHash(t.getBytes("UTF-8"), 60), s"doc $id")
    }
    // crafted payloads: empty -> NULL, constant bytes -> all-zero hash
    // (nothing strictly above the mean)
    val crafted = Seq(
      (1L, Array.emptyByteArray),
      (2L, Array.fill[Byte](100)(42)),
      (3L, Array.tabulate[Byte](100)(i => i.toByte))).toDF("doc_id", "payload")
    val ch = Multimodal.averageHash(crafted)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(ch(1L).isEmpty)
    assert(ch(2L).contains(0L))
    assert(ch(3L) == refAHash(Array.tabulate[Byte](100)(i => i.toByte), 60))
  }

  test("perceptual pairs: exact payload dups at hamming 0, small perturbations found, banding bound holds") {
    import spark.implicits._
    val base = Array.tabulate[Byte](60)(i => if (i % 2 == 0) 10 else 120)
    // flip 2 thumbnail cells across the mean: hamming 2 from base
    val near = base.clone(); near(4) = 121; near(7) = 9
    // scramble half the cells: far from base
    val far = Array.tabulate[Byte](60)(i => if (i % 4 < 2) 10 else 120)
    val df = Seq((1L, base), (2L, base.clone()), (3L, near), (4L, far))
      .toDF("doc_id", "payload")
    val hashed = Multimodal.averageHash(df)
    val pairs = Multimodal.perceptualPairs(hashed, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 0L, "identical payloads must pair at hamming 0")
    assert(pairs((1L, 3L)) == 2L, "2-cell perturbation must pair at hamming 2")
    assert(!pairs.contains((1L, 4L)), "scrambled payload must not pair")
    // pigeonhole: every pair within 3 bits shares a band, so the
    // banded join CANNOT miss them — verified against brute force
    val all = hashed.collect().map(r => r.getLong(0) -> r.getLong(1))
    val want = (for {
      (ia, ha) <- all; (ib, hb) <- all if ia < ib
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (ia, ib) -> h.toLong).toMap
    want.foreach { case (k, h) => assert(pairs.get(k).contains(h), s"missed pair $k") }
  }

  test("perceptual pairs on the real corpus decorated with replicas; determinism holds") {
    import org.apache.spark.sql.{functions => F}
    val docs = Tables.documents(spark, sf)
    // re-keyed replicas of every 50th doc: identical payloads pair at
    // hamming 0 (the corpus itself has no exact text duplicates)
    val decorated = docs.unionByName(
      docs.filter(F.col("doc_id") % 50 === 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000L))
    val withBin = Multimodal.withPayload(decorated)
    val hashed = Multimodal.averageHash(withBin)
    val pairs = Multimodal.perceptualPairs(hashed, maxHamming = 4)
    val zero = pairs.filter(F.col("hamming") === 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    docs.filter(F.col("doc_id") % 50 === 0).select("doc_id").collect().map(_.getLong(0))
      .foreach(id => assert(zero.contains((id, id + 1000000L)), s"replica pair for $id"))
    val a = pairs.collect().map(_.toString).sorted.toSeq
    val b = Multimodal.perceptualPairs(
      Multimodal.averageHash(withBin.repartition(7)), maxHamming = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("a custom codec factory flows through decodeFeatures (contract is swappable)") {
    val docs = Tables.documents(spark, sf).limit(10)
    val out = Multimodal.decodeFeatures(spark, Multimodal.withPayload(docs),
        () => new Multimodal.PayloadCodec {
          def decode(payload: Array[Byte]): (Long, Int, Long) = (7L, 7, 7L)
        })
      .collect()
    assert(out.length == 10 && out.forall(r => r.getLong(1) == 7L && r.getInt(2) == 7))
  }
}
