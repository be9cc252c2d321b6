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
