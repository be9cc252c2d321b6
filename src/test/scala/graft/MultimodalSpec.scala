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
}
