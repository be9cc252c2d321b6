package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession, functions => F}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 F1): media payloads travel
  * as opaque `binary` columns next to a typed metadata struct; decode /
  * feature-extraction runs batched per partition so a real codec
  * (image decode, audio resample, frame sampling) would amortize its
  * per-batch setup. The container has no codec libraries, so
  * `stubDecode` below is a clearly-marked deterministic fake — the
  * schema, partitioning, and batch shape are the real contract.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("head_byte", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** STUB decoder: stands in for image/audio decode. Deterministic
    * byte-level features only — replace the body with a real codec
    * call per batch in production.
    */
  private def stubDecode(payload: Array[Byte]): (Long, Int, Long) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
    (payload.length.toLong, if (payload.isEmpty) -1 else payload(0) & 0xff, sum)
  }

  /** Attach an opaque payload column + metadata struct to `documents`
    * (the test corpus has no real media, so the payload is the utf-8
    * text bytes — the pipeline shape is identical for jpeg/wav bytes).
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      F.col("doc_id"),
      F.col("text").cast("binary").as("payload"),
      F.struct(F.col("source"), F.col("lang"), F.col("n_chars")).as("meta"))

  /** STUB resize: stands in for image rescale. Deterministically maps
    * the payload to a fixed-size "thumbnail" byte array (strided
    * sampling of the source bytes — replace with a real scaler). The
    * pipeline contract it exercises is real: binary in → smaller
    * binary out, metadata updated, fully codegen-compatible schema.
    */
  def resizeStub(withBin: DataFrame, targetBytes: Int = 64): DataFrame = {
    val resize = F.udf { (payload: Array[Byte]) =>
      if (payload.isEmpty) Array.emptyByteArray
      else Array.tabulate(math.min(targetBytes, payload.length)) { i =>
        payload((i.toLong * payload.length / math.min(targetBytes, payload.length)).toInt)
      }
    }
    withBin.withColumn("thumb", resize(F.col("payload")))
      .withColumn("thumb_len", F.length(F.col("thumb")))
  }

  /** STUB frame sampling: stands in for video frame extraction. Splits
    * the payload into fixed-size "frames" and keeps every `stride`-th
    * one, exploded to (doc_id, frame_idx, frame) rows — the shape a
    * real decoder feeds downstream per-frame featurizers with. Frames
    * per row are bounded, so the explode fan-out is controlled.
    */
  def frameSampleStub(withBin: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val split = F.udf { (payload: Array[Byte]) =>
      payload.grouped(frameBytes).zipWithIndex
        .collect { case (frame, idx) if idx % stride == 0 => (idx, frame) }
        .toSeq
    }
    withBin
      .select(F.col("doc_id"), F.explode(split(F.col("payload"))).as("f"))
      .select(F.col("doc_id"), F.col("f._1").as("frame_idx"), F.col("f._2").as("frame"))
  }

  /** Batched per-partition decode → feature rows. */
  def decodeFeatures(spark: SparkSession, withBin: DataFrame): DataFrame = {
    val rdd = withBin.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val (len, head, sum) = stubDecode(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[Long]("doc_id"), len, head, sum)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
