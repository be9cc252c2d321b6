package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession, functions => F}
import org.apache.spark.sql.types._
import graft.functions.native

/** Multimodal-column plumbing (SURVEY.md §2 F-block): media payloads
  * travel as opaque `binary` columns next to a typed metadata struct.
  *
  * Three stages, three mechanisms — each the strongest Spark shape its
  * semantics allow:
  *  - decode/feature-extract: `mapPartitions` behind an explicit
  *    `PayloadCodec` contract (a real codec amortizes native-lib setup
  *    per partition; the container has no codec libraries, so
  *    `StubCodec` computes deterministic byte-level features).
  *  - resize: a native codegen'd expression (`StridedBytes`) — binary
  *    in, bounded binary out, no UDF serialization boundary. Only the
  *    SAMPLING RULE stands in for a real scaler; the dataflow is the
  *    production dataflow.
  *  - frame sampling: pure built-in Column composition (`sequence` +
  *    binary `substring`) — byte-exact frame slicing with bounded,
  *    stride-controlled explode fan-out; nothing stubbed at all.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("head_byte", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** The codec contract a deployment fills in: `open` runs once per
    * partition (load the native library, allocate decode contexts,
    * spin worker threads), `decode` runs per payload against that
    * amortized setup, `close` releases it at task completion. This is
    * the batch shape that makes per-image/per-frame JNI affordable at
    * 100 TB — setup cost divides by partition size, not row count.
    */
  trait PayloadCodec extends Serializable {
    def open(): Unit = ()
    def decode(payload: Array[Byte]): (Long, Int, Long)
    def close(): Unit = ()
  }

  /** STUB codec: stands in for image/audio decode (no codec libs in
    * this container). Deterministic byte-level features only — a
    * deployment swaps in a PayloadCodec whose decode calls the real
    * library; nothing else changes.
    */
  object StubCodec extends PayloadCodec {
    def decode(payload: Array[Byte]): (Long, Int, Long) = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
      (payload.length.toLong, if (payload.isEmpty) -1 else payload(0) & 0xff, sum)
    }
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

  /** Resize: deterministic fixed-budget byte downsample via the native
    * `StridedBytes` expression — binary → bounded binary inside
    * whole-stage codegen, metadata updated. Swap the expression for a
    * codec-backed one to get true pixel rescaling; the schema and the
    * plan shape stay identical.
    */
  def resizeStub(withBin: DataFrame, targetBytes: Int = 64): DataFrame =
    withBin.withColumn("thumb", native.strided_bytes(F.col("payload"), targetBytes))
      .withColumn("thumb_len", F.length(F.col("thumb")))

  /** Frame sampling: split the payload into fixed-size frames, keep
    * every `stride`-th one, exploded to (doc_id, frame_idx, frame)
    * rows. Pure built-in composition — `sequence` generates exactly
    * the kept indices (so the explode fan-out is len/(frameBytes·
    * stride), never len/frameBytes) and binary `substring` slices
    * byte-exactly. This stage has no stub in it: only downstream
    * interpretation of the slices as video frames needs a codec.
    */
  def frameSampleStub(withBin: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val nFrames = F.ceil(F.length(F.col("payload")).cast("double") / frameBytes).cast("int")
    withBin
      .filter(F.length(F.col("payload")) > 0)
      .select(F.col("doc_id"), F.col("payload"),
        F.explode(F.sequence(F.lit(0), nFrames - 1, F.lit(stride))).as("frame_idx"))
      .select(F.col("doc_id"), F.col("frame_idx"),
        F.substring(F.col("payload"), F.col("frame_idx") * frameBytes + 1, F.lit(frameBytes))
          .as("frame"))
  }

  /** Batched per-partition decode → feature rows, through the codec
    * contract. Takes a FACTORY, not an instance: each task constructs
    * its own codec, so concurrent partitions never share decode state
    * (a serialized singleton instance would deserialize to one shared
    * JVM object under local[N], and the first task to finish would
    * close() contexts its siblings still use). `close` registers only
    * after `open` succeeds — a failed open has nothing to release.
    */
  def decodeFeatures(spark: SparkSession, withBin: DataFrame,
                     codecFactory: () => PayloadCodec = () => StubCodec): DataFrame = {
    val rdd = withBin.select("doc_id", "payload").rdd.mapPartitions { it =>
      val codec = codecFactory()
      codec.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
      it.map { r =>
        val (len, head, sum) = codec.decode(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[Long]("doc_id"), len, head, sum)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
