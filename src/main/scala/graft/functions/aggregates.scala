package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded best-first insertion over parallel (score desc, id asc)
  * arrays — the one copy of the ordered-insert invariant both top-k
  * buffers share. Insertion is O(k) — k is small (10..100) and the
  * buffer lives per-group per-partition, so map-side partial
  * aggregation reduces each partition's contribution to ≤ k rows
  * BEFORE the shuffle. Subclasses with extra per-entry state hook
  * `shiftPayload` and write their slot after `insertSlot` returns.
  */
sealed abstract class TopKBufferBase(val k: Int) {
  // parallel arrays, kept sorted best-first
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // java.lang.Double.compare orders NaN greatest — the same total order
  // Spark uses for double sorts, so results match a row_number() window
  // even when zero-norm vectors produce NaN cosines
  @inline protected final def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  /** Move any per-entry payload from slot `from` to slot `to`. */
  protected def shiftPayload(to: Int, from: Int): Unit = ()

  /** Place (score, id), shifting worse entries down; returns the slot
    * index the entry landed in, or -1 if it did not make the top k.
    */
  protected final def insertSlot(s0: Double, id: Long): Int = {
    val s = s0 + 0.0 // normalize -0.0: Spark sorts ±0.0 equal, Double.compare does not
    if (size == k && !better(s, id, scores(size - 1), ids(size - 1))) return -1
    var pos = if (size < k) size else k - 1
    while (pos > 0 && better(s, id, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); shiftPayload(pos, pos - 1)
      pos -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (size < k) size += 1
    pos
  }
}

/** Payload-free top-k: the k best (score desc, id asc) pairs. */
final class TopKBuffer(k0: Int) extends TopKBufferBase(k0) {
  def insert(s: Double, id: Long): Unit = insertSlot(s, id)

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }
}

/** Top-k (score, id) pairs per group as array<struct<score,id>>,
  * ordered score desc / id asc — the aggregate form of
  * `row_number() OVER (ORDER BY score DESC, id) <= k`, but with a
  * bounded buffer: at 100 TB a window sorts every candidate row per
  * group across the cluster, while this carries at most k rows per
  * partition into the exchange.
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = InternalRow(buf.scores(i), buf.ids(i)); i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByScore =
    copy(score = cs(0), id = cs(1))
}

/** [[TopKBuffer]] with an opaque payload value carried per entry —
  * same bounded O(k) state, same shared insertion invariant.
  */
final class TopKPayloadBuffer(k0: Int) extends TopKBufferBase(k0) {
  val payloads = new Array[Any](k)

  override protected def shiftPayload(to: Int, from: Int): Unit =
    payloads(to) = payloads(from)

  def insert(s: Double, id: Long, p: Any): Unit = {
    val pos = insertSlot(s, id)
    if (pos >= 0) payloads(pos) = p
  }

  def mergeFrom(other: TopKPayloadBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i), other.payloads(i)); i += 1 }
  }
}

/** Bounded ARRAY_AGG(payload ORDER BY score DESC, tieId ASC LIMIT k):
  * the k best payload values per group, in rank order. BigQuery's
  * `ARRAY_AGG(x ORDER BY s DESC LIMIT k)` compiles to exactly this
  * bounded shape; Spark's only built-in spelling is
  * slice(reverse(array_sort(collect_list(...)))), which buffers EVERY
  * row of the group in one aggregation buffer before sorting — on a
  * skewed key at 100 TB that buffer is the OOM. Here map-side partials
  * carry ≤ k payloads per partition into the exchange, like
  * [[TopKByScore]], with the payload riding in the buffer (serialized
  * via UnsafeProjection, so any Spark SQL type works).
  *
  * Descending-score / ascending-tie is the fixed contract; for a
  * descending tie-break pass the negated id (ORDER BY price DESC, key
  * DESC ≡ tieId = -key).
  */
case class TopKPayloadByScore(
    score: Expression, id: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPayloadBuffer] {

  override def children: Seq[Expression] = Seq(score, id, payload)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_payload"
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = payload.nullable)

  @transient private lazy val payloadProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Array(payload.dataType))
  @transient private lazy val payloadRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def createAggregationBuffer(): TopKPayloadBuffer = new TopKPayloadBuffer(k)

  override def update(buf: TopKPayloadBuffer, input: InternalRow): TopKPayloadBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // copy: eval of struct/array children may return a reused row
      val p = InternalRow.copyValue(payload.eval(input))
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long], p)
    }
    buf
  }

  override def merge(buf: TopKPayloadBuffer, other: TopKPayloadBuffer): TopKPayloadBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKPayloadBuffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) { out(i) = buf.payloads(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKPayloadBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i))
      payloadRow.update(0, buf.payloads(i))
      val bytes = payloadProj(payloadRow).getBytes
      out.writeInt(bytes.length); out.write(bytes)
      i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPayloadBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKPayloadBuffer(k)
    val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
    var i = 0
    while (i < n) {
      val s = in.readDouble(); val id = in.readLong()
      val len = in.readInt()
      val pb = new Array[Byte](len)
      in.readFully(pb)
      row.pointTo(pb, len)
      // copy out of the transient byte buffer before the next iteration
      buf.insert(s, id, InternalRow.copyValue(row.get(0, payload.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPayloadByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPayloadByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKPayloadByScore =
    copy(score = cs(0), id = cs(1), payload = cs(2))
}

object aggregates {
  /** Column form: array of the k best (score, id) structs per group.
    * Inputs are cast to (double, long) here — the aggregate's buffer
    * types — so a float score or int id fails at analysis (or is
    * widened), never as a runtime ClassCastException inside the
    * aggregate; Catalyst folds the no-op casts away when the columns
    * already carry the buffer types.
    */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(
        Bridge.expression(score.cast("double")), Bridge.expression(id.cast("long")),
        k).toAggregateExpression())

  /** Bounded ARRAY_AGG(... ORDER BY score DESC, tieId ASC LIMIT k):
    * array of the k best `payload` values per group, rank-ordered.
    */
  def top_k_payload(score: Column, tieId: Column, payload: Column, k: Int): Column =
    Bridge.column(
      TopKPayloadByScore(
        Bridge.expression(score.cast("double")), Bridge.expression(tieId.cast("long")),
        Bridge.expression(payload), k).toAggregateExpression())
}
