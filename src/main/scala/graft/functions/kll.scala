package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** BigQuery's `KLL_QUANTILES` sketch family — the quantile analogue
  * of the B44 `HLL_COUNT` distinct-count sketches, and the other half
  * of THE pre-aggregation scale pattern: INIT a per-shard/day partial
  * sketch once, re-aggregate sketch BYTES forever (`MERGE_PARTIAL`),
  * and read percentiles (`EXTRACT_POINT`/`EXTRACT`) without ever
  * touching the rows again. A latency-percentile dashboard over
  * 100 TB of events reads a sketch table of kilobytes per day.
  *
  * The sketch beneath is Spark's own Greenwald–Khanna
  * [[QuantileSummaries]] (the `approx_percentile` engine — NOT the
  * KLL paper's sampler, a stated divergence: same mergeable-summary
  * contract and rank-error guarantee shape, different wire format and
  * error constants; BigQuery's own KLL bytes do not interop either
  * way). Precision `k` maps to rank error 1/k (BigQuery's default
  * k=1000 ≈ 0.1% rank error). Like the B11b/B39 GK faces, the summary
  * is EXACT while 2·(count)/k < 2 — i.e. groups smaller than k keep
  * every sample with g=1 — which is what lets the driver face
  * hash-gate the whole INIT → shuffle → MERGE_PARTIAL → EXTRACT
  * pipeline against DuckDB's exact `quantile_disc`; genuinely
  * approximate regimes inherit the declared-rows-only treatment.
  *
  * Sketches are TYPED, as in BigQuery: INIT_INT64 sketches only feed
  * the _INT64 read spellings (the flag byte travels in the sketch;
  * mismatches are loud, as BigQuery errors). Values are stored as
  * doubles — exact for |int64| < 2^53, the same envelope Spark's own
  * percentile_approx has.
  */
object KllCodec {
  val FlagDouble = 0
  val FlagLong = 1

  /** (flag, compressed summary) → bytes. Compression is part of
    * serialization: merge/query require a compressed summary, and the
    * head buffer never needs to travel.
    */
  def toBytes(flag: Int, qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeByte(flag)
    out.writeDouble(qs.relativeError)
    out.writeInt(qs.compressThreshold)
    out.writeLong(qs.count)
    val s = qs.sampled
    out.writeInt(s.length)
    s.foreach { st => out.writeDouble(st.value); out.writeLong(st.g); out.writeLong(st.delta) }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): (Int, QuantileSummaries) = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val flag = in.readByte().toInt
    val eps = in.readDouble()
    val ct = in.readInt()
    val count = in.readLong()
    val n = in.readInt()
    val s = Array.fill(n)(QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong()))
    (flag, new QuantileSummaries(ct, eps, s, count, true))
  }

  def typeName(flag: Int): String = if (flag == FlagLong) "INT64" else "FLOAT64"

  def requireFlag(got: Int, want: Int, fn: String): Unit =
    require(got == want,
      s"$fn: sketch is ${typeName(got)} but the ${typeName(want)} spelling was used — " +
        "KLL sketches are typed (BigQuery's rule); use the matching _INT64/_FLOAT64 form")
}

/** `KLL_QUANTILES.INIT_*(value, k)`: one mergeable quantile summary
  * per group, serialized. Map-side partials are summary-sized
  * (O(k·log(n/k)) entries), so the shuffle moves sketches, never
  * values — the whole point of the family.
  */
case class KllInitAgg(
    child: Expression, precision: Int, asLong: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] with ImplicitCastInputTypes {

  require(precision >= 16 && precision <= 65536,
    s"KLL precision must be in 16..65536 (BigQuery's range), got $precision")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  private def flag = if (asLong) KllCodec.FlagLong else KllCodec.FlagDouble

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, 1.0 / precision)

  override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf else buf.insert(v.asInstanceOf[Double])
  }

  override def merge(buf: QuantileSummaries, other: QuantileSummaries): QuantileSummaries =
    buf.compress().merge(other.compress())

  override def eval(buf: QuantileSummaries): Any = KllCodec.toBytes(flag, buf)
  override def serialize(buf: QuantileSummaries): Array[Byte] = KllCodec.toBytes(flag, buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries = KllCodec.fromBytes(bytes)._2

  override def withNewMutableAggBufferOffset(o: Int): KllInitAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllInitAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KllInitAgg =
    copy(child = cs(0))
}

/** Mutable (type flag, summary) pair — MERGE_PARTIAL learns the
  * sketch type from its first input (-1 until then) and refuses to
  * mix INT64 with FLOAT64 sketches.
  */
final class KllBuf(var flag: Int, var qs: QuantileSummaries)

/** `KLL_QUANTILES.MERGE_PARTIAL(sketch)`: re-aggregate serialized
  * sketches into one — the second-level aggregation that never reads
  * rows. NULL inputs skip; an all-NULL/empty group yields NULL
  * (BigQuery's rule).
  */
case class KllMergePartialAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllBuf =
    new KllBuf(-1, new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, QuantileSummaries.defaultRelativeError))

  private def fold(buf: KllBuf, flag: Int, qs: QuantileSummaries): KllBuf = {
    if (buf.flag == -1) buf.flag = flag
    else if (flag != -1) require(buf.flag == flag,
      s"KLL_QUANTILES.MERGE_PARTIAL: cannot merge ${KllCodec.typeName(buf.flag)} and " +
        s"${KllCodec.typeName(flag)} sketches")
    buf.qs = buf.qs.compress().merge(qs.compress())
    buf
  }

  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val (flag, qs) = KllCodec.fromBytes(v.asInstanceOf[Array[Byte]])
      fold(buf, flag, qs)
    }
  }

  override def merge(buf: KllBuf, other: KllBuf): KllBuf =
    if (other.flag == -1 && other.qs.count == 0) buf else fold(buf, other.flag, other.qs)

  override def eval(buf: KllBuf): Any =
    if (buf.flag == -1) null else KllCodec.toBytes(buf.flag, buf.qs)
  override def serialize(buf: KllBuf): Array[Byte] = KllCodec.toBytes(buf.flag, buf.qs)
  override def deserialize(bytes: Array[Byte]): KllBuf = {
    val (flag, qs) = KllCodec.fromBytes(bytes)
    new KllBuf(flag, qs)
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergePartialAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergePartialAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KllMergePartialAgg =
    copy(child = cs(0))
}

/** `KLL_QUANTILES.EXTRACT_POINT_*(sketch, phi)`: the value at rank
  * fraction phi. Operates on AGGREGATED rows (one per group), so
  * CodegenFallback costs nothing measurable; an empty sketch yields
  * NULL. The GK query path is byte-identical to percentile_approx's.
  */
case class KllExtractPoint(left: Expression, right: Expression, asLong: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = if (asLong) LongType else DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any, phiAny: Any): Any = {
    val (flag, qs) = KllCodec.fromBytes(s.asInstanceOf[Array[Byte]])
    KllCodec.requireFlag(flag,
      if (asLong) KllCodec.FlagLong else KllCodec.FlagDouble, "KLL_QUANTILES.EXTRACT_POINT")
    val phi = phiAny.asInstanceOf[Double]
    require(phi >= 0.0 && phi <= 1.0, s"phi must be in [0, 1], got $phi")
    if (qs.count == 0) null
    else {
      val v = qs.query(phi).get
      if (asLong) java.lang.Long.valueOf(v.toLong) else java.lang.Double.valueOf(v)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllExtractPoint =
    copy(left = l, right = r)
}

/** `KLL_QUANTILES.EXTRACT_*(sketch, n)`: n+1 quantiles at the evenly
  * spaced fractions 0, 1/n, ..., 1 (min and max included — BigQuery's
  * shape, mirroring B39's APPROX_QUANTILES).
  */
case class KllExtractArray(left: Expression, right: Expression, asLong: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType, IntegerType)
  override def dataType: DataType =
    ArrayType(if (asLong) LongType else DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any, nAny: Any): Any = {
    val (flag, qs) = KllCodec.fromBytes(s.asInstanceOf[Array[Byte]])
    KllCodec.requireFlag(flag,
      if (asLong) KllCodec.FlagLong else KllCodec.FlagDouble, "KLL_QUANTILES.EXTRACT")
    val n = nAny.asInstanceOf[Int]
    require(n >= 1, s"number of quantile divisions must be >= 1, got $n")
    if (qs.count == 0) null
    else {
      val vals = (0 to n).map { i =>
        val v = qs.query(i.toDouble / n).get
        if (asLong) (v.toLong: Any) else (v: Any)
      }
      new GenericArrayData(vals.toArray)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllExtractArray =
    copy(left = l, right = r)
}

object kll {
  /** Column faces for library callers; SQL spellings route through
    * the GraftSql KLL_QUANTILES.* rewrites and the registry.
    */
  def kll_init(value: Column, precision: Int = 1000, asLong: Boolean = false): Column =
    Bridge.column(KllInitAgg(Bridge.expression(value.cast("double")), precision, asLong)
      .toAggregateExpression())
  def kll_merge_partial(sketch: Column): Column =
    Bridge.column(KllMergePartialAgg(Bridge.expression(sketch)).toAggregateExpression())
  def kll_extract_point(sketch: Column, phi: Double, asLong: Boolean = false): Column =
    Bridge.column(KllExtractPoint(Bridge.expression(sketch),
      Literal(phi, DoubleType), asLong))
}
