package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery's `APPROX_TOP_SUM(expr, weight, k)` — top items by SUMMED
  * WEIGHT — as a weighted SPACE-SAVING sketch (Metwally et al. 2005,
  * "Efficient computation of frequent and top-k elements in data
  * streams"; the weighted update is the standard generalization):
  * `capacity` counters of (item → sum, error); a tracked item adds
  * its weight, a new item beyond capacity REPLACES the minimum
  * counter, inheriting its sum as both floor and error. Guarantees:
  * est ≥ true ≥ est − error, and any item whose true sum exceeds the
  * evicted minimum is in the sketch — the heavy hitters survive.
  *
  * Merge sums common items and unions the rest, then re-prunes to
  * capacity (partial aggregation / shard sketches compose). THE
  * EXACT REGIME is the hash-gated contract (the B11/KLL discipline):
  * while every partial stays under capacity nothing evicts, errors
  * stay 0, and the result is the EXACT group-sum top-k — order-free
  * and partition-invariant. Beyond capacity, results are estimates
  * and eviction order makes them partition-dependent → the approx
  * face is declared rows-only.
  *
  * Output: ARRAY<STRUCT<value STRING, sum_w INT64, error INT64>>,
  * ordered (sum desc, value asc) — `error` surfaces the per-item
  * bound (0 in the exact regime; BigQuery omits it, stated).
  */
object TopSum {
  final class Buf(val capacity: Int) {
    val sums = new java.util.HashMap[String, Long]()
    val errs = new java.util.HashMap[String, Long]()

    def add(item: String, w: Long): Unit = {
      val cur = sums.get(item)
      if (cur != null) sums.put(item, cur + w)
      else if (sums.size < capacity) { sums.put(item, w); errs.put(item, 0L) }
      else {
        // evict the minimum counter (ties: smallest item bytes — a
        // deterministic rule, though the STREAM order still shapes
        // approx results; the exact regime never reaches this branch)
        var minK: String = null; var minV = Long.MaxValue
        val it = sums.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue < minV ||
            (e.getValue == minV && (minK == null || u8Lt(e.getKey, minK)))) {
            minV = e.getValue; minK = e.getKey
          }
        }
        sums.remove(minK); errs.remove(minK)
        sums.put(item, minV + w)
        errs.put(item, minV)
      }
    }

    def mergeIn(other: Buf): Unit = {
      val it = other.sums.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        val cur = sums.get(k)
        if (cur != null) {
          sums.put(k, cur + e.getValue)
          errs.put(k, errs.get(k) + other.errs.get(k))
        } else {
          sums.put(k, e.getValue)
          errs.put(k, other.errs.get(k))
        }
      }
      // re-prune to capacity: keep the largest sums (drop order is
      // the same deterministic (sum asc, item desc) rule)
      while (sums.size > capacity) {
        var minK: String = null; var minV = Long.MaxValue
        val it2 = sums.entrySet().iterator()
        while (it2.hasNext) {
          val e = it2.next()
          if (e.getValue < minV ||
            (e.getValue == minV && (minK == null || u8Lt(e.getKey, minK)))) {
            minV = e.getValue; minK = e.getKey
          }
        }
        sums.remove(minK); errs.remove(minK)
      }
    }

    def topK(k: Int): Seq[(String, Long, Long)] = {
      import scala.collection.JavaConverters._
      implicit val ord: Ordering[String] = (a, b) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
      sums.entrySet().asScala.toSeq
        .map(e => (e.getKey, e.getValue.longValue(), errs.get(e.getKey).longValue()))
        .sortBy { case (item, s, _) => (-s, item) }
        .take(k)
    }
  }

  private def u8Lt(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  def toBytes(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.sums.size)
    val it = buf.sums.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(e.getValue)
      out.writeLong(buf.errs.get(e.getKey))
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Buf(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val k = new String(kb, "UTF-8")
      buf.sums.put(k, in.readLong())
      buf.errs.put(k, in.readLong())
      i += 1
    }
    buf
  }

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType),
    StructField("sum_w", LongType, nullable = false),
    StructField("error", LongType, nullable = false))), containsNull = false)
}

case class ApproxTopSumAgg(
    item: Expression, weight: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopSum.Buf] with ExpectsInputTypes {

  require(k >= 1, s"APPROX_TOP_SUM: k must be >= 1, got $k")
  require(capacity >= k,
    s"APPROX_TOP_SUM: capacity ($capacity) must be >= k ($k)")

  override def children: Seq[Expression] = Seq(item, weight)
  override def inputTypes = Seq(StringType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = TopSum.resultType

  override def createAggregationBuffer(): TopSum.Buf = new TopSum.Buf(capacity)

  override def update(buf: TopSum.Buf, input: InternalRow): TopSum.Buf = {
    val i = item.eval(input)
    val w = weight.eval(input)
    // BigQuery skips NULL expressions; a NULL weight contributes nothing
    if (i != null && w != null)
      buf.add(i.asInstanceOf[UTF8String].toString, w.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopSum.Buf, other: TopSum.Buf): TopSum.Buf = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TopSum.Buf): Any = {
    val rows = buf.topK(k).map { case (v, s, e) =>
      org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(v),
        java.lang.Long.valueOf(s), java.lang.Long.valueOf(e))
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: TopSum.Buf): Array[Byte] = TopSum.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): TopSum.Buf = TopSum.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ApproxTopSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxTopSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ApproxTopSumAgg =
    copy(item = cs(0), weight = cs(1))
}
