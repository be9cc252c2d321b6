package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Distributed Bloom filter: the semi-/anti-join REDUCTION sketch for
  * droplist application at corpus scale (see [[graft.operators.BloomJoin]]).
  *
  * A 100 TB corpus anti-joined against a droplist past broadcast size
  * shuffles the full corpus width on the join key. A Bloom filter of
  * the droplist keys is megabytes regardless of corpus size
  * (9.6 bits/key at 1% fpp), has NO false negatives, and turns the
  * join into: map-only pass for definite negatives + an exact join
  * over only the possible positives. This is the same idea Spark's
  * AQE runtime row-level filtering applies inside one query; exposed
  * as a library surface it also covers multi-query reuse (build once,
  * apply to every table of a corpus).
  *
  * Layout: `numHashes` double-hashed probes (Kirsch–Mitzenmacher:
  * probe i = h1 + i·h2, h2 odd) over a word-aligned bitset. Keys
  * enter as 64-bit hashes (xxhash64 of the key columns — computed by
  * the codegen'd built-in, one hash per row; the probes derive from
  * it with two multiplies). Serialized form: [numHashes:int]
  * [numWords:int][words:long...], engine-independent.
  */
final class BloomBuffer(val numHashes: Int, val words: Array[Long]) {
  @inline private def numBits: Long = words.length.toLong * 64L

  /** Probe positions from one 64-bit key hash (h2 forced odd so the
    * probe stride is coprime with the power-of-two-free modulus).
    */
  def insert(hash: Long): Unit = {
    val h2 = Hashing.mix(hash) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(hash + i.toLong * h2, numBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63L)
      i += 1
    }
  }

  def mightContain(hash: Long): Boolean = {
    val h2 = Hashing.mix(hash) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(hash + i.toLong * h2, numBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  def orInPlace(other: BloomBuffer): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }

  def serialized: Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + words.length * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(numHashes); out.writeInt(words.length)
    var i = 0
    while (i < words.length) { out.writeLong(words(i)); i += 1 }
    out.flush(); bos.toByteArray
  }
}

object BloomBuffer {
  /** Optimal sizing for `expectedItems` keys at false-positive rate
    * `fpp`: m = -n·ln p / ln²2 bits, k = m/n·ln 2 probes.
    */
  def sized(expectedItems: Long, fpp: Double): BloomBuffer = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2.0)
    val bits = math.ceil(-expectedItems.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    val words64 = math.max(1L, (bits + 63L) >>> 6)
    // 2^31 words = 16 GiB of bitset — far past closure-shippable; the
    // caller should raise fpp (the exact join absorbs the positives)
    require(words64 <= Int.MaxValue,
      s"filter would need $words64 words; raise fpp or shrink expectedItems")
    val words = words64.toInt
    val hashes = math.max(1, math.round(bits.toDouble / expectedItems.toDouble * ln2).toInt)
    new BloomBuffer(hashes, new Array[Long](words))
  }

  def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val numHashes = in.readInt()
    val words = new Array[Long](in.readInt())
    var i = 0
    while (i < words.length) { words(i) = in.readLong(); i += 1 }
    new BloomBuffer(numHashes, words)
  }
}

/** Aggregates 64-bit key hashes into one serialized Bloom filter.
  * Map-side partials are each a full-size bitset OR-merged up the
  * tree — the shuffle moves `numPartitions × filter size`, never the
  * keys themselves. Null hashes are skipped (SQL equality never
  * matches NULL, so a NULL droplist key can't exclude anything).
  */
case class BloomFilterAgg(
    child: Expression, expectedItems: Long, fpp: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuffer = BloomBuffer.sized(expectedItems, fpp)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val h = child.eval(input)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buf.orInPlace(other); buf
  }

  override def eval(buf: BloomBuffer): Any = buf.serialized
  override def serialize(buf: BloomBuffer): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): BloomBuffer = BloomBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = cs(0))
}

/** Membership probe against a DRIVER-HELD serialized filter (the
  * filter is bounded — megabytes — so it rides into the task closure
  * as a reference object, Spark's own runtime-filter shape). The
  * bitset is deserialized once per executor, not per row; the probe
  * is two multiplies + `numHashes` word reads inside whole-stage
  * codegen.
  */
case class BloomMightContain(child: Expression, filter: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomBuffer = BloomBuffer.deserialize(filter)

  def compute(hash: Long): Boolean = bloom.mightContain(hash)

  override def nullSafeEval(h: Any): Any = compute(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object bloom {
  /** Column face: aggregate a LongType hash column into a serialized filter. */
  def bloom_agg(keyHash: Column, expectedItems: Long, fpp: Double): Column =
    Bridge.column(BloomFilterAgg(Bridge.expression(keyHash), expectedItems, fpp)
      .toAggregateExpression())

  /** Column face: probe a driver-held serialized filter. */
  def bloom_might_contain(keyHash: Column, filter: Array[Byte]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(keyHash), filter))
}
