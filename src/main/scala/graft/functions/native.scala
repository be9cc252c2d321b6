package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch/similarity hot paths.
  *
  * The Column-composed versions (transform/aggregate lambdas) are
  * interpreted per array element; for k=64 signatures over ~100-shingle
  * documents that is ~10⁴ interpreted expression-node evaluations per
  * row. These expressions do the same math as one tight JVM loop per
  * row — the difference is ~20× on the dedup benchmark.
  *
  * All of them implement `doGenCode` (no CodegenFallback): the call
  * site stays inside whole-stage codegen, so a sketch projection fuses
  * with its surrounding scan/filter/project stage instead of breaking
  * the stage at every expression boundary. The generated code makes
  * one virtual call per row into the JIT'd `compute` loop — the same
  * shape Spark's own `StaticInvoke`-backed expressions produce.
  *
  * Null semantics: a null input array yields null (null-intolerant
  * default); null ELEMENTS inside an array are skipped (hash/sketch
  * functions treat them as absent tokens) rather than NPE-ing.
  */
object Hashing {
  final val Golden = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — cheap, well-distributed derivation of the
    * per-permutation hash family from one strong base hash.
    */
  def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
    z ^= z >>> 27; z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashUTF8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
}

/** MinHash signature of a string set: slot i = min over elements of
  * mix(xxh64(element) ^ i·golden). One strong hash per element + k
  * cheap mixes — O(|set|·(len + k)) per row.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  def compute(arr: ArrayData): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h0 = Hashing.hashUTF8(arr.getUTF8String(j), 42L)
        var i = 0
        while (i < k) {
          val h = Hashing.mix(h0 ^ (i * Hashing.Golden))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array: per-token xxh64, ±1 bit votes,
  * sign fold — one pass, no per-bit expression trees.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = Hashing.hashUTF8(arr.getUTF8String(j), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Distinct word n-gram shingles from a token array (order of first
  * appearance; set semantics). Null tokens are skipped before
  * windowing.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private val space = UTF8String.fromString(" ")
  def compute(arr: ArrayData): ArrayData = {
    val len0 = arr.numElements()
    val toks = new Array[UTF8String](len0)
    var len = 0
    var t = 0
    while (t < len0) {
      if (!arr.isNullAt(t)) { toks(len) = arr.getUTF8String(t); len += 1 }
      t += 1
    }
    val count = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count && len > 0) {
      val m = math.min(n, len - i)
      val parts = new Array[UTF8String](m)
      var j = 0
      while (j < m) { parts(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Duplicated-n-gram character coverage for the Gopher repetition
  * tail (E16c), all n values in ONE pass per row: for each n, a token
  * n-gram (tokens joined with one space, null tokens absent — the
  * `concat_ws` law of the HOF spelling) occurring ≥ 2 times marks its
  * window's token positions covered; the per-n covered count is the
  * sum of covered tokens' character lengths, union semantics
  * (overlaps count once). Returns (total_chars, covered[ns.length]).
  *
  * The Column-composed spelling costs 6 gram builds + 6 sorts + 6
  * interpreted folds per row (8.1 s at sf0.1 even fully staged); this
  * is one JIT'd loop with a hash-map count per n — same math,
  * QualityRulesSpec pins bit-equality against the HOF path.
  */
case class DupNGramCoverage(child: Expression, ns: Seq[Int])
    extends UnaryExpression with ExpectsInputTypes {
  require(ns.nonEmpty && ns.forall(_ >= 2) && ns == ns.distinct,
    s"n-gram sizes must be distinct and >= 2: $ns")
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("total_chars", LongType, nullable = false),
    StructField("covered", ArrayType(LongType, containsNull = false), nullable = false)))
  private val space = UTF8String.fromString(" ")
  @transient private lazy val nArr = ns.toArray

  def compute(arr: ArrayData): InternalRow = {
    val t = arr.numElements()
    val toks = new Array[UTF8String](t)
    val lens = new Array[Long](t)
    var total = 0L
    var i = 0
    while (i < t) {
      if (!arr.isNullAt(i)) {
        toks(i) = arr.getUTF8String(i)
        lens(i) = toks(i).numChars().toLong
        total += lens(i)
      }
      i += 1
    }
    val covered = new Array[Any](nArr.length)
    var k = 0
    while (k < nArr.length) {
      val n = nArr(k)
      val m = t - n + 1
      if (m <= 0) covered(k) = 0L
      else {
        // gram strings (null tokens absent, concat_ws law)
        val grams = new Array[UTF8String](m)
        val counts = new java.util.HashMap[UTF8String, Integer](m * 2)
        var g = 0
        while (g < m) {
          var present = 0
          var j = 0
          while (j < n) { if (toks(g + j) != null) present += 1; j += 1 }
          val parts = new Array[UTF8String](present)
          var p = 0
          j = 0
          while (j < n) {
            if (toks(g + j) != null) { parts(p) = toks(g + j); p += 1 }
            j += 1
          }
          val s = UTF8String.concatWs(space, parts: _*)
          grams(g) = s
          val prev = counts.get(s)
          counts.put(s, Integer.valueOf(if (prev == null) 1 else prev.intValue() + 1))
          g += 1
        }
        // union coverage of duplicate-gram windows
        val cov = new Array[Boolean](t)
        g = 0
        while (g < m) {
          if (counts.get(grams(g)).intValue() >= 2) {
            var j = g
            val hi = g + n
            while (j < hi) { cov(j) = true; j += 1 }
          }
          g += 1
        }
        var c = 0L
        i = 0
        while (i < t) { if (cov(i)) c += lens(i); i += 1 }
        covered(k) = c
      }
      k += 1
    }
    InternalRow(total, new GenericArrayData(covered))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dupNGramCoverage", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): DupNGramCoverage =
    copy(child = newChild)
}

/** Cosine similarity of two float vectors, products and accumulation
  * in double precision, sequential order — semantics chosen to be
  * bit-identical to both the Column-composed form
  * (aggregate(zip_with(cast double))) and DuckDB's
  * list_aggregate(list_transform(list_zip(...)), 'sum'), so oracle
  * parity survives the native fast path.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosine", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** BigQuery VECTOR_SEARCH's three distance types in one codegen'd
  * pass (vector-search docs: EUCLIDEAN is L2 distance, COSINE is
  * 1 − cosine similarity, DOT_PRODUCT is the NEGATIVE dot product —
  * all three "smaller is nearer", so one top-k ordering serves all).
  * Accumulation is strict index order, like [[CosineSim]], so scores
  * are bit-reproducible across partitionings and DuckDB-replayable
  * with ordered list folds.
  */
case class VecDistance(left: Expression, right: Expression, mode: String)
    extends BinaryExpression with ExpectsInputTypes {
  require(VecDistance.Modes.contains(mode),
    s"distance mode must be one of ${VecDistance.Modes.mkString(", ")}, got $mode")
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      val d = x - y; ss += d * d
      i += 1
    }
    mode match {
      case "EUCLIDEAN" => math.sqrt(ss)
      case "COSINE" => 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
      case "DOT_PRODUCT" => -dot
    }
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecdist", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDistance =
    copy(left = l, right = r)
}

object VecDistance {
  val Modes: Set[String] = Set("EUCLIDEAN", "COSINE", "DOT_PRODUCT")
}

/** Random-hyperplane LSH signature of a float vector: bit p = sign of
  * Σᵢ vᵢ·w(p,i) with deterministic pseudo-random weights
  * w = mix(seed ⊕ p·G ⊕ i·G²) scaled to [-1,1]. One pass per plane,
  * no per-element expression trees.
  *
  * The weight matrix is derived only from (seed, planes, dim), so it is
  * materialized once per expression instance (growing if wider vectors
  * appear) instead of re-running `mix` planes×dim times per row — the
  * per-row cost drops to the dot products themselves. The matrix lives
  * behind a volatile reference to an immutable array: concurrent tasks
  * may race to grow it, but every racer computes identical values, so
  * last-write-wins is correct.
  */
case class HyperplaneSig(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(planes >= 1 && planes <= 64,
    s"HyperplaneSig packs bits into one long: planes must be in [1,64], got $planes")
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  // weights(p)(i), bit-identical to the formula in weightAt
  @transient @volatile private var cached: Array[Array[Double]] = _
  private def weightAt(p: Int, i: Int): Double = {
    val w = Hashing.mix(seed ^ (p * Hashing.Golden) ^ (i.toLong * 0xc2b2ae3d27d4eb4fL))
    w.toDouble / Long.MaxValue.toDouble
  }
  private def weights(dim: Int): Array[Array[Double]] = {
    var m = cached
    if (m == null || m(0).length < dim) {
      m = Array.tabulate(planes, dim)(weightAt)
      cached = m
    }
    m
  }
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val w = weights(math.max(n, 1))
    var sig = 0L
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var proj = 0.0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) proj += arr.getFloat(i) * wp(i)
        i += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplane", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** Strided byte resample of a binary payload: output slot i takes
  * input byte ⌊i·len/m⌋ where m = min(n, len) — a deterministic
  * fixed-budget downsample (the "thumbnail" shape of an image rescale
  * without a codec). Binary in → bounded binary out, codegen'd; the
  * multimodal resize stage runs entirely inside whole-stage codegen
  * instead of through a Scala UDF's serialization boundary.
  */
/** Average-hash perceptual fingerprint of a binary payload — the
  * [[StridedBytes]] thumbnail (same index law: out(i) =
  * payload((i·len/m)), m = min(thumbBytes, len)), floor-mean
  * threshold per cell, bits packed little-endian into one long
  * (`thumbBytes ≤ 60` keeps every bit inside the positive signed-64
  * range a SQL engine shares). One opaque codegen'd node on purpose:
  * the Column-composed spelling (hex → per-byte conv → mean fold →
  * bit fold) is torn apart by predicate pushdown — a filter or an
  * equi-join's implicit IsNotNull on the derived hash re-inlines the
  * whole staged pipeline into the predicate, re-evaluating the folds
  * per element (observed 70 s for a count at sf0.1 vs 2 s; SURVEY §4
  * staging rule 3) — while this expression is a single compute() call
  * wherever the optimizer copies it. NULL for an empty payload.
  */
case class AHash64(child: Expression, thumbBytes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(thumbBytes >= 2 && thumbBytes <= 60,
    s"thumbBytes=$thumbBytes must be in [2, 60] (bit j rides 2^j in a signed long)")
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  def compute(payload: Array[Byte]): java.lang.Long = {
    if (payload.isEmpty) return null
    val m = math.min(thumbBytes, payload.length)
    val thumb = new Array[Int](m)
    var sum = 0L
    var i = 0
    while (i < m) {
      thumb(i) = payload((i.toLong * payload.length / m).toInt) & 0xff
      sum += thumb(i)
      i += 1
    }
    val mean = sum / m
    var h = 0L
    i = 0
    while (i < m) { if (thumb(i) > mean) h |= 1L << i; i += 1 }
    java.lang.Long.valueOf(h)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ahash", this)
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = $ref.compute($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")
  }
  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

case class StridedBytes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"StridedBytes target must be positive, got $n")
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  def compute(payload: Array[Byte]): Array[Byte] =
    if (payload.isEmpty) Array.emptyByteArray
    else {
      val m = math.min(n, payload.length)
      val out = new Array[Byte](m)
      var i = 0
      while (i < m) { out(i) = payload((i.toLong * payload.length / m).toInt); i += 1 }
      out
    }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("strided", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): StridedBytes =
    copy(child = newChild)
}

/** Int8 quantization of a float vector: scale = max|xᵢ| and
  * codeᵢ = round(xᵢ·127/scale) (half away from zero, DuckDB/BigQuery
  * ROUND semantics) — 4× smaller embedding storage with reconstruction
  * error ≤ scale/254 per element. At 100 TB of embeddings the win is
  * less disk than shuffle/broadcast width: candidate-generation stages
  * can move codes and dequantize only for the exact-verify step. Struct
  * output (scale, codes) keeps the pair atomic; null elements quantize
  * to 0; a zero vector yields scale 0 and all-zero codes.
  */
/** md5 hex of every k-token window of a token array — bit-identical
  * to `transform(sequence(0, size-k), p -> md5(concat_ws(" ",
  * slice(toks, p+1, k))))` (null tokens skipped exactly as concat_ws
  * skips them), but one tight loop per row instead of an interpreted
  * HOF lambda re-evaluating a slice+concat+md5 expression tree per
  * window — the [[graft.operators.Spans]] hot path. Returns an empty
  * array when fewer than k tokens exist.
  */
case class WindowMd5(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"window k=$k must be >= 1")
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // MessageDigest is stateful; the expression object is shared across
  // local-mode task threads, so the instance is per-thread
  @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val bytes = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      bytes(t) = if (arr.isNullAt(t)) null else arr.getUTF8String(t).getBytes
      t += 1
    }
    val digest = md5.get()
    val out = new Array[AnyRef](n - k + 1)
    var p = 0
    while (p <= n - k) {
      digest.reset()
      var j = 0
      var first = true
      while (j < k) {
        val b = bytes(p + j)
        if (b != null) { // concat_ws skips null elements AND their separator
          if (!first) digest.update(' '.toByte)
          digest.update(b)
          first = false
        }
        j += 1
      }
      val d = digest.digest()
      val hex = new Array[Byte](32)
      var i = 0
      while (i < 16) {
        hex(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
        hex(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
        i += 1
      }
      out(p) = UTF8String.fromBytes(hex)
      p += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("windowMd5", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): WindowMd5 =
    copy(child = newChild)
}

/** The [[graft.operators.Spans]] rebuild: given a doc's token array
  * and the SORTED distinct start positions of its duplicated k-token
  * windows, keep every token not covered by any window [s, s+k) and
  * return struct(kept_text = space-joined survivors, dropped = count
  * of covered tokens). Bit-identical to the fold spelling
  * (aggregate over sequence with a cover/j state struct), but one
  * O(n) imperative walk — the fold's `array_append` accumulator
  * copies the kept array per token (O(n²)) and every step is an
  * interpreted expression tree. Null tokens are skipped in the
  * rebuild exactly as concat_ws skips them.
  */
case class RebuildSpans(tokens: Expression, starts: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = tokens
  override def right: Expression = starts
  override def inputTypes = Seq(ArrayType(StringType), ArrayType(IntegerType))
  override def dataType: DataType = StructType(Seq(
    StructField("kept", StringType, nullable = false),
    StructField("dropped", LongType, nullable = false)))
  private val space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, ss: ArrayData): InternalRow = {
    val n = toks.numElements()
    val m = ss.numElements()
    val kept = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var dropped = 0L
    var cover = 0L
    var j = 0
    var i = 0
    while (i < n) {
      if (j < m && !ss.isNullAt(j) && ss.getInt(j) == i) {
        val end = i.toLong + k
        if (end > cover) cover = end
        j += 1
      }
      if (i.toLong < cover) dropped += 1
      else if (!toks.isNullAt(i)) kept += toks.getUTF8String(i)
      i += 1
    }
    InternalRow(UTF8String.concatWs(space, kept.toSeq: _*), dropped)
  }
  override def nullSafeEval(t: Any, s: Any): Any =
    compute(t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rebuildSpans", this)
    nullSafeCodeGen(ctx, ev, (t, s) => s"${ev.value} = $ref.compute($t, $s);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RebuildSpans =
    copy(tokens = l, starts = r)
}

/** The [[graft.operators.TextClassifier]] hot path: one compiled walk
  * over a token array computing the hashed-bag-of-ngrams integer vote
  * sum — struct(n_features, raw) where features are unigrams +
  * adjacent bigrams (joined by '_'), each hashed to the first 52 bits
  * of its md5 (the `Sampling.hash52` family) mod `weights.length`,
  * voting its integer weight. Bit-identical to the Column spelling
  * (aggregate over concat'd feature arrays with element_at lookups)
  * but the md5s run in one tight per-row loop instead of interpreted
  * HOF lambdas. Null tokens contribute no features (the Column
  * spelling's md5(NULL)→NULL would instead poison the whole sum — the
  * native walk makes the sane choice; token arrays from `split` are
  * never null in practice). Weights ride the expression as a
  * reference object — the broadcast-model shape without a 4096-slot
  * literal in the plan.
  */
case class HashedVoteSum(child: Expression, weights: Seq[Int])
    extends UnaryExpression with ExpectsInputTypes {
  require(weights.nonEmpty, "empty weight table")
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("raw", LongType, nullable = false)))

  @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  @transient private lazy val w = weights.toArray

  private def bucket(digest: java.security.MessageDigest): Int = {
    // value of the first 13 hex chars = the first 52 bits big-endian:
    // 6 full bytes + the high nibble of byte 6 (Sampling.hash52)
    val d = digest.digest()
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(6) >> 4) & 0xfL)
    (v % w.length).toInt
  }

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val digest = md5.get()
    var raw = 0L
    var cnt = 0L
    i = 0
    while (i < n) {
      if (bytes(i) != null) {
        digest.reset(); digest.update(bytes(i))
        raw += w(bucket(digest)); cnt += 1
      }
      i += 1
    }
    i = 0
    while (i < n - 1) {
      if (bytes(i) != null && bytes(i + 1) != null) {
        digest.reset()
        digest.update(bytes(i)); digest.update('_'.toByte); digest.update(bytes(i + 1))
        raw += w(bucket(digest)); cnt += 1
      }
      i += 1
    }
    InternalRow(cnt, raw)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedVoteSum", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): HashedVoteSum =
    copy(child = newChild)
}

case class Int8Quantize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))
  def compute(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = math.abs(arr.getFloat(i).toDouble)
        if (a > scale) scale = a
      }
      i += 1
    }
    val codes = new Array[Any](n)
    i = 0
    while (i < n) {
      codes(i) = if (scale == 0.0 || arr.isNullAt(i)) 0.toByte else {
        val x = arr.getFloat(i).toDouble * 127.0 / scale
        (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toByte
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(scale, new GenericArrayData(codes))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantize", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** Nearest-centroid cell id for a float vector: argmax over the
  * (small, plan-embedded) centroid table of cosine(vec, centroid),
  * ties to the first (lowest) cell id. This is the IVF assignment
  * step as a map-only expression — the centroid table is bounded
  * (cells × dim, the same payload a broadcast would ship), so
  * embedding it in the plan costs nothing and the assignment adds
  * zero shuffles. Centroids are L2-normalized once at construction;
  * per row the argmax is then a plain dot-product sweep.
  */
case class NearestCell(child: Expression, cells: Seq[Long], centroids: Seq[Seq[Float]])
    extends UnaryExpression with ExpectsInputTypes {
  require(cells.nonEmpty && cells.length == centroids.length,
    s"NearestCell needs one cell id per centroid (got ${cells.length} ids, ${centroids.length} centroids)")
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  // sorted together by cell id so the documented lowest-id tie-break
  // holds regardless of the order the caller passes centroids in
  // (compute keeps the FIRST best, which after sorting is the lowest id)
  private val byId: Array[(Long, Seq[Float])] = cells.zip(centroids).sortBy(_._1).toArray
  private val ids: Array[Long] = byId.map(_._1)
  private val normed: Array[Array[Double]] = byId.map { case (_, c) =>
    val a = c.toArray.map(_.toDouble)
    val n = math.sqrt(a.map(x => x * x).sum)
    if (n == 0.0) a else a.map(_ / n)
  }
  def compute(arr: ArrayData): Long = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var ci = 0
    while (ci < normed.length) {
      val c = normed(ci)
      val n = math.min(arr.numElements(), c.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) dot += arr.getFloat(i) * c(i)
        i += 1
      }
      if (dot > bestDot) { bestDot = dot; best = ci }
      ci += 1
    }
    ids(best)
  }
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCell", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** Signed feature-hashing scatter: fold a stream of hash values
  * h ∈ [0, 2·dim) into a dense integer vector — index h mod dim,
  * sign +1 below dim / −1 above (Weinberger et al. 2009's hashing
  * trick, the sign split debiasing collisions). The HASHING itself
  * stays outside (the caller's md5 bucket law, already
  * oracle-replayable); this expression is pure integer scatter, so
  * the embedding components are EXACT and order-free — per-row
  * O(grams + dim), map-only, no shuffle anywhere in embedding
  * generation.
  */
case class HashedBagVector(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  def compute(arr: ArrayData): GenericArrayData = {
    val v = new Array[Int](dim)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        val idx = (h % dim).toInt
        if (h < dim) v(idx) += 1 else v(idx) -= 1
      }
      i += 1
    }
    new GenericArrayData(v.map(Integer.valueOf))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedBag", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): HashedBagVector =
    copy(child = newChild)
}

/** K-means assignment step as a map-only expression: for an INTEGER
  * vector, the (0-based) index of the nearest centroid under SQUARED
  * L2 distance plus that distance, as a struct. Centroids are
  * plan-embedded doubles (bounded k×dim — the payload a broadcast
  * would ship), so assignment adds zero shuffles and zero jobs.
  *
  * Determinism contract (what makes [[graft.operators.Clustering]]
  * hash-checkable against a SQL oracle): the distance accumulates in
  * STRICT index order — Σ_d (x_d − c_d)² left to right in doubles —
  * and a tie keeps the FIRST (lowest-index) centroid. Integer inputs
  * convert to double exactly; when centroid components are exact
  * integer-sum / count quotients (one correctly-rounded division),
  * every arithmetic step is bit-reproducible across engines.
  */
case class NearestCentroidL2(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(centroids.nonEmpty, "NearestCentroidL2 needs at least one centroid")
  override def inputTypes = Seq(ArrayType(IntegerType))
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))
  private val cent: Array[Array[Double]] = centroids.map(_.toArray).toArray
  def compute(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var ci = 0
    while (ci < cent.length) {
      val c = cent(ci)
      val n = math.min(arr.numElements(), c.length)
      var ss = 0.0
      var i = 0
      while (i < n) {
        val x = if (arr.isNullAt(i)) 0.0 else arr.getInt(i).toDouble
        val d = x - c(i)
        ss += d * d
        i += 1
      }
      if (ss < bestD) { bestD = ss; best = ci }
      ci += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestD)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidL2 =
    copy(child = newChild)
}

/** [[JaccardSim]] over arrays the caller guarantees are DISTINCT,
  * NON-NULL and SORTED ascending in UTF8String binary order (exactly
  * what `array_sort(word_shingles(...))` produces): the intersection
  * comes from one O(|A|+|B|) merge walk — no per-pair hash sets, no
  * allocation — which is what makes an n² all-pairs verify
  * ([[graft.operators.Dedup.ngramJaccardAllPairs]]) tractable.
  * Value-identical to [[JaccardSim]] on conforming input
  * (NativeExprSpec pins it); on unsorted/duplicated input the result
  * is undefined — use [[JaccardSim]].
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedJaccard", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccard =
    copy(left = l, right = r)
}

/** Exact Jaccard similarity |A∩B| / |A∪B| of two string arrays
  * (set semantics) — the n-gram dedup verify step as one hash-set
  * pass instead of interpreted array_intersect + array_union.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  def compute(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { if (!a.isNullAt(i)) sa.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    val sb = new java.util.HashSet[UTF8String](b.numElements() * 2)
    i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) {
        val e = b.getUTF8String(i)
        if (sb.add(e) && sa.contains(e)) inter += 1
      }
      i += 1
    }
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccard", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** Fraction of equal slots between two equal-length long arrays —
  * the MinHash Jaccard estimator, one loop instead of
  * zip_with + filter + size interpreted trees.
  */
case class SigMatchFraction(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    if (n == 0) 0.0 else eq.toDouble / n
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigmatch", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchFraction =
    copy(left = l, right = r)
}

/** Stopword-profile language guess over fixed per-language lexicons:
  * score = |tokens ∩ lexicon| / max(|tokens|,1); winner = max score,
  * exact ties to the largest language code (mirroring the struct-max
  * tie-break of the Column-composed form); all-zero → "und".
  */
case class LangGuess(child: Expression, lexicons: Seq[(String, Seq[String])])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  // langs sorted so equal scores resolve to the largest code, as struct
  // max over (score, lang) does
  private val ordered: Array[(UTF8String, java.util.HashSet[UTF8String])] =
    lexicons.sortBy(_._1).reverse.map { case (lang, words) =>
      val set = new java.util.HashSet[UTF8String](words.size * 2)
      words.foreach(w => set.add(UTF8String.fromString(w)))
      (UTF8String.fromString(lang), set)
    }.toArray
  private val und = UTF8String.fromString("und")
  def compute(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val denom = math.max(n, 1).toDouble
    var bestScore = 0.0
    var best: UTF8String = und
    var li = 0
    while (li < ordered.length) {
      val (lang, set) = ordered(li)
      var hits = 0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) hits += 1
        i += 1
      }
      val score = hits / denom
      if (score > bestScore) { bestScore = score; best = lang }
      li += 1
    }
    if (bestScore > 0.0) best else und
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langGuess", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): LangGuess =
    copy(child = newChild)
}

/** BigQuery's `SEARCH(data, query)` scalar — TRUE iff every token of
  * the query appears as a token of the data (BigQuery's default
  * analyzer contract: tokenize both, require full containment).
  * Tokenization here is the ASCII analyzer — lowercase, split on
  * runs of non-[a-z0-9] — one tight loop per row with no
  * intermediate arrays (compose [[NormalizeText]]/`foldAccents`
  * upstream for Unicode folding; BigQuery's full NFKC analyzer is a
  * documented divergence). An empty/token-free query matches
  * everything (vacuous truth, as BigQuery does); NULL data or query
  * yields NULL.
  */
/** IEEE-754 double division — BigQuery's IEEE_DIVIDE: ±Infinity on a
  * zero divisor, NaN for 0/0, never an error or a NULL forgery (both
  * Spark eval modes special-case a zero divisor to throw/NULL; the
  * JVM's own double division IS the IEEE semantics wanted here).
  */
case class IeeeDivide(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(a.asInstanceOf[Double] / b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $a / $b;")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IeeeDivide =
    copy(left = l, right = r)
}

case class SearchMatch(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  private def tokens(s: String): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && !isTokenChar(lower.charAt(i))) i += 1
      val start = i
      while (i < n && isTokenChar(lower.charAt(i))) i += 1
      if (i > start) out.add(lower.substring(start, i))
    }
    out
  }
  private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
  def compute(data: UTF8String, query: UTF8String): Boolean = {
    val have = tokens(data.toString)
    val want = tokens(query.toString)
    val it = want.iterator()
    while (it.hasNext) if (!have.contains(it.next())) return false
    true
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("searchMatch", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SearchMatch =
    copy(left = newLeft, right = newRight)
}

/** L2-normalized copy of a float vector (double accumulation, cast
  * back to float). Null elements normalize to 0; an all-zero vector
  * passes through unchanged. After normalization, dot(q, x̂) ranks
  * identically to cosine(q, x) per query — the identity the PQ/ADC
  * path below relies on.
  */
case class L2Normalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { val x = arr.getFloat(i).toDouble; ss += x * x }
      i += 1
    }
    val norm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i) || norm == 0.0)
          (if (norm == 0.0 && !arr.isNullAt(i)) arr.getFloat(i) else 0.0f)
        else (arr.getFloat(i).toDouble / norm).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2norm", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

/** Product-quantization encode: the vector (optionally L2-normalized
  * first) is split into m contiguous subvectors; each is replaced by
  * the index of its nearest codeword (L2 metric) in that subspace's
  * codebook. Output is the m-byte code array — for dim=64 floats and
  * m=8 that is 8 bytes per vector vs 256, a 32× narrower corpus
  * representation. Codebooks are plan-embedded (m × ksub × dsub
  * floats — the payload a broadcast would ship); ties go to the
  * lowest codeword index. The map-only encode is the write-time step
  * of the persisted-codes layout; queries never touch it.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Float]]],
                    normalize: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.nonEmpty, "PqEncode needs at least one codebook")
  require(codebooks.forall(_.nonEmpty), "PqEncode: empty codebook")
  require(codebooks.forall(_.length <= 256), "PqEncode: ksub must be <= 256 (byte codes)")
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  private val m = codebooks.length
  private val books: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray.map(_.toDouble)).toArray).toArray
  private val dsub = books(0)(0).length
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { v(i) = arr.getFloat(i).toDouble; ss += v(i) * v(i) }
      i += 1
    }
    if (normalize && ss > 0.0) {
      val norm = math.sqrt(ss)
      i = 0
      while (i < n) { v(i) /= norm; i += 1 }
    }
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var d = 0.0
        var t = 0
        while (t < c.length) {
          val x = (if (off + t < n) v(off + t) else 0.0) - c(t)
          d += x * x
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = (best & 0xff).toByte
      s += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table: lut[s·ksub + j] = dot(q_s, C_s[j]) —
  * m × ksub doubles, computed ONCE per query row (queries are tiny
  * and broadcast) so the per-corpus-row score is m array lookups
  * ([[PqAdcScore]]), not a dim-length dot product. Requires every
  * codebook to have the same ksub (the layout the lookup indexes).
  */
case class PqLut(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "PqLut: empty codebook")
  require(codebooks.map(_.length).distinct.length == 1,
    "PqLut: all codebooks must share one ksub")
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private val m = codebooks.length
  private val ksub = codebooks.head.length
  private val books: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray.map(_.toDouble)).toArray).toArray
  private val dsub = books(0)(0).length
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](m * ksub)
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * dsub
      var j = 0
      while (j < ksub) {
        val c = book(j)
        var dot = 0.0
        var t = 0
        while (t < c.length) {
          if (off + t < n && !arr.isNullAt(off + t)) dot += arr.getFloat(off + t).toDouble * c(t)
          t += 1
        }
        out(s * ksub + j) = dot
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Asymmetric-distance score: Σ_s lut[s·ksub + codes[s]] ≈ dot(query,
  * normalized corpus vector) — m lookups per corpus row, the whole
  * point of PQ. ksub is recovered from the operand shapes
  * (lut.length / codes.length), so one expression serves any (m,
  * ksub) pairing produced by [[PqEncode]]/[[PqLut]] together.
  */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(ByteType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  def compute(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val ksub = lut.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      val j = codes.getByte(s) & 0xff
      val idx = s * ksub + j
      if (j < ksub && idx < lut.numElements()) acc += lut.getDouble(idx)
      s += 1
    }
    acc
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)
}

/** Morton (z-order) interleave of two bucketed keys: output bit 2i is
  * bit i of the left key, bit 2i+1 is bit i of the right key, over the
  * low `bits` bits of each (bits ≤ 31). Monotone in each coordinate —
  * x₁ ≤ x₂ ∧ y₁ ≤ y₂ ⟹ z₁ ≤ z₂ — so sorting by z clusters rows into
  * axis-aligned rectangles of the (x, y) key space: each output file's
  * min/max stats are narrow on BOTH columns, and a predicate on EITHER
  * column prunes files/row-groups (the Delta/Iceberg OPTIMIZE ZORDER
  * layout effect). Inputs are pre-bucketed longs in [0, 2^bits) —
  * [[graft.sources.Layout.writeZOrdered]] does the min/max scaling;
  * out-of-range values are masked, nulls enter as 0 via the caller.
  */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits > 0 && bits <= 31, s"MortonInterleave: bits must be in [1,31], got $bits")
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  private val mask = (1L << bits) - 1L
  def compute(x: Long, y: Long): Long = {
    val xm = x & mask
    val ym = y & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((xm >>> i) & 1L) << (2 * i)
      z |= ((ym >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.valueOf(compute(l.asInstanceOf[Long], r.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("morton", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MortonInterleave =
    copy(left = l, right = r)
}

/** One leftmost-greedy merge pass: every adjacent (a, b) symbol pair
  * becomes the single symbol a+b, scanning left to right and skipping
  * past each merge (so [a,a,a] with pair (a,a) → [aa, a], the BPE
  * convention). One training round of [[graft.operators.Bpe]] applies
  * this map-only over the word-frequency table. Null elements are
  * dropped (absent symbols).
  */
case class MergePair(child: Expression, a: String, b: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private val ua = UTF8String.fromString(a)
  private val ub = UTF8String.fromString(b)
  private val merged = UTF8String.fromString(a + b)
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val cur = arr.getUTF8String(i)
        if (cur.equals(ua) && i + 1 < n && !arr.isNullAt(i + 1) &&
            arr.getUTF8String(i + 1).equals(ub)) {
          out.add(merged)
          i += 1 // consume both halves
        } else out.add(cur)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mergePair", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): MergePair =
    copy(child = newChild)
}

/** One combined merge pass for a SYMBOL-DISJOINT batch of pairs (no
  * two pairs share any symbol — [[graft.operators.Bpe]]'s batched
  * round selects exactly such a set). Disjointness makes occurrences
  * of different pairs non-overlapping, so a single leftmost-greedy
  * scan merging whichever pair matches equals applying the pairs'
  * [[MergePair]] passes sequentially in any order — the batched-BPE
  * soundness argument, spec-pinned. Left symbols are necessarily
  * distinct under disjointness, so the lookup is one hash probe per
  * element.
  */
case class MergePairs(child: Expression, pairs: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  require(pairs.nonEmpty, "MergePairs needs at least one pair")
  require({
    // a SELF-pair (x,x) is one symbol, not a conflict with itself —
    // disjointness is across DIFFERENT pairs
    val sets = pairs.map(p => Set(p._1, p._2))
    sets.map(_.size).sum == sets.flatten.distinct.size
  }, s"MergePairs requires symbol-disjoint pairs, got $pairs")
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val table = {
    val m = new java.util.HashMap[UTF8String, Array[UTF8String]](pairs.size * 2)
    pairs.foreach { case (a, b) =>
      m.put(UTF8String.fromString(a),
        Array(UTF8String.fromString(b), UTF8String.fromString(a + b)))
    }
    m
  }
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val cur = arr.getUTF8String(i)
        val hit = table.get(cur)
        if (hit != null && i + 1 < n && !arr.isNullAt(i + 1) &&
            arr.getUTF8String(i + 1).equals(hit(0))) {
          out.add(hit(1))
          i += 1 // consume both halves
        } else out.add(cur)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mergePairs", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): MergePairs =
    copy(child = newChild)
}

/** BPE encode: apply a ranked merge table to a symbol array the way
  * training did — repeatedly find the lowest-rank merge whose pair is
  * present and run one leftmost-greedy pass for it, until no merge
  * applies. Encoding a training word with the final merge table
  * reproduces that word's end-of-training symbols exactly (the BPE
  * round-trip invariant, pinned in BpeSpec). O(len · applied merges)
  * per row; the merge table is plan-embedded (ranks × 2 strings — the
  * payload a broadcast would ship).
  */
/** BigQuery's `FARM_FINGERPRINT`: the open-source FarmHash
  * Fingerprint64 of a STRING's UTF-8 bytes or of BYTES — BigQuery
  * documents exactly this algorithm, and Guava (already a Spark
  * dependency) ships the reference implementation, so values match
  * BigQuery bit-for-bit. THE stable-sampling/bucketing idiom
  * (`MOD(ABS(FARM_FINGERPRINT(id)), 10)`) and ML.HASH_BUCKETIZE's
  * hash. Codegen'd; null-propagating.
  */
case class FarmFingerprint(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"FARM_FINGERPRINT takes STRING or BYTES, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  def compute(input: Any): Long = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
      case other => throw new IllegalArgumentException(
        s"FARM_FINGERPRINT takes STRING or BYTES, got $other")
    }
    com.google.common.hash.Hashing.farmHashFingerprint64()
      .hashBytes(bytes).asLong()
  }
  override def nullSafeEval(input: Any): Any = java.lang.Long.valueOf(compute(input))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("farmFp", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): FarmFingerprint =
    copy(child = newChild)
}

/** Viterbi segmentation of one WORD under a unigram piece table
  * (piece → natural-log probability) — the decode half of the
  * SentencePiece unigram LM ([[graft.operators.Unigram]]; Kudo 2018).
  * Maximum-log-probability split via left-to-right DP over character
  * positions with backpointers; ties break to the LONGER incoming
  * piece, then the later split point — fully deterministic.
  * Characters absent from the table segment as single-char unknowns
  * at [[UnigramSegment.UnknownLogp]] (training always keeps every
  * seen single char, so this only fires on foreign text). Per-word
  * cost O(len × maxPieceLen) hash probes — map-only at scale.
  */
case class UnigramSegment(child: Expression, pieces: Seq[(String, Double)])
    extends UnaryExpression with ExpectsInputTypes {
  require(pieces.nonEmpty, "UnigramSegment needs a piece table")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val table = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, lp) => m.putIfAbsent(p, lp) }
    m
  }
  @transient private lazy val maxLen = pieces.iterator.map(_._1.length).max
  def compute(w0: UTF8String): ArrayData = {
    val w = w0.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val score = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(score, Double.NegativeInfinity)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (score(j) > Double.NegativeInfinity) {
          val piece = w.substring(j, i)
          val lp = table.get(piece)
          val s =
            if (lp != null) score(j) + lp.doubleValue()
            else if (i - j == 1) score(j) + UnigramSegment.UnknownLogp
            else Double.NegativeInfinity
          // strictly greater: j ascends, so on a tie the FIRST (small
          // j = longer incoming piece) candidate stands — deterministic
          if (s > score(i)) { score(i) = s; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var k = n
    while (k > 0) { out += UTF8String.fromString(w.substring(back(k), k)); k = back(k) }
    new GenericArrayData(out.reverseIterator.toArray)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegment", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramSegment {
  /** Floor score for characters outside the table (SentencePiece's
    * unknown penalty) — worse than any real piece so known pieces
    * always win.
    */
  val UnknownLogp: Double = -100.0
}

/** SUBWORD REGULARIZATION (Kudo 2018's headline contribution): sample
  * a segmentation from the word's k-best list with probability
  * ∝ exp(alpha × logP) — the training-data augmentation that makes
  * subword models robust to segmentation ambiguity. RNG-FREE, the
  * repo's sampling discipline: the uniform draw is the first 8 bytes
  * of md5(word ‖ 0x00 ‖ salt), so results are deterministic per
  * (word, salt), partition-order invariant, and resampling means
  * changing the salt (epoch number, doc id). k-best via the standard
  * per-position top-k DP (ties: score desc, then shorter backpointer
  * list order — deterministic); alpha → ∞ degenerates to Viterbi,
  * alpha = 0 is uniform over the k-best list.
  */
case class UnigramSample(left: Expression, right: Expression,
                         pieces: Seq[(String, Double)], k: Int, alpha: Double)
    extends BinaryExpression with ExpectsInputTypes {
  require(pieces.nonEmpty, "UnigramSample needs a piece table")
  require(k >= 1, s"k must be >= 1, got $k")
  require(alpha >= 0.0, s"alpha must be >= 0, got $alpha")
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val table = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, lp) => m.putIfAbsent(p, lp) }
    m
  }
  @transient private lazy val maxLen = pieces.iterator.map(_._1.length).max

  /** The word's k-best segmentations, best first: (score, pieces). */
  def kBest(w: String): Seq[(Double, Seq[String])] = {
    val n = w.length
    if (n == 0) return Seq((0.0, Seq.empty))
    // states(i): up to k of (score, fromPos, fromRank), sorted best-first
    val states = Array.fill(n + 1)(Seq.empty[(Double, Int, Int)])
    states(0) = Seq((0.0, -1, -1))
    var i = 1
    while (i <= n) {
      val cand = scala.collection.mutable.ArrayBuffer.empty[(Double, Int, Int)]
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val piece = w.substring(j, i)
        val lp = table.get(piece)
        val plp =
          if (lp != null) lp.doubleValue()
          else if (i - j == 1) UnigramSegment.UnknownLogp
          else Double.NaN
        if (!plp.isNaN) {
          var r = 0
          val sj = states(j)
          while (r < sj.length) {
            cand += ((sj(r)._1 + plp, j, r))
            r += 1
          }
        }
        j += 1
      }
      // deterministic top-k: score desc, then smaller fromPos (longer
      // final piece), then smaller rank
      states(i) = cand.sortBy { case (s, j2, r) => (-s, j2, r) }.take(k).toSeq
      i += 1
    }
    states(n).map { case (s, _, _) => s }.zipWithIndex.map { case (s, rank) =>
      // reconstruct the rank-th path
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = n; var r = rank
      while (pos > 0) {
        val (_, j2, r2) = states(pos)(r)
        out += w.substring(j2, pos)
        pos = j2; r = r2
      }
      (s, out.reverse.toSeq)
    }
  }

  def compute(w0: UTF8String, salt0: UTF8String): ArrayData = {
    val w = w0.toString
    val best = kBest(w)
    val pick =
      if (best.size == 1) 0
      else {
        // deterministic uniform from md5(word \0 salt)
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(w0.getBytes)
        md.update(0.toByte)
        md.update(salt0.getBytes)
        val d = md.digest()
        var bits = 0L
        var b = 0
        while (b < 8) { bits = (bits << 8) | (d(b) & 0xffL); b += 1 }
        val u = (bits >>> 11).toDouble / (1L << 53).toDouble // [0, 1)
        // softmax(alpha * score) over the k-best, max-shifted
        val mx = best.iterator.map(_._1).max
        val ws = best.map { case (s, _) => math.exp(alpha * (s - mx)) }
        val total = ws.sum
        var acc = 0.0; var idx = 0; var chosen = -1
        while (idx < ws.length && chosen < 0) {
          acc += ws(idx) / total
          if (u < acc) chosen = idx
          idx += 1
        }
        if (chosen < 0) ws.length - 1 // float-edge: u ≈ 1
        else chosen
      }
    new GenericArrayData(best(pick)._2.map(UTF8String.fromString).toArray[Any])
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSample", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UnigramSample =
    copy(left = l, right = r)
}

case class ApplyBpe(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private val rank = {
    val m = new java.util.HashMap[(UTF8String, UTF8String), Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      m.putIfAbsent((UTF8String.fromString(a), UTF8String.fromString(b)), r)
    }
    m
  }
  private val mergedSym: Array[UTF8String] =
    merges.map { case (a, b) => UTF8String.fromString(a + b) }.toArray
  private val pairs: Array[(UTF8String, UTF8String)] =
    merges.map { case (a, b) => (UTF8String.fromString(a), UTF8String.fromString(b)) }.toArray
  def compute(arr: ArrayData): ArrayData = {
    var syms = new java.util.ArrayList[UTF8String](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) syms.add(arr.getUTF8String(i))
      i += 1
    }
    var done = false
    while (!done && syms.size > 1) {
      // lowest-rank applicable merge
      var best = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get((syms.get(j), syms.get(j + 1)))
        if (r != null && (best == -1 || r < best)) best = r
        j += 1
      }
      if (best == -1) done = true
      else {
        val (pa, pb) = pairs(best)
        val out = new java.util.ArrayList[UTF8String](syms.size)
        j = 0
        while (j < syms.size) {
          if (j + 1 < syms.size && syms.get(j).equals(pa) && syms.get(j + 1).equals(pb)) {
            out.add(mergedSym(best)); j += 2
          } else { out.add(syms.get(j)); j += 1 }
        }
        syms = out
      }
    }
    val res = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { res(k) = syms.get(k); k += 1 }
    new GenericArrayData(res)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("applyBpe", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): ApplyBpe =
    copy(child = newChild)
}

/** Unicode normalization (UAX #15, via `java.text.Normalizer`) as a
  * codegen'd expression — the corpus-canonicalization stage every
  * text pipeline runs before hashing/dedup (CCNet normalizes first;
  * without it byte-variant spellings of the SAME text — composed vs
  * combining-mark accents, compatibility ligatures — defeat every
  * hash family from C1 to MinHash). Forms NFC/NFD/NFKC/NFKD; the
  * already-normalized fast path returns the input UTF8String without
  * allocating (the common case on clean corpora — `isNormalized` is a
  * single scan). DuckDB's `nfc_normalize` replays the NFC face
  * byte-for-byte (both implement UAX #15), which is what puts the
  * driver face under a hash oracle.
  */
case class NormalizeText(child: Expression, form: String,
                         casefold: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown Unicode normalization form $form (NFC/NFD/NFKC/NFKD)")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (!casefold) {
      if (java.text.Normalizer.isNormalized(str, f)) s
      else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
    } else {
      // BigQuery's NORMALIZE_AND_CASEFOLD: normalize, then fold case.
      // JDK approximation of Unicode full case folding: the
      // upper-then-lower round trip (catches ß→ss, ligature splits
      // that lower() alone misses); exotic locale-sensitive folds may
      // differ from ICU — stated, not hidden.
      val n = if (java.text.Normalizer.isNormalized(str, f)) str
        else java.text.Normalizer.normalize(str, f)
      val folded = n.toUpperCase(java.util.Locale.ROOT)
        .toLowerCase(java.util.Locale.ROOT)
      if (folded == str) s else UTF8String.fromString(folded)
    }
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normText", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Geohash base32 cell id of a (lng, lat) point — BigQuery
  * ST_GEOHASH's deterministic spatial bucketing verb (the 100 TB use:
  * a GROUP BY / join key that co-locates nearby points without a
  * spatial index). Bits alternate lng-first; each coordinate
  * quantizes by the FIXED IEEE fold `floor((v + off) / span * 2^bits)`
  * clamped to the top cell — +, /, * and floor are correctly-rounded
  * IEEE ops, so a DuckDB oracle spelling the identical fold matches
  * bit-for-bit (no libm anywhere). At cell boundaries this fold can
  * differ from a bisection-loop implementation by one ulp's worth of
  * cell — stated; reference geohash libraries quantize the same way.
  */
case class StGeohash(lng: Expression, lat: Expression, nchars: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(nchars >= 1 && nchars <= 12,
    s"ST_GEOHASH maxchars must be in [1, 12], got $nchars")
  override def left: Expression = lng
  override def right: Expression = lat
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = StringType
  private val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  def compute(x: Double, y: Double): UTF8String = {
    val total = 5 * nchars
    val lngBits = (total + 1) / 2
    val latBits = total / 2
    def quant(v: Double, off: Double, span: Double, bits: Int): Long = {
      val q = math.floor((v + off) / span * (1L << bits).toDouble).toLong
      math.max(0L, math.min((1L << bits) - 1L, q))
    }
    val lq = quant(x, 180.0, 360.0, lngBits)
    val aq = quant(y, 90.0, 180.0, latBits)
    var b = 0L
    var p = 0; var li = lngBits - 1; var ai = latBits - 1
    while (p < total) {
      val bit =
        if (p % 2 == 0) { val v = (lq >> li) & 1L; li -= 1; v }
        else { val v = (aq >> ai) & 1L; ai -= 1; v }
      b = (b << 1) | bit
      p += 1
    }
    val sb = new java.lang.StringBuilder(nchars)
    var c = nchars - 1
    while (c >= 0) {
      sb.append(alphabet.charAt(((b >> (5 * c)) & 31L).toInt))
      c -= 1
    }
    UTF8String.fromString(sb.toString)
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[Double], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stGeohash", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StGeohash =
    copy(lng = l, lat = r)
}

/** WKT renderer over BOTH geography carriers — the point
  * STRUCT<lng, lat> and the line/ring ARRAY<STRUCT<lng, lat>> (the
  * round-15 non-point core; see BigQuery's ST_ASTEXT). The carrier
  * type dispatches at ANALYSIS time (struct → POINT, array → line or
  * ring), and a closed ring of ≥ 4 vertices renders as POLYGON((…)) —
  * the only value-level distinction the one-array carrier leaves, and
  * exactly the shape [[GeogFromText]] parses back. Coordinates print
  * through `Double.toString`, the same shortest-or-Java form Spark's
  * own double→string cast uses on this JVM, so the point rendering is
  * byte-identical to the round-14 textual CAST path it replaces.
  * Empty arrays render BigQuery's empty-geography spelling.
  */
case class GeogAsText(child: Expression, geojson: Boolean = false)
    extends UnaryExpression {
  private def isPointStruct(s: StructType): Boolean =
    // the field NAMES gate too: a STRUCT<lat, lng> (or any unrelated
    // two-double struct) must fail at analysis, not render silently
    // with transposed coordinates
    s.fields.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
      s.fields(0).name.equalsIgnoreCase("lng") &&
      s.fields(1).name.equalsIgnoreCase("lat")
  private def fn = if (geojson) "ST_ASGEOJSON" else "ST_ASTEXT"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if isPointStruct(s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(s: StructType, _) if isPointStruct(s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$fn expects the STRUCT<lng, lat> point carrier or the " +
          s"ARRAY<STRUCT<lng, lat>> line/ring carrier, got ${other.simpleString}")
    }
  override def dataType: DataType = StringType
  private lazy val isArray = child.dataType.isInstanceOf[ArrayType]
  private def pt(sb: java.lang.StringBuilder, lng: Double, lat: Double): Unit =
    if (geojson)
      sb.append('[').append(java.lang.Double.toString(lng)).append(',')
        .append(java.lang.Double.toString(lat)).append(']')
    else
      sb.append(java.lang.Double.toString(lng)).append(' ')
        .append(java.lang.Double.toString(lat))
  def compute(v: Any): UTF8String = {
    val sb = new java.lang.StringBuilder(32)
    if (!isArray) {
      val r = v.asInstanceOf[InternalRow]
      if (geojson) {
        sb.append("{\"type\":\"Point\",\"coordinates\":")
        pt(sb, r.getDouble(0), r.getDouble(1))
        sb.append('}')
      } else {
        sb.append("POINT(")
        pt(sb, r.getDouble(0), r.getDouble(1))
        sb.append(')')
      }
    } else {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n == 0)
        sb.append(if (geojson) "{\"type\":\"GeometryCollection\",\"geometries\":[]}"
          else "GEOMETRYCOLLECTION EMPTY")
      else {
        val first = a.getStruct(0, 2)
        val last = a.getStruct(n - 1, 2)
        val ring = n >= 4 && first.getDouble(0) == last.getDouble(0) &&
          first.getDouble(1) == last.getDouble(1)
        if (geojson)
          sb.append(if (ring) "{\"type\":\"Polygon\",\"coordinates\":[["
            else if (n == 1) "{\"type\":\"Point\",\"coordinates\":"
            else "{\"type\":\"LineString\",\"coordinates\":[")
        else
          sb.append(if (ring) "POLYGON((" else if (n == 1) "POINT(" else "LINESTRING(")
        var i = 0
        while (i < n) {
          if (i > 0) sb.append(if (geojson) "," else ", ")
          val r = a.getStruct(i, 2)
          pt(sb, r.getDouble(0), r.getDouble(1))
          i += 1
        }
        if (geojson) sb.append(if (ring) "]]}" else if (n == 1) "}" else "]}")
        else sb.append(if (ring) "))" else ")")
      }
    }
    UTF8String.fromString(sb.toString)
  }
  override def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geogAsText", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): GeogAsText =
    copy(child = newChild)
}

/** WKT parser for the ARRAY<STRUCT<lng, lat>> carrier — the OGC
  * SQL/MM spellings ST_LINEFROMTEXT / ST_POLYGONFROMTEXT (BigQuery's
  * single ST_GEOGFROMTEXT cannot serve the non-point carriers: its
  * return type would have to depend on the VALUE of its argument, and
  * SQL expressions are single-typed — so the engine routes each
  * carrier through its own standard name, and the POINT-only
  * ST_GEOGFROMTEXT's raise message points here). LINESTRING parses to
  * the open vertex array; POLYGON parses its single outer ring,
  * closed-as-written (first = last enforced, ≥ 4 vertices). Holes
  * (a second ring) and MULTI* are loud — stated, not silently the
  * outer ring. Coordinates parse through `Double.parseDouble` after a
  * strict WKT-numeric check, the exact inverse of [[GeogAsText]]'s
  * rendering, so parse(render(g)) = g bit-for-bit FOR EACH value
  * class under its own parser: OPEN arrays round-trip through
  * ST_LINEFROMTEXT, closed ≥4-vertex arrays render as POLYGON and
  * round-trip through ST_POLYGONFROMTEXT (the single-carrier
  * convention: a closed array IS a ring — a "closed linestring" has
  * no distinct representation on this carrier; stated).
  */
case class GeogFromText(child: Expression, polygon: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("lng", DoubleType, nullable = false),
      StructField("lat", DoubleType, nullable = false))), containsNull = false)
  private val fn = if (polygon) "ST_POLYGONFROMTEXT" else "ST_LINEFROMTEXT"
  private def fail(wkt: String, why: String): Nothing =
    throw new IllegalArgumentException(s"$fn: $why, got '$wkt'")
  // WKT numeric tokens only: plain decimal with optional exponent.
  // Java's parseDouble is far more lenient ('1d', '0x1p3', 'NaN',
  // 'Infinity') — none of those are WKT and all must fail loud.
  private val WktNum = """[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?""".r
  private def parseRing(wkt: String, body: String): Array[InternalRow] = {
    val parts = body.split(",")
    val out = new Array[InternalRow](parts.length)
    var i = 0
    while (i < parts.length) {
      val xy = parts(i).trim.split("\\s+")
      if (xy.length != 2) fail(wkt, s"vertex ${i + 1} is not 'lng lat'")
      if (!WktNum.matches(xy(0)) || !WktNum.matches(xy(1)))
        fail(wkt, s"vertex ${i + 1} has a non-numeric coordinate")
      out(i) = InternalRow(xy(0).toDouble, xy(1).toDouble)
      i += 1
    }
    out
  }
  def compute(s: UTF8String): GenericArrayData = {
    val wkt = s.toString.trim
    val upper = wkt.toUpperCase(java.util.Locale.ROOT)
    if (!polygon) {
      if (!upper.startsWith("LINESTRING"))
        fail(wkt, "only LINESTRING(lng lat, ...) WKT is supported")
      // the body must follow the keyword directly (whitespace aside) —
      // 'LINESTRINGZ(...)' and friends are malformed, not lenient
      val rest = wkt.substring("LINESTRING".length).trim
      if (!rest.startsWith("(") || !rest.endsWith(")"))
        fail(wkt, "malformed LINESTRING body")
      val body = rest.substring(1, rest.length - 1)
      if (body.contains("(")) fail(wkt, "nested rings are not a LINESTRING")
      val ring = parseRing(wkt, body)
      if (ring.length < 2) fail(wkt, "a LINESTRING needs at least 2 vertices")
      new GenericArrayData(ring.asInstanceOf[Array[Any]])
    } else {
      if (!upper.startsWith("POLYGON"))
        fail(wkt, "only POLYGON((lng lat, ...)) WKT is supported")
      val rest = wkt.substring("POLYGON".length).trim
      if (!rest.startsWith("((") || !rest.endsWith("))"))
        fail(wkt, "malformed POLYGON body")
      val body = rest.substring(2, rest.length - 2)
      if (body.contains(")"))
        fail(wkt, "multi-ring polygons (holes) are not supported — outer ring only")
      val ring = parseRing(wkt, body)
      if (ring.length < 4) fail(wkt, "a POLYGON ring needs at least 4 vertices (closed)")
      if (ring.head.getDouble(0) != ring.last.getDouble(0) ||
        ring.head.getDouble(1) != ring.last.getDouble(1))
        fail(wkt, "the POLYGON ring must be closed (first vertex = last)")
      new GenericArrayData(ring.asInstanceOf[Array[Any]])
    }
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geogFromText", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): GeogFromText =
    copy(child = newChild)
}

/** The 2-argument `DATETIME(a, b)` overloads that textual rewriting
  * cannot split: BigQuery dispatches `DATETIME(date, time)` (combine
  * two civil values) vs `DATETIME(timestamp, timezone)` (project the
  * instant into the zone) on ARGUMENT TYPES. The rewriter routes
  * quoted-LITERAL second arguments through the established textual
  * from_utc_timestamp path (q_tz_ops' form, unchanged); every other
  * 2-arg spelling lands here and dispatches at ANALYSIS time:
  *  - (DATE, TIME-carrier _NTZ)  → days·86 400 000 000 + time micros
  *  - (TIMESTAMP, STRING column) → the zone's wall clock via
  *    java.time rules (the same tzdata from_utc_timestamp uses)
  */
case class CivilDatetime2(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val combineMode = left.dataType == DateType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DateType, TimestampNTZType) | (TimestampType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"DATETIME(a, b) takes (DATE, TIME) or (TIMESTAMP, timezone STRING), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = TimestampNTZType
  def compute(a: Any, b: Any): Long =
    if (combineMode) a.asInstanceOf[Int].toLong * 86400000000L + b.asInstanceOf[Long]
    else {
      val micros = a.asInstanceOf[Long]
      val zone = java.time.ZoneId.of(b.asInstanceOf[UTF8String].toString)
      val instant = java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
      val ldt = java.time.LocalDateTime.ofInstant(instant, zone)
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    }
  override def nullSafeEval(a: Any, b: Any): Any = java.lang.Long.valueOf(compute(a, b))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("civilDt2", this)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute(((Object) $a), ((Object) $b));")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CivilDatetime2 =
    copy(left = l, right = r)
}

/** Column wrappers + SQL registration for the native expressions. */
object native {
  private def arity(fn: String, es: Seq[Expression], n: Int): Unit =
    require(es.length == n, s"$fn expects $n arguments, got ${es.length}")

  private def constStr(fn: String, es: Seq[Expression], i: Int): String = {
    require(es.length > i, s"$fn expects ${i + 1} arguments, got ${es.length}")
    require(es(i).foldable, s"$fn argument ${i + 1} must be a constant string")
    es(i).eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be a string, got $other")
    }
  }

  private def constBool(fn: String, es: Seq[Expression], i: Int): Boolean = {
    require(es.length > i, s"$fn expects ${i + 1} arguments, got ${es.length}")
    require(es(i).foldable, s"$fn argument ${i + 1} must be a constant boolean")
    es(i).eval() match {
      case b: Boolean => b
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be a boolean, got $other")
    }
  }

  private def constInt(fn: String, es: Seq[Expression], i: Int): Int = {
    require(es.length > i, s"$fn expects ${i + 1} arguments, got ${es.length}")
    require(es(i).foldable, s"$fn argument ${i + 1} must be a constant")
    es(i).eval() match {
      case n: Int => n
      case n: Long => n.toInt
      case other => throw new IllegalArgumentException(
        s"$fn argument ${i + 1} must be an integer, got $other")
    }
  }

  def normalize_text(s: Column, form: String): Column =
    Bridge.column(NormalizeText(Bridge.expression(s), form))
  def public_suffix(host: Column): Column =
    Bridge.column(RegistrableDomain(Bridge.expression(host), "suffix"))
  def reg_domain(host: Column): Column =
    Bridge.column(RegistrableDomain(Bridge.expression(host), "reg_domain"))
  def search(data: Column, query: Column): Column =
    Bridge.column(SearchMatch(Bridge.expression(data), Bridge.expression(query)))
  def minhash_signature(tokens: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), k))
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
  def window_md5(tokens: Column, k: Int): Column =
    Bridge.column(WindowMd5(Bridge.expression(tokens), k))
  def hashed_vote_sum(tokens: Column, weights: Seq[Int]): Column =
    Bridge.column(HashedVoteSum(Bridge.expression(tokens), weights))
  def rebuild_spans(tokens: Column, starts: Column, k: Int): Column =
    Bridge.column(RebuildSpans(Bridge.expression(tokens), Bridge.expression(starts), k))
  def word_shingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), n))
  def dup_ngram_coverage(tokens: Column, ns: Seq[Int]): Column =
    Bridge.column(DupNGramCoverage(Bridge.expression(tokens), ns))
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  def vec_distance(a: Column, b: Column, mode: String): Column =
    Bridge.column(VecDistance(Bridge.expression(a), Bridge.expression(b),
      mode.toUpperCase(java.util.Locale.ROOT)))
  def hyperplane_sig(vec: Column, planes: Int, seed: Long = 42L): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(vec), planes, seed))
  def sorted_jaccard(a: Column, b: Column): Column =
    Bridge.column(SortedJaccard(Bridge.expression(a), Bridge.expression(b)))
  def jaccard_sim(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))
  def sig_match_fraction(a: Column, b: Column): Column =
    Bridge.column(SigMatchFraction(Bridge.expression(a), Bridge.expression(b)))
  def lang_guess(tokens: Column, lexicons: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangGuess(Bridge.expression(tokens), lexicons))
  def nearest_cell(vec: Column, cells: Seq[Long], centroids: Seq[Array[Float]]): Column =
    Bridge.column(NearestCell(Bridge.expression(vec), cells, centroids.map(_.toSeq)))
  def nearest_centroid_l2(vec: Column, centroids: Seq[Seq[Double]]): Column =
    Bridge.column(NearestCentroidL2(Bridge.expression(vec), centroids))
  def hashed_bag_vector(hashes: Column, dim: Int): Column =
    Bridge.column(HashedBagVector(Bridge.expression(hashes), dim))
  def strided_bytes(payload: Column, n: Int): Column =
    Bridge.column(StridedBytes(Bridge.expression(payload), n))
  def ahash64(payload: Column, thumbBytes: Int): Column =
    Bridge.column(AHash64(Bridge.expression(payload), thumbBytes))
  def int8_quantize(vec: Column): Column =
    Bridge.column(Int8Quantize(Bridge.expression(vec)))
  def l2_normalize(vec: Column): Column =
    Bridge.column(L2Normalize(Bridge.expression(vec)))
  def pq_encode(vec: Column, codebooks: Seq[Seq[Seq[Float]]],
                normalize: Boolean = true): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), codebooks, normalize))
  def pq_lut(qvec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column =
    Bridge.column(PqLut(Bridge.expression(qvec), codebooks))
  def pq_adc(codes: Column, lut: Column): Column =
    Bridge.column(PqAdcScore(Bridge.expression(codes), Bridge.expression(lut)))
  def morton_interleave(x: Column, y: Column, bits: Int): Column =
    Bridge.column(MortonInterleave(Bridge.expression(x), Bridge.expression(y), bits))
  def merge_pair(symbols: Column, a: String, b: String): Column =
    Bridge.column(MergePair(Bridge.expression(symbols), a, b))

  def merge_pairs(symbols: Column, pairs: Seq[(String, String)]): Column =
    Bridge.column(MergePairs(Bridge.expression(symbols), pairs))
  def unigram_segment(word: Column, pieces: Seq[(String, Double)]): Column =
    Bridge.column(UnigramSegment(Bridge.expression(word), pieces))

  def unigram_sample(word: Column, salt: Column, pieces: Seq[(String, Double)],
                     k: Int, alpha: Double): Column =
    Bridge.column(UnigramSample(Bridge.expression(word), Bridge.expression(salt),
      pieces, k, alpha))

  def apply_bpe(symbols: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(ApplyBpe(Bridge.expression(symbols), merges))
  /** Inverse of `int8_quantize`: codeᵢ·scale/127 as double. The lambda
    * body only dereferences the two staged struct fields, so keep the
    * quantized struct as its OWN projection column (HOF lambdas are
    * interpreted; see Dedup's perf note).
    */
  def int8_dequantize(q: Column): Column = {
    import org.apache.spark.sql.functions._
    transform(q.getField("codes"),
      c => c.cast("double") * q.getField("scale") / lit(127.0))
  }

  /** (name, usage, arity-validated builder) for every SQL-exposed
    * function — the ONE list both registration paths consume
    * (`registerAll` below and `graft.GraftExtensions`' injection), so
    * their behavior cannot drift. Wrong arity surfaces as an
    * IllegalArgumentException with the function's name, not an
    * IndexOutOfBounds deep in planning.
    */
  val sqlFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_minhash", "graft_minhash(tokens, k) - MinHash signature of a string array",
      es => { arity("graft_minhash", es, 2); MinHashSignature(es.head, constInt("graft_minhash", es, 1)) }),
    ("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash of a string array",
      es => { arity("graft_simhash", es, 1); SimHash64(es.head) }),
    ("graft_shingles", "graft_shingles(tokens, n) - distinct word n-grams",
      es => { arity("graft_shingles", es, 2); WordShingles(es.head, constInt("graft_shingles", es, 1)) }),
    ("graft_cosine", "graft_cosine(a, b) - cosine similarity of float vectors",
      es => { arity("graft_cosine", es, 2); CosineSim(es.head, es(1)) }),
    ("graft_vec_distance",
      "graft_vec_distance(a, b, 'EUCLIDEAN'|'COSINE'|'DOT_PRODUCT') - BigQuery vector distance",
      es => { arity("graft_vec_distance", es, 3)
        VecDistance(es.head, es(1),
          constStr("graft_vec_distance", es, 2).toUpperCase(java.util.Locale.ROOT)) }),
    ("graft_jaccard", "graft_jaccard(a, b) - exact Jaccard of string arrays",
      es => { arity("graft_jaccard", es, 2); JaccardSim(es.head, es(1)) }),
    ("graft_int8_quantize", "graft_int8_quantize(vec) - (scale, int8 codes) of a float vector",
      es => { arity("graft_int8_quantize", es, 1); Int8Quantize(es.head) }),
    ("graft_normalize", "graft_normalize(s, 'NFC'|'NFD'|'NFKC'|'NFKD') - Unicode normalization",
      es => { arity("graft_normalize", es, 2)
        NormalizeText(es.head,
          constStr("graft_normalize", es, 1).toUpperCase(java.util.Locale.ROOT)) }),
    ("graft_public_suffix", "graft_public_suffix(host) - PSL public suffix of a host",
      es => { arity("graft_public_suffix", es, 1); RegistrableDomain(es.head, "suffix") }),
    ("graft_reg_domain", "graft_reg_domain(host) - PSL registrable domain of a host",
      es => { arity("graft_reg_domain", es, 1); RegistrableDomain(es.head, "reg_domain") }),
    ("graft_farm_fingerprint",
      "graft_farm_fingerprint(x) - FarmHash Fingerprint64 of STRING/BYTES (BigQuery FARM_FINGERPRINT)",
      es => { arity("graft_farm_fingerprint", es, 1); FarmFingerprint(es.head) }),
    ("graft_approx_top_sum",
      "graft_approx_top_sum(item, weight, k[, capacity]) - weighted SpaceSaving top-k (APPROX_TOP_SUM)",
      es => { require(es.length == 3 || es.length == 4,
          s"graft_approx_top_sum expects (item, weight, k[, capacity]), got ${es.length} arguments")
        val k = constInt("graft_approx_top_sum", es, 2)
        val cap = if (es.length == 4) constInt("graft_approx_top_sum", es, 3)
          else math.max(k * 25, 1000)
        ApproxTopSumAgg(es.head, es(1), k, cap) }),
    // BigQuery's BYTES digests for the GraftSql MD5/SHA1 rewrites —
    // registry-routed (not textual unhex(md5(...))) because the
    // dialect scanner would re-match the self-named inner call on its
    // next fixpoint pass and wrap it again
    ("graft_md5_bytes", "graft_md5_bytes(x) - MD5 digest as BYTES (BigQuery MD5)",
      es => { arity("graft_md5_bytes", es, 1)
        org.apache.spark.sql.catalyst.expressions.Unhex(
          org.apache.spark.sql.catalyst.expressions.Md5(es.head)) }),
    ("graft_sha1_bytes", "graft_sha1_bytes(x) - SHA1 digest as BYTES (BigQuery SHA1)",
      es => { arity("graft_sha1_bytes", es, 1)
        org.apache.spark.sql.catalyst.expressions.Unhex(
          org.apache.spark.sql.catalyst.expressions.Sha1(es.head)) }),
    // BigQuery DIV: integer division truncating toward zero — the
    // GraftSql rewrite routes here because the bare `div` operator
    // spelling would re-match the dialect scanner (the MD5 lesson)
    ("graft_integral_div", "graft_integral_div(x, y) - INT64 division truncating toward zero (BigQuery DIV)",
      es => { arity("graft_integral_div", es, 2)
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(es.head, es(1)) }),
    // IEEE-754 double division (Infinity/NaN, never an error or a
    // NULL) — both Spark eval modes special-case a zero divisor, so
    // the dedicated codegen'd expression carries BigQuery's semantics
    ("graft_ieee_divide", "graft_ieee_divide(x, y) - IEEE double division (BigQuery IEEE_DIVIDE)",
      es => { arity("graft_ieee_divide", es, 2); IeeeDivide(es.head, es(1)) }),
    // JSON constructors (jsonmut.scala)
    ("graft_json_object",
      "graft_json_object(k1, v1, ...) - build a JSON object from alternating pairs (JSON_OBJECT)",
      es => { require(es.length % 2 == 0,
          s"graft_json_object expects alternating (key, value) arguments, got ${es.length}")
        JsonBuild(es, isObject = true) }),
    ("graft_json_array",
      "graft_json_array(v1, ...) - build a JSON array (JSON_ARRAY)",
      es => JsonBuild(es, isObject = false)),
    ("graft_parse_json",
      "graft_parse_json(s) - validate + canonicalize JSON text (PARSE_JSON; invalid is loud)",
      es => { arity("graft_parse_json", es, 1); JsonCanon(es.head, safe = false) }),
    ("graft_try_parse_json",
      "graft_try_parse_json(s) - validate + canonicalize JSON text (SAFE.PARSE_JSON; invalid is NULL)",
      es => { arity("graft_try_parse_json", es, 1); JsonCanon(es.head, safe = true) }),
    // the JSON mutator family (jsonmut.scala) — registry-routed so
    // the dialect scanner's rewritten output never re-matches
    ("graft_json_set",
      "graft_json_set(json, '<path>', value) - set one path in JSON text (JSON_SET)",
      es => { arity("graft_json_set", es, 3)
        JsonSet(es.head, es(2), constStr("graft_json_set", es, 1)) }),
    ("graft_json_remove",
      "graft_json_remove(json, '<path>') - remove one path from JSON text (JSON_REMOVE)",
      es => { arity("graft_json_remove", es, 2)
        JsonRemove(es.head, constStr("graft_json_remove", es, 1)) }),
    ("graft_json_array_append",
      "graft_json_array_append(json, '<path>', value) - append to the array at path (JSON_ARRAY_APPEND)",
      es => { arity("graft_json_array_append", es, 3)
        JsonArrayAppend(es.head, es(2), constStr("graft_json_array_append", es, 1)) }),
    ("graft_json_strip_nulls",
      "graft_json_strip_nulls(json) - remove JSON nulls recursively (JSON_STRIP_NULLS)",
      es => { arity("graft_json_strip_nulls", es, 1); JsonStripNulls(es.head) }),
    ("graft_json_insert",
      "graft_json_insert(json, '<path>', value) - create-only set (JSON_INSERT)",
      es => { arity("graft_json_insert", es, 3)
        JsonSet(es.head, es(2), constStr("graft_json_insert", es, 1), mode = "insert") }),
    ("graft_json_replace",
      "graft_json_replace(json, '<path>', value) - overwrite-only set (JSON_REPLACE)",
      es => { arity("graft_json_replace", es, 3)
        JsonSet(es.head, es(2), constStr("graft_json_replace", es, 1), mode = "replace") }),
    ("graft_json_array_insert",
      "graft_json_array_insert(json, '<path>[i]', value) - shifting array insert (JSON_ARRAY_INSERT)",
      es => { arity("graft_json_array_insert", es, 3)
        JsonArrayInsert(es.head, es(2), constStr("graft_json_array_insert", es, 1)) }),
    ("graft_json_type",
      "graft_json_type(json) - object/array/string/number/boolean/null (JSON_TYPE)",
      es => { arity("graft_json_type", es, 1); JsonTypeOf(es.head) }),
    ("graft_json_pretty",
      "graft_json_pretty(json) - BigQuery pretty_print rendering (TO_JSON_STRING(x, true))",
      es => { arity("graft_json_pretty", es, 1); JsonPretty(es.head) }),
    ("graft_json_keys",
      "graft_json_keys(json, max_depth, 'mode') - sorted unique dotted key paths (JSON_KEYS)",
      es => { arity("graft_json_keys", es, 3)
        JsonKeys(es.head, constInt("graft_json_keys", es, 1),
          constStr("graft_json_keys", es, 2)) }),
    // the STRICT typed accessors (BOOL/INT64/FLOAT64/STRING over JSON;
    // the boolean argument is the SAFE. spelling)
    ("graft_json_bool",
      "graft_json_bool(json, safe) - strict boolean accessor (BOOL / SAFE.BOOL)",
      es => { arity("graft_json_bool", es, 2)
        JsonStrictAccess(es.head, "BOOL", constBool("graft_json_bool", es, 1)) }),
    ("graft_json_int64",
      "graft_json_int64(json, safe) - strict INT64 accessor (INT64 / SAFE.INT64)",
      es => { arity("graft_json_int64", es, 2)
        JsonStrictAccess(es.head, "INT64", constBool("graft_json_int64", es, 1)) }),
    ("graft_json_string",
      "graft_json_string(json, safe) - strict string accessor (STRING / SAFE.STRING)",
      es => { arity("graft_json_string", es, 2)
        JsonStrictAccess(es.head, "STRING", constBool("graft_json_string", es, 1)) }),
    ("graft_json_float64",
      "graft_json_float64(json, 'mode', safe) - strict FLOAT64 accessor (FLOAT64 / SAFE.FLOAT64)",
      es => { arity("graft_json_float64", es, 3)
        JsonStrictAccess(es.head, "FLOAT64", constBool("graft_json_float64", es, 2),
          constStr("graft_json_float64", es, 1)) }),
    // the KLL_QUANTILES family (kll.scala) — registry-routed for the
    // same reason as the digests: the dialect scanner must not
    // re-match rewritten output
    ("graft_kll_init_int64",
      "graft_kll_init_int64(x[, k]) - mergeable quantile sketch of int64s (KLL_QUANTILES.INIT_INT64)",
      es => { require(es.length == 1 || es.length == 2,
          s"graft_kll_init_int64 expects (x[, precision]), got ${es.length} arguments")
        KllInitAgg(es.head,
          if (es.length == 2) constInt("graft_kll_init_int64", es, 1) else 1000, asLong = true) }),
    ("graft_kll_init_float64",
      "graft_kll_init_float64(x[, k]) - mergeable quantile sketch of doubles (KLL_QUANTILES.INIT_FLOAT64)",
      es => { require(es.length == 1 || es.length == 2,
          s"graft_kll_init_float64 expects (x[, precision]), got ${es.length} arguments")
        KllInitAgg(es.head,
          if (es.length == 2) constInt("graft_kll_init_float64", es, 1) else 1000, asLong = false) }),
    ("graft_kll_merge_partial",
      "graft_kll_merge_partial(sketch) - merge serialized quantile sketches (KLL_QUANTILES.MERGE_PARTIAL)",
      es => { arity("graft_kll_merge_partial", es, 1); KllMergePartialAgg(es.head) }),
    ("graft_kll_extract_point_int64",
      "graft_kll_extract_point_int64(sketch, phi) - value at rank fraction phi (KLL_QUANTILES.EXTRACT_POINT_INT64)",
      es => { arity("graft_kll_extract_point_int64", es, 2)
        KllExtractPoint(es.head, es(1), asLong = true) }),
    ("graft_kll_extract_point_float64",
      "graft_kll_extract_point_float64(sketch, phi) - value at rank fraction phi (KLL_QUANTILES.EXTRACT_POINT_FLOAT64)",
      es => { arity("graft_kll_extract_point_float64", es, 2)
        KllExtractPoint(es.head, es(1), asLong = false) }),
    ("graft_kll_extract_int64",
      "graft_kll_extract_int64(sketch, n) - n+1 evenly spaced quantiles (KLL_QUANTILES.EXTRACT_INT64)",
      es => { arity("graft_kll_extract_int64", es, 2)
        KllExtractArray(es.head, es(1), asLong = true) }),
    ("graft_kll_extract_float64",
      "graft_kll_extract_float64(sketch, n) - n+1 evenly spaced quantiles (KLL_QUANTILES.EXTRACT_FLOAT64)",
      es => { arity("graft_kll_extract_float64", es, 2)
        KllExtractArray(es.head, es(1), asLong = false) }),
    // registered under BigQuery's own name so migrating WHERE
    // SEARCH(col, 'terms') text runs verbatim
    ("search", "search(data, query) - BigQuery SEARCH: all query tokens appear in data",
      es => { arity("search", es, 2); SearchMatch(es.head, es(1)) }),
    // NET.IP_* family (netip.scala): BYTES-carried addresses, exact
    // byte arithmetic — routed here by the GraftSql NET.* rewrites
    ("graft_ip_from_string",
      "graft_ip_from_string(s) - parse IPv4/IPv6 text to BYTES (NET.IP_FROM_STRING)",
      es => { arity("graft_ip_from_string", es, 1); IpFromString(es.head, safe = false) }),
    ("graft_safe_ip_from_string",
      "graft_safe_ip_from_string(s) - parse IPv4/IPv6 text to BYTES, NULL on invalid (NET.SAFE_IP_FROM_STRING)",
      es => { arity("graft_safe_ip_from_string", es, 1); IpFromString(es.head, safe = true) }),
    ("graft_ip_to_string",
      "graft_ip_to_string(b) - RFC 5952 text of a 4/16-byte address (NET.IP_TO_STRING)",
      es => { arity("graft_ip_to_string", es, 1); IpToString(es.head) }),
    ("graft_ip_net_mask",
      "graft_ip_net_mask(num_bytes, prefix) - network mask BYTES (NET.IP_NET_MASK)",
      es => { arity("graft_ip_net_mask", es, 2); IpNetMask(es.head, es(1)) }),
    ("graft_ip_trunc",
      "graft_ip_trunc(b, prefix) - zero host bits below prefix (NET.IP_TRUNC)",
      es => { arity("graft_ip_trunc", es, 2); IpTrunc(es.head, es(1)) }),
    ("graft_ipv4_from_int64",
      "graft_ipv4_from_int64(i) - low 32 bits as 4 address bytes (NET.IPV4_FROM_INT64)",
      es => { arity("graft_ipv4_from_int64", es, 1); Ipv4FromInt64(es.head) }),
    ("graft_ipv4_to_int64",
      "graft_ipv4_to_int64(b) - 4 address bytes as uint32 in an INT64 (NET.IPV4_TO_INT64)",
      es => { arity("graft_ipv4_to_int64", es, 1); Ipv4ToInt64(es.head) }),
    // code-point family (codepoints.scala) — routed by the GraftSql
    // TO_CODE_POINTS/UNICODE/ASCII/CHR/INITCAP/SOUNDEX rewrites
    ("graft_to_code_points",
      "graft_to_code_points(x) - STRING code points / BYTES values as ARRAY<INT64> (TO_CODE_POINTS)",
      es => { arity("graft_to_code_points", es, 1); ToCodePoints(es.head) }),
    ("graft_code_points_to_string",
      "graft_code_points_to_string(a) - string from code points, raising on invalid (CODE_POINTS_TO_STRING)",
      es => { arity("graft_code_points_to_string", es, 1); CodePointsToString(es.head) }),
    ("graft_code_points_to_bytes",
      "graft_code_points_to_bytes(a) - bytes from values in [0,255] (CODE_POINTS_TO_BYTES)",
      es => { arity("graft_code_points_to_bytes", es, 1); CodePointsToBytes(es.head) }),
    ("graft_unicode",
      "graft_unicode(s) - first code point, 0 for empty (UNICODE)",
      es => { arity("graft_unicode", es, 1); UnicodeCp(es.head) }),
    ("graft_ascii",
      "graft_ascii(s) - first code point, raising when not ASCII (ASCII)",
      es => { arity("graft_ascii", es, 1); AsciiCp(es.head) }),
    ("graft_chr",
      "graft_chr(cp) - code point to string, 0 -> '' (CHR; Spark's chr wraps at 256)",
      es => { arity("graft_chr", es, 1); ChrCp(es.head) }),
    ("graft_initcap",
      "graft_initcap(s[, delimiters]) - BigQuery INITCAP word capitalization",
      es => { require(es.length == 1 || es.length == 2,
          s"graft_initcap expects (s[, delimiters]), got ${es.length} arguments")
        BqInitCap(es.head,
          if (es.length == 2) constStr("graft_initcap", es, 1) else null) }),
    // BigQuery SOUNDEX prints lowercase; registry-routed so the
    // dialect scanner never re-matches a self-named inner call
    ("graft_soundex",
      "graft_soundex(s) - lowercase soundex code (BigQuery SOUNDEX)",
      es => { arity("graft_soundex", es, 1)
        org.apache.spark.sql.catalyst.expressions.Lower(
          org.apache.spark.sql.catalyst.expressions.SoundEx(es.head)) }),
    // INTERVAL verbs (interval.scala) — the CalendarInterval carrier
    ("graft_justify_days",
      "graft_justify_days(i) - roll 30-day blocks into months (JUSTIFY_DAYS)",
      es => { arity("graft_justify_days", es, 1); JustifyCalInterval(es.head, "days") }),
    ("graft_justify_hours",
      "graft_justify_hours(i) - roll 24-hour blocks into days (JUSTIFY_HOURS)",
      es => { arity("graft_justify_hours", es, 1); JustifyCalInterval(es.head, "hours") }),
    ("graft_justify_interval",
      "graft_justify_interval(i) - justify hours then days (JUSTIFY_INTERVAL)",
      es => { arity("graft_justify_interval", es, 1); JustifyCalInterval(es.head, "interval") }),
    ("graft_interval_text",
      "graft_interval_text(i) - BigQuery canonical '[-]Y-M [-]D [-]H:M:S[.F]' text",
      es => { arity("graft_interval_text", es, 1); CalIntervalText(es.head) }),
    ("graft_to_base32",
      "graft_to_base32(b) - RFC 4648 base32 text of BYTES (TO_BASE32)",
      es => { arity("graft_to_base32", es, 1); ToBase32(es.head) }),
    ("graft_from_base32",
      "graft_from_base32(s) - BYTES from canonical base32, raising on invalid (FROM_BASE32)",
      es => { arity("graft_from_base32", es, 1); FromBase32(es.head) }),
    // Java-semantics regexp_replace under a scanner-stable name: the
    // REGEXP_REPLACE rewrite emits its TRANSLATED replacement here so
    // the fixpoint pass never re-escapes its own output
    ("graft_regexp_replace",
      "graft_regexp_replace(v, re, rep) - regexp_replace with the replacement already in Java syntax",
      es => { arity("graft_regexp_replace", es, 3)
        org.apache.spark.sql.catalyst.expressions.RegExpReplace(es.head, es(1), es(2)) }),
    ("graft_safe_bytes_to_string",
      "graft_safe_bytes_to_string(b) - strict UTF-8 decode, NULL on malformed (SAFE_CONVERT_BYTES_TO_STRING)",
      es => { arity("graft_safe_bytes_to_string", es, 1); SafeBytesToString(es.head) }),
    ("graft_st_geohash",
      "graft_st_geohash(lng, lat, n) - geohash base32 cell id, n chars (ST_GEOHASH)",
      es => { arity("graft_st_geohash", es, 3)
        StGeohash(es.head, es(1), constInt("graft_st_geohash", es, 2)) }),
    ("graft_st_astext",
      "graft_st_astext(g) - WKT of a point STRUCT or line/ring ARRAY carrier (ST_ASTEXT)",
      es => { arity("graft_st_astext", es, 1); GeogAsText(es.head) }),
    ("graft_st_asgeojson",
      "graft_st_asgeojson(g) - RFC 7946 GeoJSON of a point/line/ring carrier (ST_ASGEOJSON)",
      es => { arity("graft_st_asgeojson", es, 1); GeogAsText(es.head, geojson = true) }),
    ("graft_st_linefromtext",
      "graft_st_linefromtext(wkt) - LINESTRING WKT to the ARRAY<STRUCT<lng, lat>> carrier (ST_LINEFROMTEXT)",
      es => { arity("graft_st_linefromtext", es, 1); GeogFromText(es.head, polygon = false) }),
    ("graft_st_polyfromtext",
      "graft_st_polyfromtext(wkt) - single-ring POLYGON WKT to the closed ARRAY carrier (ST_POLYGONFROMTEXT)",
      es => { arity("graft_st_polyfromtext", es, 1); GeogFromText(es.head, polygon = true) }),
    // AEAD / KEYS column encryption (aead.scala) — AES-GCM on the
    // JSON-carried keyset; routed by the GraftSql AEAD.* / KEYS.*
    // rewrites
    ("graft_civil_datetime",
      "graft_civil_datetime(a, b) - DATETIME(date, time) / DATETIME(ts, tz column) type dispatch",
      es => { arity("graft_civil_datetime", es, 2); CivilDatetime2(es.head, es(1)) }),
    ("graft_keyset_from_json",
      "graft_keyset_from_json(json) - keyset BYTES from canonical JSON (KEYS.KEYSET_FROM_JSON)",
      es => { arity("graft_keyset_from_json", es, 1); KeysetFromJson(es.head) }),
    ("graft_keyset_to_json",
      "graft_keyset_to_json(ks) - canonical JSON text of a keyset (KEYS.KEYSET_TO_JSON)",
      es => { arity("graft_keyset_to_json", es, 1); KeysetToJson(es.head) }),
    ("graft_new_keyset",
      "graft_new_keyset('AEAD_AES_GCM_256') - fresh random keyset (KEYS.NEW_KEYSET)",
      es => { arity("graft_new_keyset", es, 1); NewKeyset(constStr("graft_new_keyset", es, 0)) }),
    ("graft_add_key_raw",
      "graft_add_key_raw(ks, key_type, raw) - append a raw AES_GCM/AES_SIV key (KEYS.ADD_KEY_FROM_RAW_BYTES)",
      es => { arity("graft_add_key_raw", es, 3)
        AddKeyFromRawBytes(es.head, constStr("graft_add_key_raw", es, 1), es(2)) }),
    ("graft_aead_encrypt",
      "graft_aead_encrypt(ks, pt, aad) - AES-GCM encrypt under the primary key (AEAD.ENCRYPT)",
      es => { arity("graft_aead_encrypt", es, 3); AeadEncrypt(es.head, es(1), es(2)) }),
    ("graft_aead_decrypt_string",
      "graft_aead_decrypt_string(ks, ct, aad, safe) - decrypt to STRING (AEAD.DECRYPT_STRING)",
      es => { arity("graft_aead_decrypt_string", es, 4)
        AeadDecrypt(es.head, es(1), es(2), asString = true,
          safe = constBool("graft_aead_decrypt_string", es, 3)) }),
    ("graft_aead_decrypt_bytes",
      "graft_aead_decrypt_bytes(ks, ct, aad, safe) - decrypt to BYTES (AEAD.DECRYPT_BYTES)",
      es => { arity("graft_aead_decrypt_bytes", es, 4)
        AeadDecrypt(es.head, es(1), es(2), asString = false,
          safe = constBool("graft_aead_decrypt_bytes", es, 3)) }),
    // r16 optimization round: the vertex-array folds as native codegen
    // expressions (geofold.scala) — identical arithmetic to the old
    // aggregate()/transform() HOF spellings, which ran interpreted
    ("graft_st_segsum",
      "graft_st_segsum(g) - haversine segment-sum fold over the vertex carrier (ST_LENGTH/ST_PERIMETER)",
      es => { arity("graft_st_segsum", es, 1); GeoSegmentSum(es.head) }),
    ("graft_st_area",
      "graft_st_area(g) - spherical-shoelace ring area (ST_AREA)",
      es => { arity("graft_st_area", es, 1); GeoRingArea(es.head) }),
    ("graft_st_raycast",
      "graft_st_raycast(ring, p) - planar even-odd ray cast, strict boundary (ST_CONTAINS family)",
      es => { arity("graft_st_raycast", es, 2); GeoRayCast(es.head, es(1)) }),
    ("graft_st_onboundary",
      "graft_st_onboundary(g, p) - exact on-segment test (ST_TOUCHES / ST_COVERS boundary half)",
      es => { arity("graft_st_onboundary", es, 2); GeoOnBoundary(es.head, es(1)) }),
    ("graft_st_centroid",
      "graft_st_centroid(ring) - planar shoelace centroid (ST_CENTROID)",
      es => { arity("graft_st_centroid", es, 1); GeoCentroid(es.head) }),
    ("graft_st_bbox",
      "graft_st_bbox(g) - one-pass extrema of the vertex carrier (ST_BOUNDINGBOX)",
      es => { arity("graft_st_bbox", es, 1); GeoBoundingBox(es.head) }),
    ("graft_st_maxdistance",
      "graft_st_maxdistance(a, b) - max vertex-pair haversine (ST_MAXDISTANCE)",
      es => { arity("graft_st_maxdistance", es, 2); GeoMaxDistance(es.head, es(1)) }),
    ("graft_st_snaptogrid",
      "graft_st_snaptogrid(g, s) - nearest-grid-multiple quantization (ST_SNAPTOGRID)",
      es => { arity("graft_st_snaptogrid", es, 2); GeoSnapToGrid(es.head, es(1)) }),
    ("graft_st_buffer",
      "graft_st_buffer(p, r_m) - BigQuery default 32-gon around a point (ST_BUFFER)",
      es => { arity("graft_st_buffer", es, 2); GeoBuffer(es.head, es(1)) }),
    ("graft_st_pointfromtext",
      "graft_st_pointfromtext(wkt) - POINT WKT to the STRUCT<lng, lat> carrier (ST_GEOGFROMTEXT)",
      es => { arity("graft_st_pointfromtext", es, 1); GeogPointFromText(es.head) }),
    ("graft_st_pointfromgeojson",
      "graft_st_pointfromgeojson(json) - GeoJSON Point to the STRUCT<lng, lat> carrier (ST_GEOGFROMGEOJSON)",
      es => { arity("graft_st_pointfromgeojson", es, 1); GeogPointFromGeoJson(es.head) }),
    ("graft_st_convexhull",
      "graft_st_convexhull(g) - planar convex hull of the vertex carrier (ST_CONVEXHULL)",
      es => { arity("graft_st_convexhull", es, 1); ConvexHull(es.head) }),
    ("graft_st_simplify",
      "graft_st_simplify(g, tol_m) - Douglas-Peucker simplification (ST_SIMPLIFY)",
      es => { arity("graft_st_simplify", es, 2); SimplifyGeo(es.head, es(1)) }),
    ("graft_st_closestpoint",
      "graft_st_closestpoint(g, p) - closest point of a line/ring to a point (ST_CLOSESTPOINT)",
      es => { arity("graft_st_closestpoint", es, 2); ClosestPointGeo(es.head, es(1)) }),
    ("graft_det_encrypt",
      "graft_det_encrypt(ks, pt, aad) - RFC 5297 AES-SIV encrypt (DETERMINISTIC_ENCRYPT)",
      es => { arity("graft_det_encrypt", es, 3); DeterministicEncrypt(es.head, es(1), es(2)) }),
    ("graft_det_decrypt_string",
      "graft_det_decrypt_string(ks, ct, aad, safe) - AES-SIV decrypt to STRING",
      es => { arity("graft_det_decrypt_string", es, 4)
        DeterministicDecrypt(es.head, es(1), es(2), asString = true,
          safe = constBool("graft_det_decrypt_string", es, 3)) }),
    ("graft_det_decrypt_bytes",
      "graft_det_decrypt_bytes(ks, ct, aad, safe) - AES-SIV decrypt to BYTES",
      es => { arity("graft_det_decrypt_bytes", es, 4)
        DeterministicDecrypt(es.head, es(1), es(2), asString = false,
          safe = constBool("graft_det_decrypt_bytes", es, 3)) }))

  /** Register the SQL names on a live session for spark.sql use. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    for ((name, _, builder) <- sqlFunctions)
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
