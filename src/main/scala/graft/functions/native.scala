package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
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
  * row — the difference is ~20× on the dedup benchmark — while staying
  * inside Tungsten row processing (single eval call per row;
  * CodegenFallback only wraps the call site, the loop itself is JIT'd).
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
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h0 = Hashing.hashUTF8(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < k) {
        val h = Hashing.mix(h0 ^ (i * Hashing.Golden))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array: per-token xxh64, ±1 bit votes,
  * sign fold — one pass, no per-bit expression trees.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = Hashing.hashUTF8(arr.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sim |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sim)
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Distinct word n-gram shingles from a token array (order of first
  * appearance; set semantics).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private val space = UTF8String.fromString(" ")
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val count = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val m = math.min(n, len - i)
      val parts = new Array[UTF8String](m)
      var j = 0
      while (j < m) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
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
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH signature of a float vector: bit p = sign of
  * Σᵢ vᵢ·w(p,i) with deterministic pseudo-random weights
  * w = mix(seed ⊕ p·G ⊕ i·G²) scaled to [-1,1]. One pass per plane,
  * no per-element expression trees.
  */
case class HyperplaneSig(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val w = Hashing.mix(seed ^ (p * Hashing.Golden) ^ (i.toLong * 0xc2b2ae3d27d4eb4fL))
        proj += arr.getFloat(i) * (w.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** Exact Jaccard similarity |A∩B| / |A∪B| of two string arrays
  * (set semantics) — the n-gram dedup verify step as one hash-set
  * pass instead of interpreted array_intersect + array_union.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val sa = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { sa.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    val sb = new java.util.HashSet[UTF8String](b.numElements() * 2)
    i = 0
    while (i < b.numElements()) {
      val e = b.getUTF8String(i)
      if (sb.add(e) && sa.contains(e)) inter += 1
      i += 1
    }
    val union = sa.size + sb.size - inter
    java.lang.Double.valueOf(if (union == 0) 1.0 else inter.toDouble / union)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** Fraction of equal slots between two equal-length long arrays —
  * the MinHash Jaccard estimator, one loop instead of
  * zip_with + filter + size interpreted trees.
  */
case class SigMatchFraction(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    java.lang.Double.valueOf(if (n == 0) 0.0 else eq.toDouble / n)
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
    extends UnaryExpression with CodegenFallback {
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
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val denom = math.max(n, 1).toDouble
    var bestScore = 0.0
    var best: UTF8String = und
    var li = 0
    while (li < ordered.length) {
      val (lang, set) = ordered(li)
      var hits = 0
      var i = 0
      while (i < n) { if (set.contains(arr.getUTF8String(i))) hits += 1; i += 1 }
      val score = hits / denom
      if (score > bestScore) { bestScore = score; best = lang }
      li += 1
    }
    if (bestScore > 0.0) best else und
  }
  override protected def withNewChildInternal(newChild: Expression): LangGuess =
    copy(child = newChild)
}

/** Column wrappers + SQL registration for the native expressions. */
object native {
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

  def minhash_signature(tokens: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), k))
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
  def word_shingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), n))
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  def hyperplane_sig(vec: Column, planes: Int, seed: Long = 42L): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(vec), planes, seed))
  def jaccard_sim(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))
  def sig_match_fraction(a: Column, b: Column): Column =
    Bridge.column(SigMatchFraction(Bridge.expression(a), Bridge.expression(b)))
  def lang_guess(tokens: Column, lexicons: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangGuess(Bridge.expression(tokens), lexicons))

  /** Register SQL names (graft_minhash / graft_simhash / graft_shingles
    * / graft_cosine / graft_jaccard) on a session for spark.sql use —
    * the same set `graft.GraftExtensions` injects via configuration.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_minhash",
      es => MinHashSignature(es.head, constInt("graft_minhash", es, 1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_shingles",
      es => WordShingles(es.head, constInt("graft_shingles", es, 1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine", es => CosineSim(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_jaccard", es => JaccardSim(es.head, es(1)), "built-in")
  }
}
