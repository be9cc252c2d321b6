package graft

import graft.functions.{CosineSim, HyperplaneSig, JaccardSim, MinHashSignature, SimHash64, SortedJaccard, WordShingles}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Direct unit tests of the native expressions: the LSH hash family is
  * PINNED to fixed values (any change to seed/mix/weight derivation
  * silently reshuffles every bucket and tanks recall — this test makes
  * that loud), and null-element arrays must be skipped, not NPE.
  */
class NativeExprSpec extends SparkSuite {

  private def floats(v: Float*): Literal =
    Literal(new GenericArrayData(v.map(x => x: Any).toArray), ArrayType(FloatType))
  private def strings(v: String*): Literal =
    Literal(new GenericArrayData(v.map(s => if (s == null) null else UTF8String.fromString(s)).toArray),
      ArrayType(StringType, containsNull = true))

  test("HyperplaneSig hash family is pinned (seed=42, planes=16)") {
    def sig(l: Literal): Long = HyperplaneSig(l, 16, 42L).eval(null).asInstanceOf[Long]
    assert(sig(floats(1f, 0f, 0f, 0f)) == 3256L)
    assert(sig(floats(0f, 1f, 0f, 0f)) == 25130L)
    assert(sig(floats(0.5f, -0.25f, 0.75f, -1f)) == 26781L)
    // sign flip flips every plane's side: bitwise complement in 16 bits
    assert(sig(floats(-1f, 0f, 0f, 0f)) == (3256L ^ 0xFFFFL))
  }

  test("identical vectors share all bands; similar vectors share most planes") {
    def sig(l: Literal): Long = HyperplaneSig(l, 16, 42L).eval(null).asInstanceOf[Long]
    val a = sig(floats(0.3f, 0.7f, -0.2f, 0.9f))
    val b = sig(floats(0.3f, 0.7f, -0.2f, 0.9f))
    assert(a == b)
    val near = sig(floats(0.31f, 0.69f, -0.2f, 0.9f))
    assert(java.lang.Long.bitCount(a ^ near) <= 3, s"near-identical vectors differ in too many planes")
  }

  test("null array elements are skipped, never NPE") {
    val withNulls = strings("alpha", null, "beta", "gamma", null)
    val clean = strings("alpha", "beta", "gamma")
    assert(MinHashSignature(withNulls, 16).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq ==
      MinHashSignature(clean, 16).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq)
    assert(SimHash64(withNulls).eval(null) == SimHash64(clean).eval(null))
    assert(WordShingles(withNulls, 2).eval(null).asInstanceOf[ArrayData].numElements() ==
      WordShingles(clean, 2).eval(null).asInstanceOf[ArrayData].numElements())
    assert(JaccardSim(withNulls, clean).eval(null) == java.lang.Double.valueOf(1.0))
  }

  test("codegen and interpreted paths agree on the full sketch pipeline") {
    // run the minhash signature pipeline with whole-stage codegen ON
    // (default; exercises doGenCode) and OFF (forces the eval path),
    // and require identical signatures — pins that the two
    // implementations of every native expression are the same math
    val docs = graft.sources.Tables.documents(spark, sf).limit(100)
    def run(): Seq[(Long, Seq[Long])] =
      graft.operators.Dedup.signatures(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](2).toSeq)).toSeq.sortBy(_._1)
    val withCodegen = run()
    val prevWS = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFM = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = run()
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevWS)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFM)
    }
  }

  test("HyperplaneSig weight cache grows correctly when vector widths vary") {
    // one INSTANCE evaluated narrow-first then wide: the wide call must
    // rebuild the cache, not read past the narrow matrix or reuse wrong
    // weights. Fresh instances pin the expected values.
    val e = HyperplaneSig(floats(1f), 16, 42L) // literal child ignored by eval-with-arg below
    def evalWith(inst: HyperplaneSig, v: Float*): Long =
      inst.compute(new GenericArrayData(v.map(x => x: Any).toArray))
    val narrowFirst = evalWith(e, 1f, 0f)
    val wideAfter = evalWith(e, 0.5f, -0.25f, 0.75f, -1f)
    assert(narrowFirst == evalWith(HyperplaneSig(floats(1f), 16, 42L), 1f, 0f))
    assert(wideAfter == 26781L, "wide-after-narrow must match the pinned fresh-instance signature")
  }

  test("NearestCell ties break to the lowest cell id regardless of input order") {
    import graft.functions.NearestCell
    val c = Seq(1f, 0f)
    // two identical centroids => a perfect tie; pass the higher id first
    val e = NearestCell(floats(1f, 0f), cells = Seq(9L, 2L), centroids = Seq(c, c))
    assert(e.eval(null) == 2L, "tie must go to the lowest cell id even when passed unsorted")
    // and sorting must keep ids paired with their own centroids
    val e2 = NearestCell(floats(0f, 1f), cells = Seq(9L, 2L),
      centroids = Seq(Seq(0f, 1f), Seq(1f, 0f)))
    assert(e2.eval(null) == 9L, "sorting ids must not detach them from their centroids")
  }

  test("Int8Quantize: codes bounded, ties away from zero, round-trip error <= scale/254") {
    import graft.functions.{native, Int8Quantize}
    import org.apache.spark.sql.catalyst.InternalRow
    def quant(v: Float*): (Double, Seq[Byte]) = {
      val r = Int8Quantize(floats(v: _*)).eval(null).asInstanceOf[InternalRow]
      (r.getDouble(0), r.getArray(1).toByteArray().toSeq)
    }
    val (scale, codes) = quant(0.5f, -0.25f, 0.75f, -1f)
    assert(scale == 1.0)
    assert(codes == Seq[Byte](64, -32, 95, -127)) // 63.5 rounds away to 64
    assert(quant(0f, 0f) == ((0.0, Seq[Byte](0, 0))), "zero vector quantizes to zeros")
    // null elements: skipped for the scale max, coded as 0 — the same
    // semantics the DuckDB oracle models with COALESCE(e, 0)
    val withNull = Literal(new GenericArrayData(Array[Any](0.5f, null, -1f)),
      ArrayType(FloatType, containsNull = true))
    val rn = Int8Quantize(withNull).eval(null).asInstanceOf[InternalRow]
    assert(rn.getDouble(0) == 1.0, "null element must not contribute to scale")
    assert(rn.getArray(1).toByteArray().toSeq == Seq[Byte](64, 0, -127),
      "null element quantizes to code 0")
    // round-trip on real corpus data: worst-case error is half a step
    val e = graft.sources.Tables.embeddings(spark, sf).limit(200)
      .select(org.apache.spark.sql.functions.col("embedding"),
        native.int8_quantize(org.apache.spark.sql.functions.col("embedding")).as("q"))
    e.collect().foreach { r =>
      val v = r.getSeq[Float](0)
      val q = r.getStruct(1)
      val s = q.getDouble(0)
      val c = q.getSeq[Byte](1)
      v.indices.foreach { i =>
        val back = c(i).toDouble * s / 127.0
        assert(math.abs(back - v(i)) <= s / 254.0 + 1e-12,
          s"elem $i: $back vs ${v(i)} (scale $s)")
      }
    }
  }

  test("CosineSim matches a plain-Scala cosine") {
    val a = Array(0.5f, -0.25f, 0.75f, -1f)
    val b = Array(0.1f, 0.9f, -0.4f, 0.2f)
    val want = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val got = CosineSim(floats(a.toIndexedSeq: _*), floats(b.toIndexedSeq: _*))
      .eval(null).asInstanceOf[Double]
    assert(got == want)
  }

  test("SortedJaccard equals JaccardSim on distinct sorted arrays, including edge cases") {
    val rng = new scala.util.Random(7)
    def randSet(): Seq[String] =
      Seq.fill(rng.nextInt(30))(s"w${rng.nextInt(40)} x${rng.nextInt(9)}")
        .distinct.sorted
    for (_ <- 1 to 200) {
      val (a, b) = (randSet(), randSet())
      val viaHash = JaccardSim(strings(a: _*), strings(b: _*)).eval(null)
      val viaMerge = SortedJaccard(strings(a: _*), strings(b: _*)).eval(null)
      assert(viaHash == viaMerge, s"diverged on ${a.take(5)}... vs ${b.take(5)}...")
    }
    // both-empty -> union 0 -> 1.0 by convention on both paths
    assert(SortedJaccard(strings(), strings()).eval(null) == 1.0)
    assert(JaccardSim(strings(), strings()).eval(null) == 1.0)
  }

  test("WindowMd5 is bit-identical to the transform/slice/md5 HOF spelling") {
    import org.apache.spark.sql.{functions => F}
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two", "one two three", "single",
      "a a a a a a", // repeated tokens
      "unicode émojis ünd ßtuff here too").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    import spark.implicits._
    val df = docs.toDF("id", "text")
      .select(F.col("id"), F.split(F.col("text"), " ").as("toks"))
    for (k <- Seq(2, 3, 5)) {
      val hof = df.select(F.col("id"), F.when(F.size(F.col("toks")) >= k,
        F.transform(
          F.sequence(F.lit(0), F.size(F.col("toks")) - k),
          p => F.md5(F.concat_ws(" ", F.slice(F.col("toks"), p + 1, F.lit(k))))))
        .otherwise(F.array().cast("array<string>")).as("h"))
      val nat = df.select(F.col("id"),
        graft.functions.native.window_md5(F.col("toks"), k).as("h"))
      val l = hof.orderBy("id").collect().map(_.getSeq[String](1).toList).toList
      val r = nat.orderBy("id").collect().map(_.getSeq[String](1).toList).toList
      assert(l == r, s"k=$k window hashes diverged")
    }
  }

  test("AES-SIV pins RFC 5297 A.1 and A.2 test vectors exactly") {
    import graft.functions.{Aead, AesSiv}
    def hx(s: String): Array[Byte] = Aead.hexToBytes(s)
    def toHex(b: Array[Byte]): String = Aead.bytesToHex(b)
    // A.1 Deterministic Authenticated Encryption Example (RFC 5297):
    // one AD component + plaintext, 32-byte key
    val k1 = hx("fffefdfcfbfaf9f8f7f6f5f4f3f2f1f0f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    val ad1 = hx("101112131415161718191a1b1c1d1e1f2021222324252627")
    val pt1 = hx("112233445566778899aabbccddee")
    val out1 = AesSiv.encrypt(k1, pt1, ad1)
    assert(toHex(out1) ==
      "85632d07c6e8f37f950acd320a2ecc93" + // V (the synthetic IV / tag)
        "40c02b9690c4dc04daef7f6afe5c")    // C (CTR keystream xor pt)
    assert(AesSiv.decrypt(k1, out1, ad1).toSeq == pt1.toSeq)
    // tamper: flip one ciphertext bit → auth failure, loud
    val bad = out1.clone(); bad(20) = (bad(20) ^ 1).toByte
    intercept[javax.crypto.AEADBadTagException](AesSiv.decrypt(k1, bad, ad1))
    intercept[javax.crypto.AEADBadTagException](
      AesSiv.decrypt(k1, out1, "other".getBytes))
    // A.2 Nonce-Based Authenticated Encryption Example: the S2V chain
    // over THREE leading components (ad1, ad2, nonce) + plaintext —
    // exercises the dbl/xor fold and the >=16-byte xorend branch
    val k2 = hx("7f7e7d7c7b7a797877767574737271704041424344454647" +
      "48494a4b4c4d4e4f")
    val a21 = hx("00112233445566778899aabbccddeeffdeaddadadeaddada" +
      "ffeeddccbbaa99887766554433221100")
    val a22 = hx("102030405060708090a0")
    val nonce = hx("09f911029d74e35bd84156c5635688c0")
    val pt2 = "this is some plaintext to encrypt using SIV-AES".getBytes("US-ASCII")
    val v2 = AesSiv.s2v(java.util.Arrays.copyOfRange(k2, 0, 16),
      Seq(a21, a22, nonce, pt2))
    assert(toHex(v2) == "7bdb6e3b432667eb06f4d14bff2fbd0f")
  }
}
