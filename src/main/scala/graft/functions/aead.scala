package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery's AEAD / KEYS column-level encryption family on the JDK's
  * AES-GCM (javax.crypto — no external dependency).
  *
  * KEYSET CARRIER (documented, engine-native): BigQuery keysets are
  * serialized Tink protos; this engine carries the SAME information as
  * canonical UTF-8 JSON BYTES —
  * `{"primaryKeyId":N,"key":[{"keyId":N,"type":"AES_GCM","key":"<hex>"}, ...]}`
  * — readable through KEYS.KEYSET_TO_JSON and constructible from
  * literal JSON through KEYS.KEYSET_FROM_JSON (deterministic — the
  * fixture path the oracle needs). Tink-proto bytes are NOT accepted
  * and fail loudly at parse (stated: a migrating user re-keys through
  * KEYSET_FROM_JSON / NEW_KEYSET, ciphertexts do not port across
  * engines anyway because the wire prefix differs).
  *
  * WIRE FORMAT of AEAD.ENCRYPT output (Tink-shaped, not Tink-equal):
  * `[0x01][4-byte big-endian keyId][12-byte random IV][GCM ct+tag]`,
  * AAD authenticated, 128-bit tag. ENCRYPT is NONDETERMINISTIC by
  * construction (fresh SecureRandom IV per row — BigQuery's AEAD is
  * too), so faces gate DECRYPT∘ENCRYPT round-trips, ciphertext
  * LENGTHS (1 + 4 + 12 + |pt| + 16, deterministic), and decrypts of
  * PINNED ciphertext vectors — all deterministic. DECRYPT raises on
  * authentication failure like BigQuery; the SAFE. forms return NULL.
  *
  * DETERMINISTIC_ENCRYPT / DETERMINISTIC_DECRYPT_* (round 16) are
  * RFC 5297 AES-SIV (S2V = AES-CMAC per RFC 4493; CTR under the
  * rightmost key half with the 31st/63rd counter bits cleared), built
  * from the JDK's AES-ECB / AES-CTR primitives — the construction the
  * public RFC specifies, pinned against its A.1 test vector. Key type
  * `AES_SIV`, raw length 32 (RFC two-half key) or 64 (Tink's
  * AES256-SIV shape); same `[0x01][keyId][payload]` wire, payload
  * `V || C`. Deterministic by construction — same (key, aad, pt) →
  * same ciphertext, so equality joins and GROUP BY work on the
  * ciphertext column (the whole point of the family).
  */
object Aead {
  final case class Key(id: Int, keyType: String, raw: Array[Byte])
  final case class Keyset(primaryKeyId: Int, keys: Seq[Key]) {
    def primary: Key = keys.find(_.id == primaryKeyId).getOrElse(
      throw new IllegalArgumentException(
        s"keyset has no key with primaryKeyId=$primaryKeyId"))
  }

  private[graft] def validKeyLen(keyType: String, len: Int): Boolean = keyType match {
    case "AES_GCM" => len == 16 || len == 32
    case "AES_SIV" => len == 32 || len == 64
    case _ => false
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // the keyset column is constant (or near-constant) across a query's
  // rows, but expressions evaluate per row — cache the JSON parse per
  // thread so the hot path pays array-hash lookup, not Jackson
  private val parseCache = new ThreadLocal[java.util.HashMap[java.nio.ByteBuffer, Keyset]] {
    override def initialValue() = new java.util.HashMap[java.nio.ByteBuffer, Keyset]()
  }

  def parseCached(bytes: Array[Byte]): Keyset = {
    val cache = parseCache.get()
    val k = java.nio.ByteBuffer.wrap(bytes)
    var ks = cache.get(k)
    if (ks == null) {
      ks = parse(bytes)
      cache.put(java.nio.ByteBuffer.wrap(bytes.clone()), ks)
    }
    ks
  }

  def parse(bytes: Array[Byte]): Keyset = {
    val root = try mapper.readTree(new String(bytes, "UTF-8"))
    catch { case e: Exception => throw new IllegalArgumentException(
      "keyset is not this engine's JSON carrier (Tink-proto keysets are not " +
        "accepted — build one with KEYS.KEYSET_FROM_JSON / KEYS.NEW_KEYSET): " +
        e.getMessage) }
    require(root.has("primaryKeyId") && root.has("key"),
      "keyset JSON needs primaryKeyId and key[]")
    val keys = root.get("key").elements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Key]
    while (keys.hasNext) {
      val k = keys.next()
      require(k.has("keyId") && k.has("type") && k.has("key"),
        "each keyset entry needs keyId, type, key")
      val kt = k.get("type").asText()
      require(kt == "AES_GCM" || kt == "AES_SIV",
        s"unsupported key type '$kt' (AES_GCM or AES_SIV)")
      val raw = hexToBytes(k.get("key").asText())
      require(validKeyLen(kt, raw.length),
        s"$kt key must be ${if (kt == "AES_SIV") "32 or 64" else "16 or 32"} " +
          s"bytes, got ${raw.length}")
      out += Key(k.get("keyId").asInt(), kt, raw)
    }
    require(out.nonEmpty, "keyset has no keys")
    val ks = Keyset(root.get("primaryKeyId").asInt(), out.toSeq)
    ks.primary // validate primary exists
    ks
  }

  def render(ks: Keyset): String = {
    val entries = ks.keys.map { k =>
      s"""{"keyId":${k.id},"type":"${k.keyType}","key":"${bytesToHex(k.raw)}"}"""
    }
    s"""{"primaryKeyId":${ks.primaryKeyId},"key":[${entries.mkString(",")}]}"""
  }

  def hexToBytes(s: String): Array[Byte] = {
    require(s.length % 2 == 0 && s.forall(c => Character.digit(c, 16) >= 0),
      s"not a hex string: ${s.take(20)}")
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }
  def bytesToHex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  // one GCM cipher instance per thread, re-init'ed per call:
  // Cipher.getInstance is a provider lookup and was paid per ROW in
  // the encrypt/decrypt hot path (same finding as AesSiv's engine
  // cache — init with a fresh IV is cheap, the lookup is not)
  private val gcmCipher = new ThreadLocal[javax.crypto.Cipher] {
    override def initialValue(): javax.crypto.Cipher =
      javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
  }
  private val gcmKeySpecs =
    new ThreadLocal[java.util.HashMap[java.nio.ByteBuffer, javax.crypto.spec.SecretKeySpec]] {
      override def initialValue() =
        new java.util.HashMap[java.nio.ByteBuffer, javax.crypto.spec.SecretKeySpec]()
    }

  private def cipher(mode: Int, key: Array[Byte], iv: Array[Byte],
                     aad: Array[Byte]): javax.crypto.Cipher = {
    val specs = gcmKeySpecs.get()
    val k = java.nio.ByteBuffer.wrap(key)
    var spec = specs.get(k)
    if (spec == null) {
      spec = new javax.crypto.spec.SecretKeySpec(key, "AES")
      specs.put(java.nio.ByteBuffer.wrap(key.clone()), spec)
    }
    val c = gcmCipher.get()
    c.init(mode, spec, new javax.crypto.spec.GCMParameterSpec(128, iv))
    if (aad.nonEmpty) c.updateAAD(aad)
    c
  }

  /** `[0x01][keyId BE][IV][ct+tag]` under the PRIMARY key. */
  def encrypt(ks: Keyset, pt: Array[Byte], aad: Array[Byte],
              rng: java.security.SecureRandom): Array[Byte] = {
    val pk = ks.primary
    require(pk.keyType == "AES_GCM",
      s"AEAD.ENCRYPT needs an AES_GCM primary key, the keyset's primary is ${pk.keyType} " +
        "(use DETERMINISTIC_ENCRYPT for AES_SIV keysets)")
    val iv = new Array[Byte](12)
    rng.nextBytes(iv)
    val ct = cipher(javax.crypto.Cipher.ENCRYPT_MODE, pk.raw, iv, aad).doFinal(pt)
    val out = java.nio.ByteBuffer.allocate(1 + 4 + 12 + ct.length)
    out.put(1.toByte).putInt(pk.id).put(iv).put(ct)
    out.array()
  }

  private def keyFor(ks: Keyset, kid: Int, wantType: String): Array[Byte] = {
    val k = ks.keys.find(_.id == kid).getOrElse(
      throw new IllegalArgumentException(s"ciphertext key id $kid is not in the keyset"))
    require(k.keyType == wantType,
      s"ciphertext key id $kid is ${k.keyType}, this decrypt needs $wantType")
    k.raw
  }

  /** Decrypt by keyId prefix; raises on unknown key or a failed tag
    * (BigQuery's AEAD.DECRYPT_* raise too — the SAFE. forms map NULL).
    */
  def decrypt(ks: Keyset, blob: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    require(blob.length >= 1 + 4 + 12 + 16 && blob(0) == 1.toByte,
      s"not an AEAD.ENCRYPT ciphertext (${blob.length} bytes, prefix ${if (blob.isEmpty) "none" else blob(0).toString})")
    val buf = java.nio.ByteBuffer.wrap(blob)
    buf.get()
    val kid = buf.getInt
    val key = keyFor(ks, kid, "AES_GCM")
    val iv = new Array[Byte](12); buf.get(iv)
    val ct = new Array[Byte](buf.remaining()); buf.get(ct)
    cipher(javax.crypto.Cipher.DECRYPT_MODE, key, iv, aad).doFinal(ct)
  }

  /** `[0x01][keyId BE][V || C]` under the PRIMARY key — RFC 5297
    * AES-SIV, deterministic by construction.
    */
  def detEncrypt(ks: Keyset, pt: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    val pk = ks.primary
    require(pk.keyType == "AES_SIV",
      s"DETERMINISTIC_ENCRYPT needs an AES_SIV primary key, the keyset's primary is " +
        s"${pk.keyType} (use AEAD.ENCRYPT for AES_GCM keysets)")
    val vc = AesSiv.encrypt(pk.raw, pt, aad)
    val out = java.nio.ByteBuffer.allocate(1 + 4 + vc.length)
    out.put(1.toByte).putInt(pk.id).put(vc)
    out.array()
  }

  /** Raises on an S2V mismatch (wrong key / aad / corrupt ciphertext)
    * exactly like GCM's tag failure; SAFE. forms map to NULL upstream.
    */
  def detDecrypt(ks: Keyset, blob: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    require(blob.length >= 1 + 4 + 16 && blob(0) == 1.toByte,
      s"not a DETERMINISTIC_ENCRYPT ciphertext (${blob.length} bytes)")
    val buf = java.nio.ByteBuffer.wrap(blob)
    buf.get()
    val kid = buf.getInt
    val key = keyFor(ks, kid, "AES_SIV")
    val vc = new Array[Byte](buf.remaining()); buf.get(vc)
    AesSiv.decrypt(key, vc, aad)
  }
}

/** RFC 5297 AES-SIV from JDK primitives: S2V over AES-CMAC (RFC 4493)
  * keyed by the LEFTMOST key half, AES-CTR keyed by the RIGHTMOST
  * half with the 31st and 63rd bits of the synthetic IV cleared
  * before counting (RFC 5297 §2.5-2.7). The S2V component vector is
  * always `[additional_data, plaintext]` — Tink's single-AD DAEAD
  * shape, which BigQuery's DETERMINISTIC_ family exposes. Pinned
  * against the RFC's A.1 vector (AeadSpec + the q_aead_det face) and
  * A.2's S2V chain (AeadSpec, via the multi-component entry point).
  */
object AesSiv {
  /** GF(2^128) doubling: shift left one bit, xor 0x87 into the last
    * byte when the shifted-out bit was set (RFC 4493 subkey rule).
    */
  private[graft] def dbl(in: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 15) {
      out(i) = (((in(i) << 1) & 0xff) | ((in(i + 1) & 0xff) >>> 7)).toByte
      i += 1
    }
    out(15) = ((in(15) << 1) & 0xff).toByte
    if ((in(0) & 0x80) != 0) out(15) = (out(15) ^ 0x87).toByte
    out
  }

  private def xor16(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) { out(i) = (a(i) ^ b(i)).toByte; i += 1 }
    out
  }

  /** One key's cipher state, built once and reused across rows:
    * `Cipher.getInstance` (a provider lookup) per 16-byte block was
    * the measured hot-path cost of the first cut — a projection over
    * 600 k rows paid it ~10× per row. The engine holds ONE ECB cipher
    * (CMAC subkeys pre-derived) and ONE CTR cipher re-`init`ed per
    * row (init is cheap; instance lookup is not). Cipher objects are
    * stateful, so engines are cached PER THREAD (codegen evaluates
    * expressions single-threaded per task).
    */
  private final class Engine(cmacKey: Array[Byte], ctrKey: Array[Byte]) {
    private val ecb = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    ecb.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(cmacKey, "AES"))
    def block(b: Array[Byte]): Array[Byte] = ecb.doFinal(b)
    private val sub1: Array[Byte] = dbl(block(new Array[Byte](16)))
    private val sub2: Array[Byte] = dbl(sub1)
    private val ctrCipher =
      if (ctrKey == null) null else javax.crypto.Cipher.getInstance("AES/CTR/NoPadding")
    private val ctrSpec =
      if (ctrKey == null) null else new javax.crypto.spec.SecretKeySpec(ctrKey, "AES")

    /** AES-CMAC (RFC 4493). */
    def cmac(msg: Array[Byte]): Array[Byte] = {
      val n = if (msg.length == 0) 1 else (msg.length + 15) / 16
      val complete = msg.length > 0 && msg.length % 16 == 0
      val last = new Array[Byte](16)
      val off = (n - 1) * 16
      if (complete) {
        var i = 0
        while (i < 16) { last(i) = (msg(off + i) ^ sub1(i)).toByte; i += 1 }
      } else {
        val rem = msg.length - off
        var i = 0
        while (i < rem) { last(i) = (msg(off + i) ^ sub2(i)).toByte; i += 1 }
        last(rem) = (0x80 ^ sub2(rem)).toByte
        i = rem + 1
        while (i < 16) { last(i) = sub2(i); i += 1 }
      }
      var x = new Array[Byte](16)
      var b = 0
      while (b < n - 1) {
        val blk = new Array[Byte](16)
        var i = 0
        while (i < 16) { blk(i) = (x(i) ^ msg(b * 16 + i)).toByte; i += 1 }
        x = block(blk)
        b += 1
      }
      block(xor16(x, last))
    }

    /** S2V (RFC 5297 §2.4) over a non-empty component vector, the
      * last component being the plaintext.
      */
    def s2v(components: Seq[Array[Byte]]): Array[Byte] = {
      require(components.nonEmpty, "S2V needs at least one component")
      var d = cmac(new Array[Byte](16))
      for (s <- components.dropRight(1)) d = xor16(dbl(d), cmac(s))
      val sn = components.last
      val t =
        if (sn.length >= 16) {
          // xorend: D xors into the LAST 16 bytes of Sn
          val out = sn.clone()
          val off = sn.length - 16
          var i = 0
          while (i < 16) { out(off + i) = (out(off + i) ^ d(i)).toByte; i += 1 }
          out
        } else {
          val padded = new Array[Byte](16)
          System.arraycopy(sn, 0, padded, 0, sn.length)
          padded(sn.length) = 0x80.toByte
          xor16(dbl(d), padded)
        }
      cmac(t)
    }

    def ctr(v: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val q = java.util.Arrays.copyOf(v, 16)
      q(8) = (q(8) & 0x7f).toByte
      q(12) = (q(12) & 0x7f).toByte
      ctrCipher.init(javax.crypto.Cipher.ENCRYPT_MODE, ctrSpec,
        new javax.crypto.spec.IvParameterSpec(q))
      ctrCipher.doFinal(data)
    }
  }

  private val engines = new ThreadLocal[java.util.HashMap[java.nio.ByteBuffer, Engine]] {
    override def initialValue() = new java.util.HashMap[java.nio.ByteBuffer, Engine]()
  }

  private def engineFor(sivKey: Array[Byte]): Engine = {
    require(sivKey.length == 32 || sivKey.length == 64,
      s"AES-SIV key must be 32 or 64 bytes, got ${sivKey.length}")
    val cache = engines.get()
    val k = java.nio.ByteBuffer.wrap(sivKey) // content-based equals/hashCode
    var e = cache.get(k)
    if (e == null) {
      val h = sivKey.length / 2
      e = new Engine(java.util.Arrays.copyOfRange(sivKey, 0, h),
        java.util.Arrays.copyOfRange(sivKey, h, sivKey.length))
      // defensive copy for the key (the caller's buffer could be reused)
      cache.put(java.nio.ByteBuffer.wrap(sivKey.clone()), e)
    }
    e
  }

  /** Test entry points over the raw CMAC key (no CTR half). */
  private[graft] def cmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] =
    new Engine(key, null).cmac(msg)
  private[graft] def s2v(key: Array[Byte], components: Seq[Array[Byte]]): Array[Byte] =
    new Engine(key, null).s2v(components)

  /** Returns `V || C` (no wire prefix — [[Aead.detEncrypt]] adds it). */
  def encrypt(sivKey: Array[Byte], pt: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    val e = engineFor(sivKey)
    val v = e.s2v(Seq(aad, pt))
    v ++ e.ctr(v, pt)
  }

  def decrypt(sivKey: Array[Byte], vc: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    require(vc.length >= 16, s"AES-SIV payload needs >= 16 bytes, got ${vc.length}")
    val e = engineFor(sivKey)
    val v = java.util.Arrays.copyOf(vc, 16)
    val pt = e.ctr(v, java.util.Arrays.copyOfRange(vc, 16, vc.length))
    val check = e.s2v(Seq(aad, pt))
    if (!java.util.Arrays.equals(check, v))
      throw new javax.crypto.AEADBadTagException(
        "DETERMINISTIC_DECRYPT: authentication failed (wrong key, wrong " +
          "additional_data, or corrupted ciphertext)")
    pt
  }
}

/** KEYS.KEYSET_FROM_JSON — parse + canonicalize (re-render) so two
  * spellings of the same keyset compare equal as BYTES.
  */
case class KeysetFromJson(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BinaryType
  def compute(s: UTF8String): Array[Byte] =
    Aead.render(Aead.parse(s.toString.getBytes("UTF-8"))).getBytes("UTF-8")
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ksFromJson", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): KeysetFromJson =
    copy(child = newChild)
}

/** KEYS.KEYSET_TO_JSON — the carrier is already canonical JSON bytes;
  * parse + re-render to validate and normalize.
  */
case class KeysetToJson(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  def compute(b: Array[Byte]): UTF8String =
    UTF8String.fromString(Aead.render(Aead.parse(b)))
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ksToJson", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): KeysetToJson =
    copy(child = newChild)
}

/** KEYS.NEW_KEYSET(key_type) — one fresh random key, keyId 1,
  * primary. `AEAD_AES_GCM_{128,256}` mint AES_GCM keys;
  * `DETERMINISTIC_AEAD_AES_SIV_CMAC_256` mints the 64-byte AES_SIV
  * key (Tink's AES256-SIV shape: two 32-byte halves). NONDETERMINISTIC
  * like BigQuery's (deterministic overridden so the optimizer never
  * folds or CSEs it).
  */
case class NewKeyset(keyType: String) extends Expression {
  require(keyType == "AEAD_AES_GCM_256" || keyType == "AEAD_AES_GCM_128" ||
      keyType == "DETERMINISTIC_AEAD_AES_SIV_CMAC_256",
    s"KEYS.NEW_KEYSET supports AEAD_AES_GCM_256 / AEAD_AES_GCM_128 / " +
      s"DETERMINISTIC_AEAD_AES_SIV_CMAC_256, got '$keyType'")
  override def children: Seq[Expression] = Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override lazy val deterministic: Boolean = false
  @transient private lazy val rng = new java.security.SecureRandom()
  def compute(): Array[Byte] = {
    val siv = keyType.startsWith("DETERMINISTIC")
    val raw = new Array[Byte](if (siv) 64 else if (keyType.endsWith("128")) 16 else 32)
    rng.nextBytes(raw)
    val kt = if (siv) "AES_SIV" else "AES_GCM"
    Aead.render(Aead.Keyset(1, Seq(Aead.Key(1, kt, raw)))).getBytes("UTF-8")
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = compute()
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("newKeyset", this,
      classOf[NewKeyset].getName)
    ev.copy(code = code"byte[] ${ev.value} = $ref.compute();",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = this
}

/** KEYS.ADD_KEY_FROM_RAW_BYTES(keyset, 'AES_GCM', raw) — appends the
  * raw key under keyId max+1; the primary stays (BigQuery's rule: the
  * added raw key can decrypt, the keyset's primary still encrypts).
  */
case class AddKeyFromRawBytes(first: Expression, keyType: String, third: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  require(keyType == "AES_GCM" || keyType == "AES_SIV",
    s"ADD_KEY_FROM_RAW_BYTES supports 'AES_GCM' or 'AES_SIV', got '$keyType'")
  override def left: Expression = first
  override def right: Expression = third
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  def compute(ksb: Array[Byte], raw: Array[Byte]): Array[Byte] = {
    require(Aead.validKeyLen(keyType, raw.length),
      s"$keyType raw key must be ${if (keyType == "AES_SIV") "32 or 64" else "16 or 32"} " +
        s"bytes, got ${raw.length}")
    val ks = Aead.parse(ksb)
    val nid = ks.keys.map(_.id).max + 1
    Aead.render(ks.copy(keys = ks.keys :+ Aead.Key(nid, keyType, raw))).getBytes("UTF-8")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("addKey", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AddKeyFromRawBytes =
    copy(first = l, third = r)
}

/** AEAD.ENCRYPT(keyset, plaintext STRING, aad STRING) — fresh random
  * IV per row, hence nondeterministic (like BigQuery's).
  */
case class AeadEncrypt(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, StringType, StringType)
  override def dataType: DataType = BinaryType
  override lazy val deterministic: Boolean = false
  @transient private lazy val rng = new java.security.SecureRandom()
  def compute(ks: Array[Byte], pt: UTF8String, aad: UTF8String): Array[Byte] =
    Aead.encrypt(Aead.parseCached(ks), pt.getBytes, aad.getBytes, rng)
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[UTF8String], c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("aeadEnc", this)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"${ev.value} = $ref.compute($a, $b, $c);")
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): AeadEncrypt =
    copy(first = a, second = b, third = c)
}

/** AEAD.DECRYPT_STRING / DECRYPT_BYTES(keyset, ciphertext, aad) —
  * raises on a bad tag / unknown key id (BigQuery raises too; route
  * SAFE. forms through `safe = true` for NULL instead). DECRYPT_STRING
  * additionally requires the plaintext to be valid UTF-8.
  */
case class AeadDecrypt(first: Expression, second: Expression, third: Expression,
                       asString: Boolean, safe: Boolean = false)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType, StringType)
  override def dataType: DataType = if (asString) StringType else BinaryType
  override def nullable: Boolean = true
  def compute(ks: Array[Byte], ct: Array[Byte], aad: UTF8String): Any = {
    try {
      val pt = Aead.decrypt(Aead.parseCached(ks), ct, aad.getBytes)
      if (!asString) pt
      else {
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(pt)).toString)
      }
    } catch {
      case _: Exception if safe => null
      case e: javax.crypto.AEADBadTagException => throw new IllegalArgumentException(
        "AEAD.DECRYPT: authentication failed (wrong key, wrong additional_data, " +
          "or corrupted ciphertext)", e)
    }
  }
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("aeadDec", this)
    val javaType = if (asString) "UTF8String" else "byte[]"
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"""Object r = $ref.compute($a, $b, $c);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ($javaType) r; }
         |""".stripMargin)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): AeadDecrypt =
    copy(first = a, second = b, third = c)
}

/** DETERMINISTIC_ENCRYPT(keyset, plaintext STRING, additional_data
  * STRING) — RFC 5297 AES-SIV under the keyset's primary AES_SIV key.
  * DETERMINISTIC (the family's contract): same inputs → same
  * ciphertext, so the column supports equality joins and GROUP BY.
  */
case class DeterministicEncrypt(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, StringType, StringType)
  override def dataType: DataType = BinaryType
  def compute(ks: Array[Byte], pt: UTF8String, aad: UTF8String): Array[Byte] =
    Aead.detEncrypt(Aead.parseCached(ks), pt.getBytes, aad.getBytes)
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[UTF8String], c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("detEnc", this)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"${ev.value} = $ref.compute($a, $b, $c);")
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): DeterministicEncrypt =
    copy(first = a, second = b, third = c)
}

/** DETERMINISTIC_DECRYPT_STRING / _BYTES(keyset, ciphertext, aad) —
  * raises on the S2V check failing (BigQuery raises too); `safe = true`
  * routes the SAFE. forms to NULL instead.
  */
case class DeterministicDecrypt(first: Expression, second: Expression, third: Expression,
                                asString: Boolean, safe: Boolean = false)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType, StringType)
  override def dataType: DataType = if (asString) StringType else BinaryType
  override def nullable: Boolean = true
  def compute(ks: Array[Byte], ct: Array[Byte], aad: UTF8String): Any = {
    try {
      val pt = Aead.detDecrypt(Aead.parseCached(ks), ct, aad.getBytes)
      if (!asString) pt
      else {
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(pt)).toString)
      }
    } catch {
      case _: Exception if safe => null
      case e: javax.crypto.AEADBadTagException => throw new IllegalArgumentException(
        "DETERMINISTIC_DECRYPT: authentication failed (wrong key, wrong " +
          "additional_data, or corrupted ciphertext)", e)
    }
  }
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("detDec", this)
    val javaType = if (asString) "UTF8String" else "byte[]"
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"""Object r = $ref.compute($a, $b, $c);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ($javaType) r; }
         |""".stripMargin)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): DeterministicDecrypt =
    copy(first = a, second = b, third = c)
}
