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
  * DETERMINISTIC_ENCRYPT (AES-SIV) has no JDK primitive and stays
  * loud in the rewriter.
  */
object Aead {
  final case class Keyset(primaryKeyId: Int, keys: Seq[(Int, Array[Byte])]) {
    def primary: (Int, Array[Byte]) = keys.find(_._1 == primaryKeyId).getOrElse(
      throw new IllegalArgumentException(
        s"keyset has no key with primaryKeyId=$primaryKeyId"))
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def parse(bytes: Array[Byte]): Keyset = {
    val root = try mapper.readTree(new String(bytes, "UTF-8"))
    catch { case e: Exception => throw new IllegalArgumentException(
      "keyset is not this engine's JSON carrier (Tink-proto keysets are not " +
        "accepted — build one with KEYS.KEYSET_FROM_JSON / KEYS.NEW_KEYSET): " +
        e.getMessage) }
    require(root.has("primaryKeyId") && root.has("key"),
      "keyset JSON needs primaryKeyId and key[]")
    val keys = root.get("key").elements()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    while (keys.hasNext) {
      val k = keys.next()
      require(k.has("keyId") && k.has("type") && k.has("key"),
        "each keyset entry needs keyId, type, key")
      require(k.get("type").asText() == "AES_GCM",
        s"unsupported key type '${k.get("type").asText()}' (AES_GCM only)")
      val raw = hexToBytes(k.get("key").asText())
      require(raw.length == 16 || raw.length == 32,
        s"AES_GCM key must be 16 or 32 bytes, got ${raw.length}")
      out += ((k.get("keyId").asInt(), raw))
    }
    require(out.nonEmpty, "keyset has no keys")
    val ks = Keyset(root.get("primaryKeyId").asInt(), out.toSeq)
    ks.primary // validate primary exists
    ks
  }

  def render(ks: Keyset): String = {
    val entries = ks.keys.map { case (id, raw) =>
      s"""{"keyId":$id,"type":"AES_GCM","key":"${bytesToHex(raw)}"}"""
    }
    s"""{"primaryKeyId":${ks.primaryKeyId},"key":[${entries.mkString(",")}]}"""
  }

  def hexToBytes(s: String): Array[Byte] = {
    require(s.length % 2 == 0 && s.forall(c => Character.digit(c, 16) >= 0),
      s"not a hex string: ${s.take(20)}")
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }
  def bytesToHex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  private def cipher(mode: Int, key: Array[Byte], iv: Array[Byte],
                     aad: Array[Byte]): javax.crypto.Cipher = {
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, iv))
    if (aad.nonEmpty) c.updateAAD(aad)
    c
  }

  /** `[0x01][keyId BE][IV][ct+tag]` under the PRIMARY key. */
  def encrypt(ks: Keyset, pt: Array[Byte], aad: Array[Byte],
              rng: java.security.SecureRandom): Array[Byte] = {
    val (kid, key) = ks.primary
    val iv = new Array[Byte](12)
    rng.nextBytes(iv)
    val ct = cipher(javax.crypto.Cipher.ENCRYPT_MODE, key, iv, aad).doFinal(pt)
    val out = java.nio.ByteBuffer.allocate(1 + 4 + 12 + ct.length)
    out.put(1.toByte).putInt(kid).put(iv).put(ct)
    out.array()
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
    val key = ks.keys.find(_._1 == kid).map(_._2).getOrElse(
      throw new IllegalArgumentException(s"ciphertext key id $kid is not in the keyset"))
    val iv = new Array[Byte](12); buf.get(iv)
    val ct = new Array[Byte](buf.remaining()); buf.get(ct)
    cipher(javax.crypto.Cipher.DECRYPT_MODE, key, iv, aad).doFinal(ct)
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

/** KEYS.NEW_KEYSET('AEAD_AES_GCM_256') — one fresh random 256-bit key,
  * keyId 1, primary. NONDETERMINISTIC like BigQuery's (deterministic
  * overridden so the optimizer never folds or CSEs it).
  */
case class NewKeyset(keyType: String) extends Expression {
  require(keyType == "AEAD_AES_GCM_256" || keyType == "AEAD_AES_GCM_128",
    s"KEYS.NEW_KEYSET supports AEAD_AES_GCM_256 / AEAD_AES_GCM_128, got '$keyType'")
  override def children: Seq[Expression] = Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override lazy val deterministic: Boolean = false
  @transient private lazy val rng = new java.security.SecureRandom()
  def compute(): Array[Byte] = {
    val raw = new Array[Byte](if (keyType.endsWith("128")) 16 else 32)
    rng.nextBytes(raw)
    Aead.render(Aead.Keyset(1, Seq((1, raw)))).getBytes("UTF-8")
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
  require(keyType == "AES_GCM", s"ADD_KEY_FROM_RAW_BYTES supports 'AES_GCM', got '$keyType'")
  override def left: Expression = first
  override def right: Expression = third
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  def compute(ksb: Array[Byte], raw: Array[Byte]): Array[Byte] = {
    require(raw.length == 16 || raw.length == 32,
      s"AES_GCM raw key must be 16 or 32 bytes, got ${raw.length}")
    val ks = Aead.parse(ksb)
    val nid = ks.keys.map(_._1).max + 1
    Aead.render(ks.copy(keys = ks.keys :+ ((nid, raw)))).getBytes("UTF-8")
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
    Aead.encrypt(Aead.parse(ks), pt.getBytes, aad.getBytes, rng)
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
      val pt = Aead.decrypt(Aead.parse(ks), ct, aad.getBytes)
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
