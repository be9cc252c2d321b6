package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery's code-point string verbs as native codegen'd expressions:
  * TO_CODE_POINTS / CODE_POINTS_TO_STRING / CODE_POINTS_TO_BYTES plus
  * the scalar trio UNICODE / ASCII / CHR and the delimiter-aware
  * INITCAP. All exact integer/text transforms — no locale tables
  * except java.lang.Character's Unicode case maps (the same UCD data
  * every engine ships).
  *
  * Semantics pinned to BigQuery's:
  *  - TO_CODE_POINTS(STRING) walks CODE POINTS (an astral char is one
  *    element, never a surrogate pair); TO_CODE_POINTS(BYTES) yields
  *    the unsigned byte values 0..255.
  *  - CODE_POINTS_TO_STRING raises on negatives, surrogates and
  *    > U+10FFFF; CODE_POINTS_TO_BYTES raises outside [0, 255].
  *  - UNICODE = first code point (0 for empty); ASCII additionally
  *    RAISES when the first character is not ASCII (BigQuery's rule —
  *    UNICODE is the lenient sibling).
  *  - CHR(0) is the empty string; invalid code points raise. (Spark's
  *    own `chr` wraps at 256 — silently wrong for any BigQuery user,
  *    which is why CHR routes here.)
  *  - INITCAP(value [, delimiters]): words are maximal runs of
  *    non-delimiter characters; first character of each word
  *    uppercased, the rest lowercased, delimiters pass through. The
  *    default delimiter set is BigQuery's documented list (whitespace
  *    plus `[](){}/|\<>!?@"^#$&~_,.:;*%+-`).
  */
object CodePointOps {
  def fromString(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val out = new Array[Any](str.codePointCount(0, str.length))
    var i = 0; var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(k) = cp.toLong; k += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(out)
  }

  def fromBytes(b: Array[Byte]): GenericArrayData = {
    val out = new Array[Any](b.length)
    var i = 0
    while (i < b.length) { out(i) = (b(i) & 0xFF).toLong; i += 1 }
    new GenericArrayData(out)
  }

  private def checkCp(cp: Long, what: String): Unit =
    require(cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF),
      s"$what: invalid Unicode code point $cp")

  def toStr(a: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder(a.numElements())
    var i = 0
    while (i < a.numElements()) {
      require(!a.isNullAt(i), "CODE_POINTS_TO_STRING: NULL code point element")
      val cp = a.getLong(i)
      checkCp(cp, "CODE_POINTS_TO_STRING")
      sb.appendCodePoint(cp.toInt)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def toBytes(a: ArrayData): Array[Byte] = {
    val out = new Array[Byte](a.numElements())
    var i = 0
    while (i < a.numElements()) {
      require(!a.isNullAt(i), "CODE_POINTS_TO_BYTES: NULL element")
      val v = a.getLong(i)
      require(v >= 0 && v <= 255, s"CODE_POINTS_TO_BYTES: value $v outside [0, 255]")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  def unicodeOf(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) 0L else str.codePointAt(0).toLong
  }

  def asciiOf(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) 0L
    else {
      val cp = str.codePointAt(0)
      require(cp <= 127,
        f"ASCII: first character U+$cp%04X is not ASCII (UNICODE is the lenient form)")
      cp.toLong
    }
  }

  def chrOf(cp: Long): UTF8String = {
    if (cp == 0L) UTF8String.fromString("")
    else {
      checkCp(cp, "CHR")
      UTF8String.fromString(new String(Character.toChars(cp.toInt)))
    }
  }

  /** BigQuery's documented default INITCAP delimiters (plus all
    * Character.isWhitespace). */
  private val DefaultDelims = "[](){}/|\\<>!?@\"^#$&~_,.:;*%+-"

  def initcap(s: UTF8String, delims: String): UTF8String = {
    val str = s.toString
    val custom = delims != null
    def isDelim(cp: Int): Boolean =
      if (custom) delims.indexOf(cp) >= 0
      else Character.isWhitespace(cp) || (cp < 128 && DefaultDelims.indexOf(cp) >= 0)
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    var wordStart = true
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (isDelim(cp)) { sb.appendCodePoint(cp); wordStart = true }
      else if (wordStart) { sb.appendCodePoint(Character.toUpperCase(cp)); wordStart = false }
      else sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** RFC 4648 base32 + strict UTF-8 decoding — the remaining BYTES
  * text-codec verbs (TO_BASE64/FROM_BASE64/TO_HEX/FROM_HEX live in
  * the GraftSql rewrite on Spark natives; base32 has no Spark
  * native). Encoding uses the standard uppercase alphabet with '='
  * padding; decoding accepts either case, requires canonical padding,
  * and raises on anything else. SAFE_CONVERT_BYTES_TO_STRING decodes
  * strict UTF-8 and returns NULL on malformed input — where Spark's
  * CAST(b AS STRING) silently substitutes U+FFFD (the reason the
  * BigQuery verb never maps to a bare cast).
  */
object ByteCodecs {
  private val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  def toBase32(b: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder((b.length + 4) / 5 * 8)
    var i = 0
    while (i < b.length) {
      val chunk = math.min(5, b.length - i)
      var acc = 0L
      var j = 0
      while (j < chunk) { acc = (acc << 8) | (b(i + j) & 0xFFL); j += 1 }
      acc <<= (5 - chunk) * 8
      val outChars = chunk match {
        case 1 => 2; case 2 => 4; case 3 => 5; case 4 => 7; case 5 => 8
      }
      var k = 0
      while (k < outChars) { sb.append(Alphabet.charAt(((acc >> (35 - k * 5)) & 31L).toInt)); k += 1 }
      var pad = 8 - outChars
      while (pad > 0) { sb.append('='); pad -= 1 }
      i += chunk
    }
    UTF8String.fromString(sb.toString)
  }

  def fromBase32(s: UTF8String): Array[Byte] = {
    val str = s.toString
    require(str.length % 8 == 0,
      s"FROM_BASE32: length ${str.length} is not a multiple of 8 (canonical padding required)")
    if (str.isEmpty) return Array.emptyByteArray
    var pad = 0
    while (pad < str.length && str.charAt(str.length - 1 - pad) == '=') pad += 1
    require(Set(0, 1, 3, 4, 6).contains(pad), s"FROM_BASE32: invalid padding of $pad '='")
    val dataChars = str.length - pad
    val nBytes = dataChars * 5 / 8
    val out = new Array[Byte](nBytes)
    var acc = 0L; var bits = 0; var oi = 0; var i = 0
    while (i < dataChars) {
      val c = Character.toUpperCase(str.charAt(i))
      val v = Alphabet.indexOf(c)
      require(v >= 0, s"FROM_BASE32: invalid character '${str.charAt(i)}'")
      acc = (acc << 5) | v; bits += 5
      if (bits >= 8) { bits -= 8; out(oi) = ((acc >> bits) & 0xFF).toByte; oi += 1 }
      i += 1
    }
    require((acc & ((1L << bits) - 1)) == 0,
      "FROM_BASE32: non-zero trailing bits (not a canonical encoding)")
    out
  }

  def utf8OrNull(b: Array[Byte]): UTF8String =
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => null }
}

/** TO_BASE32(bytes). */
case class ToBase32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  def compute(b: Array[Byte]): UTF8String = ByteCodecs.toBase32(b)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("toBase32", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): ToBase32 =
    copy(child = newChild)
}

/** FROM_BASE32(string) — raises on non-canonical input. */
case class FromBase32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BinaryType
  def compute(s: UTF8String): Array[Byte] = ByteCodecs.fromBase32(s)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fromBase32", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): FromBase32 =
    copy(child = newChild)
}

/** SAFE_CONVERT_BYTES_TO_STRING — strict UTF-8, NULL on malformed. */
case class SafeBytesToString(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  def compute(b: Array[Byte]): UTF8String = ByteCodecs.utf8OrNull(b)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("safeBytesToString", this)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = $ref.compute($a);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): SafeBytesToString =
    copy(child = newChild)
}

/** TO_CODE_POINTS — STRING → code points, BYTES → unsigned byte values. */
case class ToCodePoints(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"TO_CODE_POINTS takes STRING or BYTES, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  def compute(v: Any): GenericArrayData = v match {
    case s: UTF8String => CodePointOps.fromString(s)
    case b: Array[Byte] => CodePointOps.fromBytes(b)
  }
  override def nullSafeEval(v: Any): Any = compute(v)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("toCodePoints", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): ToCodePoints =
    copy(child = newChild)
}

/** CODE_POINTS_TO_STRING — raises on invalid code points. */
case class CodePointsToString(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = StringType
  def compute(a: ArrayData): UTF8String = CodePointOps.toStr(a)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codePointsToString", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): CodePointsToString =
    copy(child = newChild)
}

/** CODE_POINTS_TO_BYTES — raises outside [0, 255]. */
case class CodePointsToBytes(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = BinaryType
  def compute(a: ArrayData): Array[Byte] = CodePointOps.toBytes(a)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codePointsToBytes", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): CodePointsToBytes =
    copy(child = newChild)
}

/** UNICODE — first code point, 0 for the empty string. */
case class UnicodeCp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  def compute(s: UTF8String): Long = CodePointOps.unicodeOf(s)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeCp", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): UnicodeCp =
    copy(child = newChild)
}

/** ASCII — like UNICODE but raises on a non-ASCII first character. */
case class AsciiCp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  def compute(s: UTF8String): Long = CodePointOps.asciiOf(s)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("asciiCp", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): AsciiCp =
    copy(child = newChild)
}

/** CHR — code point to string; 0 → empty; invalid raises. */
case class ChrCp(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = StringType
  def compute(cp: Long): UTF8String = CodePointOps.chrOf(cp)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chrCp", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): ChrCp =
    copy(child = newChild)
}

/** INITCAP with BigQuery's delimiter semantics; `delims == null` means
  * the documented default set. */
case class BqInitCap(child: Expression, delims: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  def compute(s: UTF8String): UTF8String = CodePointOps.initcap(s, delims)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bqInitCap", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): BqInitCap =
    copy(child = newChild)
}
