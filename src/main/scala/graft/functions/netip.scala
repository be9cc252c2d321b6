package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery's NET.IP_* family as native codegen'd expressions.
  *
  * IP addresses are carried exactly as BigQuery carries them: BYTES of
  * length 4 (IPv4) or 16 (IPv6), network byte order. Everything here
  * is exact byte/integer arithmetic — no doubles, no locale, no DNS
  * (the parser is a pure text scanner; a hostname is an ERROR, never a
  * lookup). All expressions implement `doGenCode` via the shared
  * reference-object pattern so call sites stay inside whole-stage
  * codegen (the file-wide discipline of native.scala).
  *
  * Parsing (NET.IP_FROM_STRING / NET.SAFE_IP_FROM_STRING):
  *  - IPv4: exactly four decimal octets 0..255 joined by '.'. Leading
  *    zeros are rejected ("010" is ambiguous octal in inet_aton —
  *    BigQuery's absl parser rejects it too).
  *  - IPv6: up to eight 1-4 digit hex groups joined by ':', one
  *    optional '::' compression, optional embedded dotted IPv4 as the
  *    final 32 bits ("::ffff:192.0.2.1"). Case-insensitive. Zone ids
  *    ("%eth0") are rejected.
  *  - The SAFE form returns NULL where the strict form raises.
  *
  * Formatting (NET.IP_TO_STRING) follows RFC 5952: lowercase hex, no
  * leading zeros inside a group, the LONGEST run of >=2 zero groups
  * compressed to '::' (leftmost on ties; a single zero group is never
  * compressed), and the IPv4-mapped prefix ::ffff:a.b.c.d printed in
  * embedded-dotted form (the one special case users actually hit —
  * other transitional forms print as plain hex groups; stated).
  */
object IpBytes {
  /** Parse an IP address string; null on failure when `safe`, raise otherwise. */
  def parse(s: String, safe: Boolean): Array[Byte] = {
    val out = parseOrNull(s)
    if (out == null && !safe)
      throw new IllegalArgumentException(
        s"NET.IP_FROM_STRING: '$s' is not a valid IPv4 or IPv6 address " +
          "(use NET.SAFE_IP_FROM_STRING for NULL-on-invalid)")
    out
  }

  def parseOrNull(s: String): Array[Byte] =
    if (s == null || s.isEmpty) null
    else if (s.indexOf(':') >= 0) parse6(s)
    else parse4(s)

  /** Strict dotted-quad IPv4: 4 octets, 0..255, no leading zeros. */
  private[functions] def parse4(s: String): Array[Byte] = {
    val out = new Array[Byte](4)
    var oct = 0; var i = 0; val n = s.length
    while (oct < 4) {
      val start = i
      var v = 0
      while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9' && v <= 255) {
        v = v * 10 + (s.charAt(i) - '0'); i += 1
      }
      val len = i - start
      if (len == 0 || len > 3 || v > 255) return null
      if (len > 1 && s.charAt(start) == '0') return null // leading zero
      out(oct) = v.toByte
      oct += 1
      if (oct < 4) {
        if (i >= n || s.charAt(i) != '.') return null
        i += 1
      }
    }
    if (i != n) null else out
  }

  /** IPv6 with one optional '::' and optional trailing embedded IPv4. */
  private[functions] def parse6(s: String): Array[Byte] = {
    // split on the (single) '::' if present
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return null
    val (headTxt, tailTxt, compressed) =
      if (dc >= 0) (s.substring(0, dc), s.substring(dc + 2), true)
      else (s, "", false)
    // parse one side into 16-bit groups, allowing an embedded IPv4 at
    // the very end of the LAST side that carries groups
    def groupsOf(txt: String, allowV4: Boolean): Array[Int] = {
      if (txt.isEmpty) return Array.emptyIntArray
      val parts = txt.split(":", -1)
      if (parts.exists(_.isEmpty)) return null // stray ':' (only '::' may compress)
      val buf = new Array[Int](parts.length + 1)
      var k = 0
      var pi = 0
      while (pi < parts.length) {
        val p = parts(pi)
        val last = pi == parts.length - 1
        if (last && allowV4 && p.indexOf('.') >= 0) {
          val v4 = parse4(p)
          if (v4 == null) return null
          buf(k) = ((v4(0) & 0xFF) << 8) | (v4(1) & 0xFF); k += 1
          buf(k) = ((v4(2) & 0xFF) << 8) | (v4(3) & 0xFF); k += 1
        } else {
          if (p.length > 4) return null
          var v = 0; var j = 0
          while (j < p.length) {
            val c = p.charAt(j)
            val d =
              if (c >= '0' && c <= '9') c - '0'
              else if (c >= 'a' && c <= 'f') c - 'a' + 10
              else if (c >= 'A' && c <= 'F') c - 'A' + 10
              else return null
            v = (v << 4) | d; j += 1
          }
          buf(k) = v; k += 1
        }
        pi += 1
      }
      java.util.Arrays.copyOf(buf, k)
    }
    // an embedded IPv4 is only legal as the LAST 32 bits of the whole
    // address: at the end of the head when there is no '::', or at the
    // end of the tail when there is ("1:2:3.4.5.6::" is invalid)
    val head = groupsOf(headTxt, allowV4 = !compressed)
    if (head == null) return null
    val tail = groupsOf(tailTxt, allowV4 = true)
    if (tail == null) return null
    val total = head.length + tail.length
    if (compressed) {
      if (total > 7) return null // '::' must stand for at least one group
    } else if (total != 8) return null
    val groups = new Array[Int](8)
    var gi = 0
    head.foreach { g => groups(gi) = g; gi += 1 }
    gi = 8 - tail.length
    tail.foreach { g => groups(gi) = g; gi += 1 }
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(i * 2) = ((groups(i) >> 8) & 0xFF).toByte
      out(i * 2 + 1) = (groups(i) & 0xFF).toByte
      i += 1
    }
    out
  }

  /** RFC 5952 text form; raises on lengths other than 4 or 16. */
  def format(b: Array[Byte]): String = b.length match {
    case 4 =>
      s"${b(0) & 0xFF}.${b(1) & 0xFF}.${b(2) & 0xFF}.${b(3) & 0xFF}"
    case 16 =>
      // IPv4-mapped special case: ::ffff:a.b.c.d
      var mapped = true
      var i = 0
      while (i < 10) { if (b(i) != 0) mapped = false; i += 1 }
      if (mapped && b(10) == -1 && b(11) == -1)
        return s"::ffff:${b(12) & 0xFF}.${b(13) & 0xFF}.${b(14) & 0xFF}.${b(15) & 0xFF}"
      val g = new Array[Int](8)
      i = 0
      while (i < 8) { g(i) = ((b(i * 2) & 0xFF) << 8) | (b(i * 2 + 1) & 0xFF); i += 1 }
      // longest run of >=2 zero groups, leftmost on ties
      var bestStart = -1; var bestLen = 0
      var runStart = -1; var runLen = 0
      i = 0
      while (i < 8) {
        if (g(i) == 0) {
          if (runStart < 0) { runStart = i; runLen = 0 }
          runLen += 1
          if (runLen > bestLen) { bestLen = runLen; bestStart = runStart }
        } else { runStart = -1; runLen = 0 }
        i += 1
      }
      if (bestLen < 2) { bestStart = -1; bestLen = 0 }
      val sb = new java.lang.StringBuilder(40)
      i = 0
      while (i < 8) {
        if (i == bestStart) {
          sb.append("::") // the full compression token, fore and aft
          i += bestLen
        } else {
          if (i > 0 && sb.length > 0 && sb.charAt(sb.length - 1) != ':') sb.append(':')
          sb.append(java.lang.Integer.toHexString(g(i)))
          i += 1
        }
      }
      sb.toString
    case other =>
      throw new IllegalArgumentException(
        s"NET.IP_TO_STRING: expected 4 or 16 bytes, got $other")
  }

  def mask(numBytes: Int, prefix: Int): Array[Byte] = {
    require(numBytes == 4 || numBytes == 16,
      s"NET.IP_NET_MASK: num_output_bytes must be 4 or 16, got $numBytes")
    require(prefix >= 0 && prefix <= numBytes * 8,
      s"NET.IP_NET_MASK: prefix_length must be in [0, ${numBytes * 8}], got $prefix")
    val out = new Array[Byte](numBytes)
    var bits = prefix
    var i = 0
    while (bits > 0) {
      val take = math.min(8, bits)
      out(i) = ((0xFF00 >> take) & 0xFF).toByte
      bits -= take; i += 1
    }
    out
  }

  def trunc(b: Array[Byte], prefix: Int): Array[Byte] = {
    require(b.length == 4 || b.length == 16,
      s"NET.IP_TRUNC: expected 4 or 16 bytes, got ${b.length}")
    require(prefix >= 0 && prefix <= b.length * 8,
      s"NET.IP_TRUNC: prefix_length must be in [0, ${b.length * 8}], got $prefix")
    val out = new Array[Byte](b.length)
    var bits = prefix
    var i = 0
    while (bits > 0) {
      val take = math.min(8, bits)
      out(i) = (b(i) & ((0xFF00 >> take) & 0xFF)).toByte
      bits -= take; i += 1
    }
    out
  }

  def v4FromInt64(v: Long): Array[Byte] = {
    require(v >= -2147483648L && v <= 4294967295L,
      s"NET.IPV4_FROM_INT64: value must be in [-0x80000000, 0xFFFFFFFF], got $v")
    val u = v & 0xFFFFFFFFL
    Array[Byte](((u >> 24) & 0xFF).toByte, ((u >> 16) & 0xFF).toByte,
      ((u >> 8) & 0xFF).toByte, (u & 0xFF).toByte)
  }

  def v4ToInt64(b: Array[Byte]): Long = {
    require(b.length == 4,
      s"NET.IPV4_TO_INT64: expected 4 bytes, got ${b.length}")
    ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) | ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
  }
}

/** NET.IP_FROM_STRING (safe=false) / NET.SAFE_IP_FROM_STRING (safe=true). */
case class IpFromString(child: Expression, safe: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  def compute(s: UTF8String): Array[Byte] = IpBytes.parse(s.toString, safe)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ipFromString", this)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = $ref.compute($a);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): IpFromString =
    copy(child = newChild)
}

/** NET.IP_TO_STRING — RFC 5952 text of 4/16-byte addresses. */
case class IpToString(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  def compute(b: Array[Byte]): UTF8String = UTF8String.fromString(IpBytes.format(b))
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ipToString", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): IpToString =
    copy(child = newChild)
}

/** NET.IP_NET_MASK(num_output_bytes, prefix_length). */
case class IpNetMask(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = BinaryType
  def compute(n: Long, p: Long): Array[Byte] = IpBytes.mask(n.toInt, p.toInt)
  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ipNetMask", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IpNetMask =
    copy(left = newLeft, right = newRight)
}

/** NET.IP_TRUNC(addr_bytes, prefix_length). */
case class IpTrunc(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, LongType)
  override def dataType: DataType = BinaryType
  def compute(b: Array[Byte], p: Long): Array[Byte] = IpBytes.trunc(b, p.toInt)
  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ipTrunc", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IpTrunc =
    copy(left = newLeft, right = newRight)
}

/** NET.IPV4_FROM_INT64 — low 32 bits of an int64 as 4 bytes. */
case class Ipv4FromInt64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  def compute(v: Long): Array[Byte] = IpBytes.v4FromInt64(v)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ipv4FromInt64", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): Ipv4FromInt64 =
    copy(child = newChild)
}

/** NET.IPV4_TO_INT64 — 4 bytes as an unsigned int64 in [0, 2^32). */
case class Ipv4ToInt64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  def compute(b: Array[Byte]): Long = IpBytes.v4ToInt64(b)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ipv4ToInt64", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): Ipv4ToInt64 =
    copy(child = newChild)
}
