package graft

import graft.functions.IpBytes

/** NET.IP_* family: parser/formatter vectors (RFC 5952 + inet_pton
  * strictness), mask/trunc byte arithmetic, int64 round trips, and
  * the SQL surface through GraftSql.load.
  */
class NetIpSpec extends SparkSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("IPv4 parse: strict dotted quad") {
    assert(hex(IpBytes.parse("192.0.2.1", safe = false)) == "c0000201")
    assert(hex(IpBytes.parse("0.0.0.0", safe = false)) == "00000000")
    assert(hex(IpBytes.parse("255.255.255.255", safe = false)) == "ffffffff")
    // rejected forms: leading zeros, out of range, wrong arity, junk
    for (bad <- Seq("256.0.0.1", "01.2.3.4", "1.2.3", "1.2.3.4.5", "1..2.3",
        "1.2.3.4 ", " 1.2.3.4", "a.b.c.d", "1.2.3.-4", "1.2.3.4x", "")) {
      assert(IpBytes.parseOrNull(bad) == null, s"should reject: '$bad'")
      intercept[IllegalArgumentException](IpBytes.parse(bad, safe = false))
      assert(IpBytes.parse(bad, safe = true) == null)
    }
  }

  test("IPv6 parse: full, compressed, embedded IPv4, rejections") {
    assert(hex(IpBytes.parse("2001:db8::1", safe = false)) ==
      "20010db8000000000000000000000001")
    assert(hex(IpBytes.parse("2001:0db8:0000:0000:0000:0000:0000:0001", safe = false)) ==
      "20010db8000000000000000000000001")
    assert(hex(IpBytes.parse("::", safe = false)) == "00" * 16)
    assert(hex(IpBytes.parse("::1", safe = false)) == "00" * 15 + "01")
    assert(hex(IpBytes.parse("1::", safe = false)) == "0001" + "00" * 14)
    assert(hex(IpBytes.parse("::ffff:192.0.2.1", safe = false)) ==
      "00000000000000000000ffffc0000201")
    assert(hex(IpBytes.parse("1:2:3:4:5:6:7.8.9.10", safe = false)) ==
      "0001000200030004000500060708090a")
    assert(hex(IpBytes.parse("ABCD:EF01::", safe = false)) == "abcdef01" + "00" * 12)
    for (bad <- Seq(":::", "1:::2", "1::2::3", "1:2:3:4:5:6:7", "1:2:3:4:5:6:7:8:9",
        "12345::", "g::1", "1:2:3:4:5:6:7:8:", ":1:2:3:4:5:6:7:8", "::%eth0",
        "1:2:3.4.5.6::", "::ffff:300.0.0.1", "1:2:3:4:5:6:1.2.3.4.5")) {
      assert(IpBytes.parseOrNull(bad) == null, s"should reject: '$bad'")
    }
    // '::' standing for exactly one group is legal (7 explicit groups)
    assert(hex(IpBytes.parse("1:2:3:4:5:6:7::", safe = false)) ==
      "00010002000300040005000600070000")
    // ...but eight explicit groups plus '::' is not
    assert(IpBytes.parseOrNull("1:2:3:4:5:6:7:8::") == null)
  }

  test("IPv6 format: RFC 5952 canonical text") {
    def rt(s: String) = IpBytes.format(IpBytes.parse(s, safe = false))
    assert(rt("2001:0db8:0000:0000:0000:0000:0000:0001") == "2001:db8::1")
    assert(rt("::") == "::")
    assert(rt("::1") == "::1")
    assert(rt("1::") == "1::")
    // longest zero run wins; leftmost on ties
    assert(rt("2001:0:0:1:0:0:0:1") == "2001:0:0:1::1")
    assert(rt("1:0:0:1:0:0:0:1") == "1:0:0:1::1")
    // a single zero group is never compressed
    assert(rt("2001:db8:0:1:1:1:1:1") == "2001:db8:0:1:1:1:1:1")
    // lowercase hex, no leading zeros
    assert(rt("ABCD:EF01:2345:6789:ABCD:EF01:2345:6789") ==
      "abcd:ef01:2345:6789:abcd:ef01:2345:6789")
    // IPv4-mapped prints embedded-dotted; plain v4-compatible does not
    assert(rt("::ffff:192.0.2.1") == "::ffff:192.0.2.1")
    assert(rt("::192.0.2.1") == "::c000:201")
    assert(IpBytes.format(IpBytes.parse("10.20.30.40", safe = false)) == "10.20.30.40")
    intercept[IllegalArgumentException](IpBytes.format(Array[Byte](1, 2, 3)))
  }

  test("mask, trunc, int64 round trips") {
    assert(hex(IpBytes.mask(4, 0)) == "00000000")
    assert(hex(IpBytes.mask(4, 1)) == "80000000")
    assert(hex(IpBytes.mask(4, 20)) == "fffff000")
    assert(hex(IpBytes.mask(4, 32)) == "ffffffff")
    assert(hex(IpBytes.mask(16, 56)) == "ffffffffffffff" + "00" * 9)
    intercept[IllegalArgumentException](IpBytes.mask(5, 8))
    intercept[IllegalArgumentException](IpBytes.mask(4, 33))
    intercept[IllegalArgumentException](IpBytes.mask(16, -1))

    val ip = IpBytes.parse("192.0.2.130", safe = false)
    assert(IpBytes.format(IpBytes.trunc(ip, 24)) == "192.0.2.0")
    assert(IpBytes.format(IpBytes.trunc(ip, 25)) == "192.0.2.128")
    assert(IpBytes.format(IpBytes.trunc(ip, 0)) == "0.0.0.0")
    assert(IpBytes.format(IpBytes.trunc(ip, 32)) == "192.0.2.130")
    val ip6 = IpBytes.parse("2001:db8:abcd:12ff::1", safe = false)
    assert(IpBytes.format(IpBytes.trunc(ip6, 56)) == "2001:db8:abcd:1200::")
    intercept[IllegalArgumentException](IpBytes.trunc(ip, 33))

    assert(IpBytes.v4ToInt64(IpBytes.parse("192.0.2.1", safe = false)) == 3221225985L)
    assert(hex(IpBytes.v4FromInt64(3221225985L)) == "c0000201")
    // the negative-int32 alias of the same bytes
    assert(hex(IpBytes.v4FromInt64(-1073741311L)) == "c0000201")
    assert(IpBytes.v4ToInt64(IpBytes.v4FromInt64(0L)) == 0L)
    assert(IpBytes.v4ToInt64(IpBytes.v4FromInt64(4294967295L)) == 4294967295L)
    intercept[IllegalArgumentException](IpBytes.v4FromInt64(4294967296L))
    intercept[IllegalArgumentException](IpBytes.v4FromInt64(-2147483649L))
    intercept[IllegalArgumentException](IpBytes.v4ToInt64(Array[Byte](1, 2, 3)))
  }

  test("SQL surface: NET.IP_* through GraftSql.load") {
    val df = GraftSql.load(spark,
      """SELECT
        |  TO_HEX(NET.IP_FROM_STRING('192.0.2.130')) AS v4hex,
        |  NET.IP_TO_STRING(NET.IP_TRUNC(NET.IP_FROM_STRING('192.0.2.130'), 24)) AS net24,
        |  NET.IP_TO_STRING(NET.IP_FROM_STRING('2001:0DB8:0:0:0:0:0:1')) AS v6canon,
        |  NET.SAFE_IP_FROM_STRING('not-an-ip') AS bad,
        |  NET.IPV4_TO_INT64(NET.IPV4_FROM_INT64(3221226114)) AS rt,
        |  TO_HEX(NET.IP_NET_MASK(4, 20)) AS mask20""".stripMargin)
    val r = df.head()
    assert(r.getString(0) == "c0000282")
    assert(r.getString(1) == "192.0.2.0")
    assert(r.getString(2) == "2001:db8::1")
    assert(r.isNullAt(3))
    assert(r.getLong(4) == 3221226114L)
    assert(r.getString(5) == "fffff000")
    // strict parse raises mid-query; SAFE is the stated alternative
    val err = intercept[Exception](
      GraftSql.load(spark, "SELECT NET.IP_FROM_STRING('999.1.2.3') AS x").collect())
    assert(err.getMessage != null)
  }

  test("SQL louds: arity and domain errors") {
    intercept[IllegalArgumentException](
      GraftSql.load(spark, "SELECT NET.IP_FROM_STRING('1.2.3.4', 'extra') AS x"))
    val e1 = intercept[Exception](
      GraftSql.load(spark, "SELECT NET.IP_NET_MASK(5, 8) AS x").collect())
    assert(e1.getMessage.contains("num_output_bytes") || e1.getMessage.contains("4 or 16"))
    val e2 = intercept[Exception](
      GraftSql.load(spark, "SELECT NET.IPV4_TO_INT64(NET.IP_FROM_STRING('::1')) AS x").collect())
    assert(e2.getMessage.contains("4 bytes") || e2.getCause != null)
  }
}
