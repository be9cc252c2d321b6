package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.{Sampling, Url}

class UrlSpec extends SparkSuite {
  import spark.implicits._

  test("normalize applies the RFC 3986 syntax rules; non-URLs surface NULL") {
    val cases = Seq(
      // scheme+host case, default port, trailing slash, param sort, fragment
      "HTTP://Ex.Org:80/a/b/?b=2&a=1#frag" -> "http://ex.org/a/b?a=1&b=2",
      "https://EX.org:443" -> "https://ex.org/",
      // explicit non-default port kept; duplicate trailing slashes all go
      "https://ex.org:8443/x//" -> "https://ex.org:8443/x",
      // root path with query survives; path CASE is preserved (only
      // scheme/host are case-insensitive per the RFC)
      "http://ex.org/?z=1" -> "http://ex.org/?z=1",
      "ftp://Host/X" -> "ftp://host/X",
      // empty path -> '/', whitespace trimmed
      "  http://ex.org  " -> "http://ex.org/",
      // un-normalizable inputs surface NULL, never a garbage key
      "no-scheme.org/path" -> null,
      "://missing.scheme" -> null,
      "http://" -> null,
      null.asInstanceOf[String] -> null)
    val out = cases.map(_._1).toDF("url")
      .select(Url.normalize(F.col("url")).as("n")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    cases.map(_._2).zip(out).zip(cases.map(_._1)).foreach { case ((want, got), in) =>
      assert(got == want, s"normalize('$in') = '$got', want '$want'")
    }
  }

  test("domainOf extracts the lowercased host; port/path/userinfo never leak") {
    val cases = Seq(
      "HTTP://Ex.Org:8080/a?b=1#f" -> "ex.org",
      "https://sub.EX.org/x" -> "sub.ex.org",
      "not a url" -> null,
      null.asInstanceOf[String] -> null)
    val out = cases.map(_._1).toDF("url")
      .select(Url.domainOf(F.col("url")).as("d")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) => assert(got == want) }
  }

  test("dedupByUrl collapses messy spellings of one resource to the min-id witness") {
    val df = Seq(
      (1L, "HTTP://A.org:80/x?b=2&a=1"),
      (2L, "http://a.ORG/x/?a=1&b=2#frag"),   // same resource as 1
      (3L, "http://a.org/y"),
      (4L, "garbage"),                         // no identity: excluded
      (5L, "http://a.org/y/")                  // same as 3
    ).toDF("doc_id", "url")
    val out = Url.dedupByUrl(df, "doc_id", "url").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "http://a.org/x?a=1&b=2" -> ((1L, 2L)),
      "http://a.org/y" -> ((3L, 2L))))
  }

  test("capPerDomain keeps each domain's cap smallest-md5 rows (the S1 law), deterministically") {
    val docs = (1L to 200L).map(i => (i, s"http://d${i % 3}.org/p$i")).toDF("doc_id", "url")
    val out = Url.capPerDomain(docs, "doc_id", "url", cap = 7)
    // reference: window rank by (hash52, id) per domain
    val ref = docs.select(Url.domainOf(F.col("url")).as("domain"), F.col("doc_id"))
      .withColumn("rn", F.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("domain")
          .orderBy(Sampling.hash52(F.col("doc_id")), F.col("doc_id"))))
      .filter(F.col("rn") <= 7).select("domain", "doc_id")
    assert(out.exceptAll(ref).count() == 0 && ref.exceptAll(out).count() == 0)
    assert(out.groupBy("domain").count().collect().forall(_.getLong(1) == 7))
    // cap past the group size keeps everything
    assert(Url.capPerDomain(docs, "doc_id", "url", cap = 1000).count() == 200)
    // partition-order invariance: same survivors from a reshuffled input
    val re = Url.capPerDomain(docs.repartition(13), "doc_id", "url", cap = 7)
    assert(re.exceptAll(out).count() == 0 && out.exceptAll(re).count() == 0)
  }

  test("dropBlockedDomains equals the plain anti join; NULL-domain rows pass") {
    val docs = Seq(
      (1L, "http://spam.org/a"), (2L, "http://ok.org/b"),
      (3L, "HTTPS://SPAM.ORG/c"), (4L, "no url"), (5L, "http://fine.org/d")
    ).toDF("doc_id", "url")
    val blocked = Seq("spam.org").toDF("domain")
    val cols = Seq("doc_id", "url", "domain").map(F.col)
    val out = Url.dropBlockedDomains(docs, "url", blocked, expectedItems = 4)
      .select(cols: _*)
    val plain = docs.withColumn("domain", Url.domainOf(F.col("url")))
    val expect = plain.filter(F.col("domain").isNull)
      .unionByName(plain.filter(F.col("domain").isNotNull)
        .join(blocked, Seq("domain"), "left_anti").select(cols: _*))
    assert(out.exceptAll(expect).count() == 0 && expect.exceptAll(out).count() == 0)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L, 5L))
    // blocklist frame must declare its key
    intercept[IllegalArgumentException] {
      Url.dropBlockedDomains(docs, "url", Seq("x").toDF("host"))
    }
  }

  test("PublicSuffix follows the PSL algorithm: longest rule, wildcard, exception, default") {
    import graft.functions.PublicSuffix._
    // multi-label ccSLD beats the default rule
    assert(publicSuffix("www.example.co.uk") == "co.uk")
    assert(regDomain("www.example.co.uk") == "example.co.uk")
    assert(regDomain("a.b.example.com.au") == "example.com.au")
    // default rule `*`: unknown TLDs resolve like two-label hosts
    assert(publicSuffix("deep.sub.example.com") == "com")
    assert(regDomain("deep.sub.example.com") == "example.com")
    assert(publicSuffix("x.unknowntld") == "unknowntld")
    assert(regDomain("x.unknowntld") == "x.unknowntld")
    // a host that IS a suffix registers nothing
    assert(publicSuffix("github.io") == "github.io")
    assert(regDomain("github.io") == null)
    assert(regDomain("user.github.io") == "user.github.io")
    assert(regDomain("com") == null)
    // wildcard *.ck: one extra label is still suffix space
    assert(publicSuffix("a.b.ck") == "b.ck")
    assert(regDomain("a.b.ck") == "a.b.ck")
    // exception !www.ck prevails over the wildcard
    assert(publicSuffix("www.ck") == "ck")
    assert(regDomain("www.ck") == "www.ck")
    assert(regDomain("foo.www.ck") == "www.ck")
    // invalid hosts: IPs, IPv6, empty labels, whitespace → null
    assert(publicSuffix("192.168.0.1") == null)
    assert(regDomain("[::1]") == null)
    assert(regDomain("a..b.com") == null)
    assert(regDomain("not a host") == null)
    // FQDN trailing dot and case fold
    assert(regDomain("WWW.Example.CO.UK.") == "example.co.uk")
  }

  test("capPerDomain buckets subdomain mirrors by registrable domain") {
    // two mirrors of one registrable domain, 4 docs each; cap=4 keyed
    // on raw host would keep all 8 — registrable-domain keying keeps 4
    val docs = (0L until 8L).map { i =>
      val sub = if (i % 2 == 0) "a" else "b"
      (i, s"https://$sub.example.co.uk/p$i")
    }.toDF("doc_id", "url")
    val kept = Url.capPerDomain(docs, "doc_id", "url", cap = 4).collect()
    assert(kept.length == 4, s"mirrors must share one bucket: got ${kept.length}")
    assert(kept.forall(_.getString(0) == "example.co.uk"))
    // hosts that register nothing still key (host fallback), never drop
    val bare = Seq((1L, "https://github.io/x"), (2L, "https://localhost/y"))
      .toDF("doc_id", "url")
    val keptBare = Url.capPerDomain(bare, "doc_id", "url", cap = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(keptBare == Set(("github.io", 1L), ("localhost", 2L)))
  }
}
