package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import graft.functions.aggregates

/** URL/domain curation — the FIRST stage of every published crawl
  * pipeline, before any text-level filter runs: C4 (Raffel et al.
  * 2020 §2.2) applies a URL blocklist, RefinedWeb (Penedo et al.
  * 2023) runs URL-level exact dedup and per-domain caps so one
  * mirror-heavy host cannot dominate the corpus. The reference's
  * keyed-dedup ("unique keys") and check-then-act guards are the same
  * shapes one level up — here the key is the normalized URL / the
  * registered host.
  *
  * All derivations are map-only codegen'd built-ins in the
  * Java-regex ∩ RE2 shared dialect (the E7/E11 recipe), so every
  * stage replays verbatim in a SQL oracle. Query-parameter sorting is
  * byte-order over the raw parameter strings — ASCII-identical across
  * engines; non-ASCII parameters would order by UTF-16 in Spark vs
  * UTF-8 in DuckDB (the E9 tie-order lesson), which no published
  * pipeline depends on.
  *
  * Scale shape: normalization and domain extraction are per-row
  * projections (no shuffle term); URL dedup is one keyed aggregate on
  * short string keys; the per-domain cap is the S1 bounded-TopK law
  * (≤ cap rows of state per partition per domain enter the exchange);
  * the blocklist is the A24 Bloom anti-join — definite-miss URLs pass
  * map-only and only candidate hits enter the exact join.
  */
object Url {

  /** Syntax-based URL normalization (the RFC 3986 §6 rules every URL
    * dedup applies before hashing):
    *   - scheme and host lowercase;
    *   - default ports dropped (`http:80`, `https:443`); explicit
    *     non-default ports kept;
    *   - fragment removed (never sent to the server — two URLs
    *     differing only in `#...` fetch the same resource);
    *   - trailing slashes stripped from the path, empty path → `/`;
    *   - query parameters sorted (byte order), empty query dropped.
    *
    * Input must be an absolute URL (`scheme://...`); anything else —
    * including NULL — yields NULL, so malformed rows surface instead
    * of colliding on a garbage key.
    */
  def normalize(url: Column): Column = {
    val t = F.trim(url)
    val scheme = F.lower(F.regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = F.regexp_replace(t, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noFrag = F.regexp_replace(rest, "#.*$", "")
    val authority = F.regexp_extract(noFrag, "^([^/?]*)", 1)
    val afterAuth = F.regexp_replace(noFrag, "^[^/?]*", "")
    val host = F.lower(F.regexp_extract(authority, "^([^:]*)", 1))
    val port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    val normPort = F.when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), F.lit(""))
      .otherwise(F.concat(F.lit(":"), port))
    val path = F.regexp_extract(afterAuth, "^([^?]*)", 1)
    val stripped = F.regexp_replace(path, "/+$", "")
    val normPath = F.when(stripped === "", F.lit("/")).otherwise(stripped)
    val query = F.regexp_extract(afterAuth, "\\?(.*)$", 1)
    val normQuery = F.when(query === "", F.lit(""))
      .otherwise(F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&")))
    F.when(scheme === "" || host === "", F.lit(null).cast("string"))
      .otherwise(F.concat(scheme, F.lit("://"), host, normPort, normPath, normQuery))
  }

  /** Lowercased host of an absolute URL; NULL when there is none.
    * (Registrable-domain folding — `a.example.co.uk` → `example.co.uk`
    * — is [[registrableDomainOf]], over the embedded PSL snapshot.)
    */
  def domainOf(url: Column): Column = {
    val host = F.lower(F.regexp_extract(F.trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))
    F.when(host === "", F.lit(null).cast("string")).otherwise(host)
  }

  /** Registrable domain of an absolute URL's host
    * (`a.example.co.uk` → `example.co.uk`) via the embedded
    * public-suffix snapshot ([[graft.functions.PublicSuffix]]);
    * falls back to the HOST itself when nothing is registered under
    * it (the host IS a suffix, e.g. `github.io`, or a single label)
    * so grouping keys never silently vanish. NULL when the URL has
    * no host.
    */
  def registrableDomainOf(url: Column): Column = {
    val host = domainOf(url)
    F.coalesce(graft.functions.native.reg_domain(host), host)
  }

  /** URL-exact dedup over NORMALIZED URLs: one row per distinct
    * normalized URL with its keeper (min id — the C1 witness rule)
    * and carrier count. Rows whose URL fails to normalize (NULL) are
    * excluded — they have no identity to collapse on. One keyed
    * aggregate with map-side partials.
    */
  def dedupByUrl(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs
      .select(F.col(idCol), normalize(F.col(urlCol)).as("url_norm"))
      .filter(F.col("url_norm").isNotNull)
      .groupBy("url_norm")
      .agg(F.min(F.col(idCol)).as("keep_id"), F.count(F.lit(1)).as("n_dups"))

  /** Per-domain cap: keep at most `cap` documents of each
    * REGISTRABLE DOMAIN — the RefinedWeb anti-mirror rule. Keyed on
    * [[registrableDomainOf]] (r10): subdomain-split mirrors
    * (`a.example.com` / `b.example.com`, `www.` duplicates) share ONE
    * cap bucket, which raw-host keying let slip. Deterministic via
    * the S1 law (each domain's `cap` smallest-md5(id) rows through
    * the bounded TopK aggregate — ≤ cap rows of state per partition
    * per domain, never a window over the corpus); RNG-free, so
    * re-runs and incremental re-processing keep the same survivors.
    * Emits (domain, idCol).
    */
  def capPerDomain(docs: DataFrame, idCol: String, urlCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be positive, got $cap")
    docs
      .select(registrableDomainOf(F.col(urlCol)).as("domain"), F.col(idCol))
      .filter(F.col("domain").isNotNull && F.col(idCol).isNotNull)
      .groupBy("domain")
      .agg(aggregates.top_k_by_score(
        -Sampling.hash52(F.col(idCol)).cast("double"), F.col(idCol), cap).as("__top"))
      .select(F.col("domain"), F.explode(F.col("__top.id")).as(idCol))
  }

  /** Domain-blocklist filter: drop every document whose host is on
    * the list (C4's blocklist stage), via the A24 Bloom-reduced anti
    * join — at web scale the blocklist is past broadcast size but its
    * key set sketches into megabytes; definite-miss documents pass
    * MAP-ONLY and only Bloom hits enter the exact join, so the result
    * is EXACTLY the plain anti join. Decorates with `domain` (NULL
    * domains pass — no host to block on).
    */
  def dropBlockedDomains(docs: DataFrame, urlCol: String, blocked: DataFrame,
                         expectedItems: Long = 1000000L): DataFrame = {
    require(blocked.columns.contains("domain"),
      s"blocklist must carry a 'domain' column, got ${blocked.columns.mkString(", ")}")
    val decorated = docs.withColumn("domain", domainOf(F.col(urlCol)))
    val blockable = decorated.filter(F.col("domain").isNotNull)
    val unblockable = decorated.filter(F.col("domain").isNull)
    BloomJoin.antiJoin(blockable, blocked.select("domain"), Seq("domain"), expectedItems)
      .unionByName(unblockable)
  }
}
