package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** URL canonicalization and host/domain keying — the crawl-side
  * group-key producer for the per-domain curation operators. See
  * [[graft.functions.UrlKernel]] for the normalization spec (RFC 3986
  * §6 restricted to SQL-replicable rewrites) and the full
  * Public-Suffix-List registrable-host semantics (snapshot resource
  * `graft/psl_snapshot.dat`; exception > longest normal/wildcard >
  * default rule; PRIVATE-section suffixes honored). Both are native
  * codegen kernels: map-only, scan-speed, no UDF. */
object UrlOps {
  /** Canonical form of a URL column (non-URLs pass through trimmed). */
  def canonicalizeUrl(url: Column): Column =
    graft.functions.F.canonicalizeUrl(url)

  /** eTLD+1 of a URL (or bare host) column; "" for neither. */
  def registrableHost(url: Column): Column =
    graft.functions.F.registrableHost(url)

  /** Convenience: append `url_canon` and `registrable_host` columns —
    * the shape `capPerGroup(keyByDomain(df, "url"),
    * "registrable_host", …)` composes into a crawl-curation flow. */
  def keyByDomain(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("url_canon", canonicalizeUrl(df(urlCol)))
      .withColumn("registrable_host", registrableHost(df(urlCol)))

  /** Domain blocklist filter — the other half of the crawl front door:
    * drop every row whose eTLD+1 registrable host is on the blocklist
    * (spam/adult/SEO-farm domain lists are maintained at the
    * registrable-domain level, which is why eTLD+1 precision matters:
    * blocking `badsite.github.io` must not block every github.io
    * tenant, and blocking `spam.com.br` must not depend on the
    * subdomain spelling a crawler saw). Map-only: the kernel keys the
    * host and an `isin` literal filter does the rest — at 100 TB this
    * is a pushable scan-side predicate, no join (blocklists of real
    * size would broadcast-anti-join; the literal form covers the
    * common curated-list case). Rows with no host ('' — non-URLs)
    * pass, matching "filter what you can prove is blocked". */
  def dropBlockedHosts(df: DataFrame, urlCol: String,
                       blocked: Seq[String]): DataFrame =
    df.filter(!registrableHost(df(urlCol))
      .isin(blocked.map(_.toLowerCase): _*))
}
