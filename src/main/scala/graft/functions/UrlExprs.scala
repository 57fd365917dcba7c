package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization + registrable-host keying — the crawl-side
  * front door for per-domain operators (`Curation.capPerGroup`,
  * `leakageSafeSplit`): a crawl's million spellings of one page must
  * key to one canonical URL, and its million subdomains to one
  * registrable domain, before any per-domain cap or split means
  * anything.
  *
  * The canonicalization is RFC 3986 §6 normalization restricted to
  * rewrites a SQL oracle can replay exactly (every rule below is a
  * regex/string rewrite mirrored verbatim in the p53 DuckDB oracle —
  * cross-engine agreement is BY CONSTRUCTION, the same discipline as
  * the portable md5 hashes):
  *
  *  1. trim; strip the fragment (first `#` onward);
  *  2. lowercase scheme and authority; strip the scheme-default port
  *     (`:80` http, `:443` https);
  *  3. empty path → `/`;
  *  4. dot-segment + duplicate-slash resolution as the FIXPOINT of an
  *     ordered rewrite step (see [[UrlKernel.pathStep]]);
  *  5. drop tracking query params (`utm_*`, gclid, fbclid, msclkid,
  *     mc_eid, igshid, ref_src), preserving the rest in order; a
  *     query left empty loses its `?`.
  *
  * Non-URLs (no `scheme://`) pass through trimmed, unchanged.
  *
  * Registrable host: authority minus userinfo and port; IPv4 literals
  * stay whole; otherwise eTLD+1 against an embedded two-part-suffix
  * subset ([[UrlKernel.TwoPartSuffixes]] — the full Public Suffix List
  * is a network artifact; the subset covers the common ccTLD
  * registries and is the documented tradeoff). */
object UrlKernel {
  /** Two-part public suffixes recognized for eTLD+1 (sorted; embedded
    * subset of the PSL, mirrored in the p53 oracle). */
  val TwoPartSuffixes: Set[String] = Set(
    "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk", "co.za",
    "com.ar", "com.au", "com.br", "com.cn", "com.mx", "com.sg",
    "com.tr", "com.tw", "gov.uk", "ne.jp", "net.au", "or.jp",
    "org.au", "org.uk")

  private val TrackingExact: Set[String] = Set(
    "gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref_src")

  private val UrlRe =
    java.util.regex.Pattern.compile(
      "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?]*)(.*)$")
  private val Ipv4Re =
    java.util.regex.Pattern.compile("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$")
  private val HostishRe =
    java.util.regex.Pattern.compile("^[A-Za-z0-9.-]+$")

  /** A path segment that is neither "." nor ".." (RE2-compatible — no
    * lookahead, so the same pattern runs in DuckDB). */
  private val Seg = "(\\.[^/.][^/]*|\\.\\.[^/]+|[^/.][^/]*)"

  /** ONE ordered rewrite pass; [[resolvePath]] iterates it to fixpoint.
    * The oracle's recursive CTE applies the identical composition, so
    * the fixpoints agree by construction:
    *   r0 collapse `//`; r1 drop `/./`; r2 trailing `/.` → `/`;
    *   r3 `/seg/../` → `/`; r4 trailing `/seg/..` → `/`;
    *   r5 leading `/../` → `/`; r6 lone `/..` → `/`. */
  def pathStep(p: String): String =
    p.replaceAll("//", "/")
      .replaceAll("/\\./", "/")
      .replaceAll("/\\.$", "/")
      .replaceAll("/" + Seg + "/\\.\\./", "/")
      .replaceAll("/" + Seg + "/\\.\\.$", "/")
      .replaceAll("^/\\.\\./", "/")
      .replaceAll("^/\\.\\.$", "/")

  private def resolvePath(p0: String): String = {
    var p = p0
    var i = 0
    while (i < 64) { // paths are bounded; 64 passes >> any real depth
      val n = pathStep(p)
      if (n == p) return p
      p = n; i += 1
    }
    p
  }

  private def keepParam(param: String): Boolean = {
    if (param.isEmpty) return false
    val eq = param.indexOf('=')
    val name = if (eq < 0) param else param.substring(0, eq)
    !(name.startsWith("utm_") || TrackingExact.contains(name))
  }

  def canonicalizeUrl(u: UTF8String): UTF8String = {
    val trimmed = u.toString.trim
    val hash = trimmed.indexOf('#')
    val s = if (hash >= 0) trimmed.substring(0, hash) else trimmed
    val m = UrlRe.matcher(s)
    if (!m.matches()) return UTF8String.fromString(trimmed)
    val scheme = m.group(1).toLowerCase
    var auth = m.group(2).toLowerCase
    val rest = m.group(3)
    if (scheme == "http" && auth.endsWith(":80"))
      auth = auth.substring(0, auth.length - 3)
    else if (scheme == "https" && auth.endsWith(":443"))
      auth = auth.substring(0, auth.length - 4)
    val q = rest.indexOf('?')
    val path0 = if (q >= 0) rest.substring(0, q) else rest
    val query = if (q >= 0) rest.substring(q + 1) else null
    val path = resolvePath(if (path0.isEmpty) "/" else path0)
    val q2 =
      if (query == null) ""
      else {
        val kept = query.split("&", -1).filter(keepParam)
        if (kept.isEmpty) "" else kept.mkString("?", "&", "")
      }
    UTF8String.fromString(scheme + "://" + auth + path + q2)
  }

  /** eTLD+1 of a URL's host (or of a bare host string); "" when the
    * input is neither. */
  def registrableHost(u: UTF8String): UTF8String = {
    val trimmed = u.toString.trim
    val hash = trimmed.indexOf('#')
    val s = if (hash >= 0) trimmed.substring(0, hash) else trimmed
    val m = UrlRe.matcher(s)
    val host0 =
      if (m.matches()) m.group(2).toLowerCase
      else if (HostishRe.matcher(trimmed).matches()) trimmed.toLowerCase
      else return UTF8String.fromString("")
    val noUser = host0.substring(host0.lastIndexOf('@') + 1)
    val host = noUser.replaceAll(":[0-9]+$", "")
    if (Ipv4Re.matcher(host).matches())
      return UTF8String.fromString(host)
    val labels = host.split("\\.", -1)
    val n = labels.length
    if (n <= 2) return UTF8String.fromString(host)
    val two = labels(n - 2) + "." + labels(n - 1)
    val reg =
      if (TwoPartSuffixes.contains(two)) labels(n - 3) + "." + two
      else two
    UTF8String.fromString(reg)
  }
}

/** `canonicalize_url(url)`: see [[UrlKernel]]. */
final case class CanonicalizeUrl(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_url"
  override protected def nullSafeEval(input: Any): Any =
    UrlKernel.canonicalizeUrl(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UrlKernel.canonicalizeUrl($c)")
  override protected def withNewChildInternal(
      newChild: Expression): CanonicalizeUrl = copy(child = newChild)
}

/** `registrable_host(url_or_host)`: see [[UrlKernel]]. */
final case class RegistrableHost(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "registrable_host"
  override protected def nullSafeEval(input: Any): Any =
    UrlKernel.registrableHost(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UrlKernel.registrableHost($c)")
  override protected def withNewChildInternal(
      newChild: Expression): RegistrableHost = copy(child = newChild)
}
