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
  *  2. lowercase the scheme and the HOST portion of the authority
  *     (after the last `@` — RFC 3986 §6.2.2.1 makes only scheme and
  *     host case-insensitive; userinfo bytes pass through verbatim);
  *     strip the scheme-default port (`:80` http, `:443` https);
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
  * stay whole; otherwise eTLD+1 against a Public Suffix List snapshot
  * ([[UrlKernel.Psl]], loaded once per JVM from the classpath resource
  * `graft/psl_snapshot.dat` — scripts/gen_psl.py documents provenance
  * and regeneration; the p53/p55 oracles inline the SAME resource, so
  * cross-engine agreement is by construction). Full PSL semantics:
  * exception rules prevail, else the longest matching normal or
  * wildcard rule, else the default rule (last label); the registrable
  * domain is the public suffix plus one label. POLICY: PRIVATE-section
  * suffixes (github.io, herokuapp.com, …) are honored — for
  * capPerGroup/leakageSafeSplit two tenants of one hosting platform
  * are different sites, and treating the platform as one "domain" is
  * exactly the cross-tenant leakage those operators exist to prevent.
  * Degenerate inputs keep the old contract: a host that IS a public
  * suffix (or a bare TLD) keys as itself. */
object UrlKernel {
  /** Parsed PSL snapshot: normal rules, wildcard bases (`x` of `*.x`),
    * exception bases (`x` of `!x`). */
  final class PslTable(val normal: java.util.HashSet[String],
                       val wild: java.util.HashSet[String],
                       val exc: java.util.HashSet[String],
                       val rules: Seq[String])
  val Psl: PslTable = {
    val in = getClass.getResourceAsStream("/graft/psl_snapshot.dat")
    require(in != null, "missing resource graft/psl_snapshot.dat")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val rules =
      try src.getLines().map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("//")).toVector
      finally src.close()
    val n = new java.util.HashSet[String]()
    val w = new java.util.HashSet[String]()
    val e = new java.util.HashSet[String]()
    rules.foreach {
      case r if r.startsWith("!")   => e.add(r.substring(1))
      case r if r.startsWith("*.")  => w.add(r.substring(2))
      case r                        => n.add(r)
    }
    new PslTable(n, w, e, rules)
  }

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
    // lowercase only the host portion (after the LAST '@'): userinfo
    // is case-sensitive per RFC 3986 and must survive byte-for-byte
    val rawAuth = m.group(2)
    val at = rawAuth.lastIndexOf('@')
    var auth =
      rawAuth.substring(0, at + 1) + rawAuth.substring(at + 1).toLowerCase
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
    if (n <= 1) return UTF8String.fromString(host)
    // suffix strings labels(i)...labels(n-1), built right-to-left once
    val sufs = new Array[String](n)
    sufs(n - 1) = labels(n - 1)
    var b = n - 2
    while (b >= 0) { sufs(b) = labels(b) + "." + sufs(b + 1); b -= 1 }
    // PSL algorithm: the prevailing rule is an exception rule if one
    // matches; else the longest (leftmost-start) normal/wildcard match;
    // else the default rule (the bare TLD). Matches are label-aligned
    // because only whole-label suffixes are compared.
    var psStart = n - 1
    var excI = -1
    var j = 0
    while (j < n && excI < 0) {
      if (Psl.exc.contains(sufs(j))) excI = j
      j += 1
    }
    if (excI >= 0) psStart = excI + 1
    else {
      var k = 0
      var found = -1
      while (k < n && found < 0) {
        if (Psl.normal.contains(sufs(k)) ||
            (k + 1 < n && Psl.wild.contains(sufs(k + 1)))) found = k
        k += 1
      }
      if (found >= 0) psStart = found
    }
    val regStart = math.max(0, psStart - 1)
    val reg = if (regStart == 0) host else sufs(regStart)
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
