package graft.rdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64

/** RID encoding: every term is a 64-bit tagged hash, mirroring the
  * reference's scheme (`src/common/4s-hash.h:8-13`): top 2 bits `11` = URI,
  * `10` = bnode, `0x` = literal. Literal RIDs are salted with their
  * attribute RID (datatype or language tag, `src/common/4s-hash.h:70`), so
  * `"5"^^xsd:int`, `"5"^^xsd:string` and `"5"@en` get distinct RIDs.
  *
  * The hash is xxhash64 with Spark's seed (42): plan-side constants (this
  * file's Scala functions) and data-side columns (`xxhash64(...)`, codegen'd
  * whole-stage) produce identical values, so constant quad-pattern slots
  * push down as plain Long equality predicates on the quads table.
  *
  * Hash-collision stance matches the reference (probabilistic identity,
  * `website/publications/harris-ssws09.pdf` §3): 62 usable bits.
  */
object Rid {
  val TagUri: Long   = 0xC000000000000000L
  val TagBNode: Long = 0x8000000000000000L
  // literals: top bit 0 (we use top 2 bits = 00)
  private val Payload = 0x3FFFFFFFFFFFFFFFL // low 62 bits
  private val Seed = 42L // Spark's xxhash64 default seed

  /** Scala-side xxhash64 of a UTF-8 string, identical to Spark's
    * `xxhash64(stringCol)`. */
  def xx(s: String, seed: Long = Seed): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
  }

  def uri(v: String): Long   = TagUri | (xx(v) & Payload)
  def bnode(l: String): Long = TagBNode | (xx(l) & Payload)

  /** Attribute RID of a literal: datatype URI RID, or language-tag RID, or
    * 0 for plain literals. */
  def attr(dt: String, lang: String): Long =
    if (lang.nonEmpty) xx(lang) & Payload
    else if (dt.nonEmpty && dt != Xsd.string) uri(dt)
    else 0L

  def literal(lex: String, dt: String = "", lang: String = ""): Long =
    XXH64.hashLong(attr(dt, lang), xx(lex)) & Payload

  def of(t: Term): Long = t match {
    case Uri(v)            => uri(v)
    case BNode(l)          => bnode(l)
    case Lit(lex, dt, lang) => literal(lex, dt, lang)
  }

  // ---- column-side equivalents (codegen-friendly, no UDFs) ----

  /** RID of a URI string column. */
  def uriCol(c: Column): Column =
    lit(TagUri).bitwiseOR(xxhash64(c).bitwiseAND(lit(Payload)))

  def bnodeCol(c: Column): Column =
    lit(TagBNode).bitwiseOR(xxhash64(c).bitwiseAND(lit(Payload)))

  /** RID of a literal column given its attribute RID column.
    * Matches `xxhash64(lex, attr)` = hashLong(attr, hash(lex, 42)).
    * IMPORTANT: attrRid must be non-null (0 for plain literals) — Spark's
    * hash functions skip null children, which would diverge from the
    * Scala-side `literal()`. */
  def literalCol(lex: Column, attrRid: Column): Column =
    xxhash64(lex, coalesce(attrRid, lit(0L))).bitwiseAND(lit(Payload))

  /** Attribute RID column of a literal: lang-tag hash, else datatype URI
    * RID, else 0 (mirrors `fs_hash_literal`'s attr salt). */
  def attrCol(dt: Column, lang: Column): Column =
    when(coalesce(lang, lit("")) =!= "",
        xxhash64(lang).bitwiseAND(lit(Payload)))
      .when(coalesce(dt, lit("")) =!= "" && dt =!= lit(Xsd.string),
        uriCol(dt))
      .otherwise(lit(0L))

  // ---- driver-side tag tests (formatters, result post-processing) ----
  def isUri(rid: Long): Boolean = (rid & TagUri) == TagUri
  def isBNode(rid: Long): Boolean = (rid & TagUri) == TagBNode
  def isLiteral(rid: Long): Boolean = (rid & TagBNode) == 0L

  // ---- tag tests (pure Long ops, reference `src/common/4s-hash.h`) ----
  def isUriCol(rid: Column): Column =
    rid.bitwiseAND(lit(TagUri)) === lit(TagUri)
  def isBNodeCol(rid: Column): Column =
    rid.bitwiseAND(lit(TagUri)) === lit(TagBNode)
  def isLiteralCol(rid: Column): Column =
    rid.bitwiseAND(lit(TagBNode)) === lit(0L)

  /** ORDER BY type rank: unbound(0) < bnode(1) < URI(2) < literal(3)
    * (reference comparator `src/frontend/order.c:66-127`). */
  def typeRankCol(rid: Column): Column =
    when(rid.isNull, 0)
      .when(isBNodeCol(rid), 1)
      .when(isUriCol(rid), 2)
      .otherwise(3)
}
