package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text index sink: at import time, literals of configured predicates
  * additionally emit derived (token / phonetic / stem) quads, mirroring
  * the reference's text-index pipeline (`src/frontend/import.c:603-660`;
  * predicates `fs:token`, `fs:dmetaphone`, `fs:stem` hashed at
  * `src/common/hash.c:104-107`).
  *
  * Divergences (documented): the phonetic key is Spark's codegen'd
  * `soundex` instead of double-metaphone; the stemmer is a suffix-stripper
  * expression chain instead of Snowball — both keep the pipeline pure
  * column expressions (no UDF in the import hot path).
  */
object FullText {
  val tokenPred = "http://4store.org/fulltext#token"
  val stemPred = "http://4store.org/fulltext#stem"
  val phoneticPred = "http://4store.org/fulltext#dmetaphone"

  val tokenPredRid: Long = Rid.uri(tokenPred)
  val stemPredRid: Long = Rid.uri(stemPred)
  val phoneticPredRid: Long = Rid.uri(phoneticPred)

  /** tokenizer boundary set, as the reference's `is_bound` */
  private val boundaryRe = "[^a-z0-9]+"

  private def tokens(lex: Column): Column =
    filter(split(lower(lex), boundaryRe), t => length(t) > 0)

  /** crude suffix-stripping stem (reference uses Snowball) */
  def stem(tok: Column): Column = {
    val s1 = regexp_replace(tok, "(sses|ies)$", "ss")
    val s2 = regexp_replace(s1, "([^s])s$", "$1")
    val s3 = regexp_replace(s2, "(ing|edly|ed)$", "")
    regexp_replace(s3, "(ly|ment)$", "")
  }

  /** Given flat import rows (sLex/pLex/oLex...) and the set of indexed
    * predicate URIs, emit the derived token/stem/phonetic quads
    * (subject keeps the original subject, object is the derived literal).
    */
  def derivedQuads(flat: DataFrame, indexedPredicates: Set[String])
      : DataFrame = {
    val lit0 = flat.filter(col("oKind") === 0 &&
      col("pLex").isin(indexedPredicates.toSeq: _*))
    val tok = lit0.select(col("gLex"), col("sKind"), col("sLex"),
      explode(tokens(col("oLex"))).as("tok"))
    val all = tok.select(col("gLex"), col("sKind"), col("sLex"),
      explode(array(
        struct(lit(tokenPred).as("pLex"), col("tok").as("oLex")),
        struct(lit(stemPred).as("pLex"), stem(col("tok")).as("oLex")),
        struct(lit(phoneticPred).as("pLex"),
          soundex(col("tok")).as("oLex")))).as("d"))
    all.select(col("gLex"), col("sKind"), col("sLex"),
        col("d.pLex").as("pLex"), lit(0).as("oKind"),
        col("d.oLex").as("oLex"), lit("").as("oDt"), lit("").as("oLang"))
      .distinct()
  }

  /** Build a store whose quads include the full-text derivations. */
  def withFullText(spark: org.apache.spark.sql.SparkSession,
                   flat: DataFrame, indexedPredicates: Set[String])
      : QuadStore = {
    val derived = derivedQuads(flat, indexedPredicates)
    QuadStore.fromFlat(spark, flat.unionByName(derived))
  }

  /** Search: subjects whose indexed text contains the token. */
  def searchToken(store: QuadStore, token: String): DataFrame =
    store.quads
      .filter(col("p") === tokenPredRid &&
        col("o") === Rid.literal(token.toLowerCase))
      .select(col("s")).distinct()
}
