package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Training-data pipeline operators over the documents/embeddings/events
  * tables: dedup family, similarity search, text analysis, sessionization.
  * SQL-expressible ops carry DuckDB oracles; LSH variants (engine-specific
  * hash seeds) are rows-only checked here and semantics-tested in
  * OperatorsSpec with planted near-duplicates.
  */
object PipelineQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: one representative per identical text
    "p01_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), col("text"), col("doc_id"))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")),

    // n-gram Jaccard similarity join (inverted index, exact)
    "p02_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          k = 3, threshold = 0.5)
        .orderBy("id1", "id2")),

    // MinHash-LSH near-dup candidates (engine-specific seeds: rows-only)
    "p03_minhash_pairs" -> ((s, d) =>
      Dedup.minhashPairs(t(s, d, "documents"), "doc_id", "text",
          k = 3, h = 32, bands = 16, threshold = 0.35, minBands = 2)
        .select("id1", "id2")
        .orderBy("id1", "id2")),

    // SimHash near-dup candidates (rows-only)
    "p04_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text",
          maxHamming = 8)
        .orderBy("id1", "id2")),

    // document fingerprint + token counts
    "p05_fingerprint_tokens" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")),

    // quality signals (map-only scoring pass)
    "p06_quality" -> ((s, d) =>
      TextAnalysis.qualitySignals(t(s, d, "documents"), "text")
        .select("doc_id", "n_tokens", "punct_ratio", "digit_ratio",
          "quality_score")
        .orderBy("doc_id")),

    // language ID heuristic (rows-only; accuracy asserted in spec)
    "p07_langid" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // BPE-ish subword count estimate
    "p08_subword_count" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.subwordCountEstimate(col("text")).as("n_subwords"))
        .orderBy("doc_id")),

    // brute-force cosine top-k (rank compare; scores are FP-sensitive)
    "p09_embed_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
        .select("query_id", "rank", "item_id")
        .orderBy("query_id", "rank")
    }),

    // LSH ANN variant (rows-only; recall asserted in spec)
    "p10_embed_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      Similarity.lshTopK(emb, queries, "vec_id", "embedding",
          k = 5, dim = 64, nPlanes = 16, bands = 8)
        .select("query_id", "rank", "item_id")
        .orderBy("query_id", "rank")
    }),

    // sessionization: 30-min-gap sessions per user over the event stream
    "p11_events_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapped = t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
              1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      gapped.groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("sess_start"))
        .orderBy("user_id", "sess_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "p01_dedup_exact" ->
      """SELECT doc_id, n_chars FROM (
        |  SELECT doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "p02_ngram_jaccard" ->
      """WITH ws AS (SELECT doc_id,
        |    list_filter(string_split(lower(text),' '), x -> len(x)>0) AS ws
        |  FROM documents),
        |sh0 AS (SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]))
        |    AS shingles FROM ws),
        |sh AS (SELECT doc_id, len(shingles) AS nsh, unnest(shingles) AS s
        |  FROM sh0),
        |pairs AS (SELECT a.doc_id id1, b.doc_id id2, a.nsh n1, b.nsh n2,
        |    count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1,2,3,4)
        |SELECT id1, id2, common::DOUBLE/(n1+n2-common) AS jaccard
        |FROM pairs WHERE common::DOUBLE/(n1+n2-common) >= 0.5
        |ORDER BY id1, id2""".stripMargin,

    "p05_fingerprint_tokens" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  len(list_filter(string_split(lower(text),' '), w -> len(w)>0))
        |    AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p06_quality" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(lower(text),' '), w -> len(w)>0))
        |    AS n_tokens,
        |  (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')))
        |    ::DOUBLE / greatest(len(text), 1) AS punct_ratio,
        |  (len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))
        |    ::DOUBLE / greatest(len(text), 1) AS digit_ratio,
        |  (CASE WHEN len(list_filter(string_split(lower(text),' '),
        |      w -> len(w)>0)) BETWEEN 5 AND 100000
        |    THEN 1.0 ELSE 0.2 END)
        |  * (1.0 - least((len(text) - len(regexp_replace(text,
        |      '[[:punct:]]', '', 'g')))::DOUBLE / greatest(len(text),1)*2,
        |      1.0))
        |  * (1.0 - least((len(text) - len(regexp_replace(text, '[0-9]',
        |      '', 'g')))::DOUBLE / greatest(len(text),1)*2, 1.0))
        |    AS quality_score
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p08_subword_count" ->
      """SELECT doc_id, CAST(list_sum(list_transform(
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      p -> len(p) > 0),
        |    p -> greatest(CAST(ceil(len(p)/4.0) AS BIGINT), 1)))
        |  AS BIGINT) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p09_embed_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
        |  FROM embeddings WHERE vec_id < 5),
        |scored AS (SELECT q.query_id, e.vec_id AS item_id,
        |    list_cosine_similarity(q.qvec, e.embedding) AS score
        |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
        |ranked AS (SELECT query_id, item_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, item_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, item_id FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "p11_events_sessionize" ->
      """WITH g AS (SELECT user_id, event_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM g)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |  COUNT(*) AS n_events, MIN(ts) AS sess_start
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin
  )
}
