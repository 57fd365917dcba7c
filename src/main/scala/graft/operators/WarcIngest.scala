package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WET/WARC ingest: from raw crawl file bodies to a documents frame —
  * the stage every CommonCrawl pipeline (CCNet §2, C4) runs before any
  * operator in this library sees text. The framing work is one
  * map-only pass through the native [[graft.functions.Warc]] kernel
  * (Content-Length-driven byte walk; see its scaladoc for the framing
  * and malformed-input contract), so ingest runs at scan speed and
  * parallelizes by FILE: feed it `spark.read.text` with
  * `wholetext=true`, `binaryFile` payloads decoded upstream, or any
  * (file, raw-body) frame. At 100 TB the unit of work is a WET file
  * (~150 MB uncompressed), which is also the natural Spark partition —
  * no shuffle anywhere until the caller aggregates.
  *
  * Compressed ingest (the actual CommonCrawl shape — `.warc.wet.gz`):
  *
  * {{{
  * val raw = spark.read.option("wholetext", "true")
  *   .text("s3://.../segments/.../wet/")      // *.warc.wet.gz
  *   .withColumnRenamed("value", "raw")
  * val docs = WarcIngest.wetDocuments(raw, "raw")
  * }}}
  *
  * Hadoop's codec layer decompresses by file extension before the text
  * reader sees bytes, and its built-in gzip decompressor handles
  * CONCATENATED MEMBERS (CommonCrawl tooling produces multi-member
  * files; spec-proven in OperatorsSpec with a two-member fixture).
  * Two hard bounds to respect at scale: (1) gzip is not splittable, so
  * one `.gz` file = one task — exactly the per-WET-file parallelism
  * this frame wants (a CC WET file is ~150 MB decompressed; do NOT
  * concatenate archives into multi-GB singles), and (2) a whole file
  * rides one `UTF8String`, whose byte array caps at ~2 GB DECOMPRESSED
  * — beyond that the task fails outright (never mis-frames); split
  * oversized inputs upstream.
  */
object WarcIngest {

  /** One row per framed record: input columns (minus `rawCol`) +
    * (rec_index, rec_type, uri, date, content_length, payload, valid).
    */
  def records(df: DataFrame, rawCol: String): DataFrame = {
    val added = Seq("rec_index", "rec", "rec_type", "uri", "date",
      "content_length", "payload", "valid")
    added.filter(c => c != rawCol && df.columns.contains(c))
      .foreach(c => throw new IllegalArgumentException(
        s"WarcIngest.records: input already carries output column " +
          s"'$c' — rename it before framing (the record fields would " +
          "collide and make downstream references ambiguous)"))
    val keep = df.columns.filterNot(_ == rawCol).map(col).toSeq
    df.select(keep :+
        posexplode(graft.functions.F.warcRecords(col(rawCol)))
          .as(Seq("rec_index", "rec")): _*)
      .select(keep ++ Seq(
        col("rec_index").cast("long").as("rec_index"),
        col("rec.rec_type").as("rec_type"),
        col("rec.uri").as("uri"),
        col("rec.date").as("date"),
        col("rec.content_length").as("content_length"),
        col("rec.payload").as("payload"),
        col("rec.valid").as("valid")): _*)
  }

  /** WET "conversion" records as a clean documents frame
    * (url, fetch_date, text) — invalid frames and non-conversion
    * records (warcinfo headers, request/response records in full WARC)
    * drop here; route `records()` output elsewhere to audit them. */
  def wetDocuments(df: DataFrame, rawCol: String): DataFrame = {
    Seq("url", "fetch_date", "text")
      .filter(c => c != rawCol && df.columns.contains(c))
      .foreach(c => throw new IllegalArgumentException(
        s"WarcIngest.wetDocuments: input already carries output " +
          s"column '$c' — rename it before framing"))
    records(df, rawCol)
      .filter(col("valid") && col("rec_type") === "conversion")
      .withColumnRenamed("uri", "url")
      .withColumnRenamed("date", "fetch_date")
      .withColumnRenamed("payload", "text")
      .drop("rec_type", "content_length", "valid")
  }
}
