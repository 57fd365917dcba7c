package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.rdf._

/** Structured Streaming ingest & event-time processing. The reference has
  * no continuous queries (SURVEY §2.9) — its chunked bulk import
  * (`fs_import_stream_*`, `src/frontend/import.c:191-331`) maps to a
  * file-source stream appending to the quads table; event-time windowed
  * aggregation and stateful sessionization are additive capabilities.
  */
object StreamIngest {

  /** Parse a stream of N-Triples/N-Quads lines into flat quad rows
    * (same row shape the batch importer uses). */
  def parseNtLines(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    lines.flatMap { line =>
      NTriples.parseLine(line).map { case (s, p, o, g) =>
        val (sk, sl) = s match {
          case Uri(v) => (1, v); case BNode(b) => (2, b); case _ => (0, "")
        }
        val pl = p match { case Uri(v) => v; case _ => "" }
        val (ok, ol, od, og) = o match {
          case Uri(v) => (1, v, "", "")
          case BNode(b) => (2, b, "", "")
          case Lit(lex, dt, lang) => (0, lex, dt, lang)
        }
        val gl = g match { case Some(Uri(v)) => v; case _ => "" }
        FlatQuad(gl, sk, sl, pl, ok, ol, od, og)
      }
    }.toDF()
  }

  /** Flat rows -> RID quads (columnar hashing, identical to batch). */
  def toQuads(flat: DataFrame): DataFrame = flat.select(
    when(col("gLex").isNull || col("gLex") === "",
      lit(WellKnown.defaultGraph)).otherwise(Rid.uriCol(col("gLex"))).as("g"),
    when(col("sKind") === 1, Rid.uriCol(col("sLex")))
      .otherwise(Rid.bnodeCol(col("sLex"))).as("s"),
    Rid.uriCol(col("pLex")).as("p"),
    when(col("oKind") === 1, Rid.uriCol(col("oLex")))
      .when(col("oKind") === 2, Rid.bnodeCol(col("oLex")))
      .otherwise(Rid.literalCol(col("oLex"),
        Rid.attrCol(col("oDt"), col("oLang")))).as("o"))

  /** Continuous NT ingest: watch a directory, append quads to a parquet
    * table (the streaming analog of `fs_import_commit`). */
  def ingestNtDirectory(spark: SparkSession, inDir: String, outDir: String,
                        checkpoint: String) = {
    val lines = spark.readStream.textFile(inDir)
    toQuads(parseNtLines(lines))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Streaming exact dedup on the ingest path: drop quads (or any keyed
    * rows) already seen within the watermark horizon. State is bounded by
    * the horizon — the streaming analog of the batch `Dedup.exact` pass;
    * `dropDuplicatesWithinWatermark` keys state by the dedup columns only,
    * so re-imports of the same statements inside the horizon are no-ops
    * (the reference backend's insert path likewise discards exact
    * duplicate quads, `src/backend/import-backend.c`). */
  def dedupWithinWatermark(rows: DataFrame, tsCol: String,
                           horizon: String, keys: Seq[String]): DataFrame =
    rows.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** Event-time tumbling-window counts with a watermark for late data. */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  final case class SessionOut(user_id: Long, startTs: Long, nEvents: Int,
                              sumValue: Double)

  /** Stateful sessionization via flatMapGroupsWithState: emits a session
    * when a user is idle past the gap (processing-time timeout). */
  def sessionize(events: Dataset[Ev], gapSeconds: Long = 1800)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var out = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              cur match {
                case Some(s) if t - s.last > gapSeconds =>
                  out ::= SessionOut(user, s.start, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(s.copy(last = t, n = s.n + 1,
                    sum = s.sum + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach(state.update)
            state.setTimeoutDuration(gapSeconds * 1000)
            out.reverseIterator
          }
      }
  }
}
