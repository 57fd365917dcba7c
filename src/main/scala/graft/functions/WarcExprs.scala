package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native WARC/WET record splitter — the FIRST stage of every
  * CommonCrawl-derived curation pipeline (CCNet §2 and C4 both consume
  * WET "conversion" records; the reference engine starts one stage
  * later, at parsed text). One pass over the raw file body, walking
  * record frames by the WARC/1.0 framing rules (ISO 28500 §4):
  *
  *   record   = header-block CRLF CRLF content-block CRLF CRLF
  *   header   = "WARC/1.0" CRLF *( field-name ": " value CRLF )
  *   content  = exactly Content-Length BYTES
  *
  * The walk is CONTENT-LENGTH-DRIVEN, never delimiter-driven: a
  * payload may legally contain "\r\n\r\nWARC/1.0" (quoted crawl of a
  * WARC spec page, nested archives), so any split-on-header-marker
  * parser mis-frames real data — the p69 gate plants exactly that
  * decoy and a split-based implementation fails its oracle.
  *
  * Byte discipline: Content-Length counts BYTES (the spec), so the
  * kernel walks the UTF8String's byte array and slices payloads with
  * byte offsets — multi-byte text cannot drift the frame (spec'd in
  * OperatorsSpec with a UTF-8 fixture; the DuckDB oracle's char-substr
  * replay is byte-identical on the ASCII gate corpus, the p59
  * precedent). Header names match case-insensitively (spec §5.1).
  *
  * Malformed input never throws — it classifies: a frame that does
  * not begin with the "WARC/" version magic (spec §4 — without this
  * check ANY text carrying a CRLFCRLF-terminated "Content-Length"
  * block would frame as valid), whose header block has no terminator,
  * has no parseable Content-Length, or whose
  * declared length overruns the remaining bytes yields ONE record with
  * `valid = false` carrying the parsed-so-far fields and the remaining
  * bytes as payload, and the walk stops (the tail cannot be re-framed
  * once a length is untrustworthy). Leading CR/LF runs between records
  * are tolerated. NULL in, NULL out; "" yields an empty array. */
object Warc {
  val recordSchema: StructType = StructType(Seq(
    StructField("rec_type", StringType, nullable = true),
    StructField("uri", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("payload", StringType, nullable = false),
    StructField("valid", BooleanType, nullable = false)))

  private val CR = '\r'.toByte
  private val LF = '\n'.toByte

  /** index of the first CRLFCRLF at/after `from`, or -1 */
  private def findHdrEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == CR && b(i + 1) == LF && b(i + 2) == CR && b(i + 3) == LF)
        return i
      i += 1
    }
    -1
  }

  private def asciiLowerEq(b: Array[Byte], off: Int, len: Int,
                           lower: String): Boolean = {
    if (len != lower.length) return false
    var i = 0
    while (i < len) {
      var c = b(off + i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
      if (c != lower.charAt(i)) return false
      i += 1
    }
    true
  }

  /** header block [from, hdrEnd) → (type, uri, date, contentLength) */
  private def parseHeaders(b: Array[Byte], from: Int, hdrEnd: Int)
      : (UTF8String, UTF8String, UTF8String, java.lang.Long) = {
    var recType: UTF8String = null
    var uri: UTF8String = null
    var date: UTF8String = null
    var clen: java.lang.Long = null
    var lineStart = from
    while (lineStart < hdrEnd) {
      var lineEnd = lineStart
      while (lineEnd < hdrEnd &&
        !(b(lineEnd) == CR && lineEnd + 1 <= hdrEnd && b(lineEnd + 1) == LF))
        lineEnd += 1
      // "Name: value"
      var colon = lineStart
      while (colon < lineEnd && b(colon) != ':') colon += 1
      if (colon < lineEnd) {
        var vs = colon + 1
        while (vs < lineEnd && b(vs) == ' ') vs += 1
        val nameLen = colon - lineStart
        def value(): UTF8String =
          UTF8String.fromBytes(b, vs, lineEnd - vs)
        if (asciiLowerEq(b, lineStart, nameLen, "warc-type"))
          recType = value()
        else if (asciiLowerEq(b, lineStart, nameLen, "warc-target-uri"))
          uri = value()
        else if (asciiLowerEq(b, lineStart, nameLen, "warc-date"))
          date = value()
        else if (asciiLowerEq(b, lineStart, nameLen, "content-length")) {
          var v = 0L
          var ok = vs < lineEnd
          var i = vs
          while (ok && i < lineEnd) {
            val c = b(i)
            if (c >= '0' && c <= '9' && v <= (Long.MaxValue - 9) / 10)
              v = v * 10 + (c - '0')
            else ok = false
            i += 1
          }
          if (ok) clen = java.lang.Long.valueOf(v)
        }
      }
      lineStart = lineEnd + 2
    }
    (recType, uri, date, clen)
  }

  def records(raw: UTF8String): GenericArrayData = {
    val b = raw.getBytes
    val out = new java.util.ArrayList[AnyRef]()
    var pos = 0
    def invalidTail(recType: UTF8String, uri: UTF8String,
                    date: UTF8String, clen: java.lang.Long,
                    payloadFrom: Int): Unit =
      out.add(new GenericInternalRow(Array[Any](
        recType, uri, date, clen,
        UTF8String.fromBytes(b, payloadFrom, b.length - payloadFrom),
        false)))
    // "WARC/" version magic (spec §4: every record starts with a
    // version line) — without it any text with a CRLFCRLF-terminated
    // block carrying a "Content-Length: N" line would frame as a VALID
    // record; garbage must classify as valid=false, not well-formed
    def hasMagic(at: Int): Boolean =
      at + 5 <= b.length && b(at) == 'W' && b(at + 1) == 'A' &&
        b(at + 2) == 'R' && b(at + 3) == 'C' && b(at + 4) == '/'
    var done = false
    while (!done && pos < b.length) {
      while (pos < b.length && (b(pos) == CR || b(pos) == LF)) pos += 1
      if (pos >= b.length) done = true
      else if (!hasMagic(pos)) { // not a record frame: classify, stop
        invalidTail(null, null, null, null, pos); done = true
      } else {
        val hdrEnd = findHdrEnd(b, pos)
        if (hdrEnd < 0) { // unterminated header block
          invalidTail(null, null, null, null, pos); done = true
        } else {
          val (recType, uri, date, clen) = parseHeaders(b, pos, hdrEnd)
          val payloadStart = hdrEnd + 4
          if (clen == null ||
              payloadStart + clen.longValue() > b.length) {
            invalidTail(recType, uri, date, clen, payloadStart)
            done = true
          } else {
            val n = clen.longValue().toInt
            out.add(new GenericInternalRow(Array[Any](
              recType, uri, date, clen,
              UTF8String.fromBytes(b, payloadStart, n), true)))
            pos = payloadStart + n
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `warc_records(raw)` → array of framed WET/WARC records (see
  * [[Warc]] for the framing contract). */
final case class WarcRecords(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType =
    ArrayType(Warc.recordSchema, containsNull = false)
  override def prettyName: String = "warc_records"
  override protected def nullSafeEval(input: Any): Any =
    Warc.records(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Warc.records($c)")
  override protected def withNewChildInternal(
      newChild: Expression): WarcRecords = copy(child = newChild)
}
