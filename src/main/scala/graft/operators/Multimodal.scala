package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched partition passes.
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `fakeDecode` derives deterministic pseudo-metadata from the
  * bytes. The Spark-side plumbing is real and what matters at scale —
  * schema, binary transport, batched per-partition processing (the Scala
  * analog of `mapInPandas` batch shape), and partition sizing so a 100 TB
  * media corpus streams through executors without materializing rows.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, mime: String,
                            content: Array[Byte])
  final case class ImageMeta(media_id: Long, width: Int, height: Int,
                             channels: Int, n_bytes: Long, fp_prefix: String)
  final case class Frame(media_id: Long, frame_no: Int,
                         frame: Array[Byte])

  /** Wrap text rows as fake media blobs (test/data-gen helper). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mime: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit(mime).as("mime"),
        col(payloadCol).cast("binary").as("content"))
      .as[MediaRow]
  }

  /** STUB decode: deterministic pseudo metadata from the content's MD5
    * digest (little-endian byte reads, so a SQL oracle can replicate it
    * from `md5_number`). A real deployment swaps this one function for an
    * actual codec. */
  private def fakeDecode(digest: Array[Byte]): (Int, Int, Int) = {
    def b(i: Int): Int = digest(i) & 0xFF
    val w = 64 + b(0) + 256 * (b(1) & 0x3)
    val h = 64 + b(2) + 256 * (b(3) & 0x3)
    (w, h, 3)
  }

  /** Batched metadata extraction: processes rows in fixed-size batches per
    * partition (the mapInPandas batch shape), never holding a partition's
    * blobs in memory at once. */
  def imageMeta(media: Dataset[MediaRow], batchSize: Int = 64)
      : Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val digest = md.digest(m.content)
          val (w, h, c) = fakeDecode(digest)
          val fp = digest.take(4).map("%02x".format(_)).mkString
          ImageMeta(m.media_id, w, h, c, m.content.length.toLong, fp)
        }
      }
    }
  }

  /** STUB resize: deterministic downsampled payload (every k-th byte). */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(m => m.copy(
      content = m.content.zipWithIndex.collect {
        case (b, i) if i % factor == 0 => b
      }))
  }

  /** STUB frame sampling: split payload into fixed-size pseudo frames,
    * keep every `everyN`-th. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 256,
                   everyN: Int = 2): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      m.content.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, i) if i % everyN == 0 => Frame(m.media_id, i, chunk)
      }
    }
  }

  /** STUB feature extraction: deterministic pseudo-embedding from bytes
    * (xxhash-free: simple rolling mix so it's library-independent). */
  def features(media: Dataset[MediaRow], dim: Int = 16)
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val v = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < m.content.length) { h = 31 * h + m.content(i); i += 1 }
      var d = 0
      while (d < dim) {
        val x = h * (d + 2654435761L)
        v(d) = ((x >>> 40).toInt % 1000) / 1000.0f
        d += 1
      }
      (m.media_id, v)
    }.toDF("media_id", "embedding")
  }
}
