package graft.probe

/** Shared disk-health probe for the SCALE_* artifacts (r12 verdict task
  * 8): the box this repo benches on has day-phases where sequential I/O
  * degrades 2–5× (observed spans: spool 1.8–11 s for identical bytes,
  * GSP 26–247 s for identical work). Every probe main embeds this
  * number beside its timings so future variance adjudication is
  * mechanical — a slow run with a slow dd is a box phase, a slow run
  * with a healthy dd (~460 MB/s sequential write on this box) is a
  * regression.
  *
  * Method mirrors `dd if=/dev/zero of=f bs=1M count=N conv=fsync`:
  * sequential 1 MiB writes to a temp file in the same filesystem the
  * probes spool to, fsync'd before the clock stops, file deleted after.
  */
object DiskProbe {

  /** Sequential write throughput in MB/s ( = bytes/1e6 per second),
    * fsync included. Default 256 MiB keeps the probe under ~1 s on a
    * healthy box while still spanning any writeback cache. */
  def writeMBps(totalBytes: Long = 256L << 20): Double = {
    val f = java.nio.file.Files.createTempFile("ddprobe", ".bin")
    try {
      val buf = new Array[Byte](1 << 20)
      val ch = java.nio.channels.FileChannel.open(f,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      val t0 = System.nanoTime()
      try {
        var written = 0L
        while (written < totalBytes) {
          val n = math.min(buf.length.toLong, totalBytes - written).toInt
          ch.write(java.nio.ByteBuffer.wrap(buf, 0, n))
          written += n
        }
        ch.force(false)
      } finally ch.close()
      val sec = (System.nanoTime() - t0) / 1e9
      totalBytes / 1e6 / sec
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  /** One-line JSON fragment (no braces) for inlining into a SCALE
    * artifact: `"dd_mbps":412.3`. */
  def jsonFragment(): String = f""""dd_mbps":${writeMBps()}%.1f"""

  /** Fixed CPU reference: wall seconds for a deterministic in-memory
    * mix loop (no allocation, no I/O — ~1 s on a healthy box). The
    * r14 verdict's ask: dd measures only the disk axis, so a uniform
    * bench drift had to be adjudicated "CPU phase" BY ELIMINATION;
    * recording this beside dd at artifact start/end separates the two
    * phase axes mechanically — slow run + slow cpuRef = box CPU
    * phase, slow run + healthy cpuRef + healthy dd = a regression.
    * The sink value defeats dead-code elimination; iteration count is
    * fixed so the number is comparable across rounds. */
  def cpuRefSec(iters: Long = 400_000_000L): Double = {
    var x = 0x9e3779b97f4a7c15L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17 // xorshift64
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    if (x == 42L) println("") // sink
    sec
  }
}
