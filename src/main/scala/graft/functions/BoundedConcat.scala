package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Memory-bounded GROUP_CONCAT accumulator (SURVEY §7.3's
  * "memory-bounded GROUP_CONCAT"): keeps only the `max` binary-smallest
  * strings per group, so one viral group can never OOM an executor the
  * way `collect_list` can at 100 TB.
  *
  * Deterministic truncation contract: the engine's GROUP_CONCAT is
  * order-independent (`array_sort` before joining); the bounded variant
  * keeps the N smallest elements in the SAME binary (UTF8String) order,
  * so a capped result is always a prefix of the uncapped result —
  * stable under any partitioning or merge order. Partial aggregation
  * still applies: each map task keeps at most N elements and merges cap
  * again, so executor memory is O(N · avg-len) regardless of group
  * size. Enabled via `spark.graft.groupConcat.max` (see
  * `Sparql.aggColumn`).
  */
final case class BoundedSortedConcat(
    child: Expression,
    sep: String,
    max: Int,
    distinct: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedSortedConcat.Buf]
  with UnaryLike[Expression] {
  require(max > 0, s"cap must be positive, got $max")

  override def createAggregationBuffer(): BoundedSortedConcat.Buf =
    new BoundedSortedConcat.Buf(max, distinct)

  override def update(buf: BoundedSortedConcat.Buf,
                      input: InternalRow): BoundedSortedConcat.Buf = {
    val v = child.eval(input)
    // clone: the input UTF8String may point into a reused row buffer
    if (v != null) buf.add(v.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(b1: BoundedSortedConcat.Buf,
                     b2: BoundedSortedConcat.Buf): BoundedSortedConcat.Buf = {
    b2.foreach(b1.add)
    b1
  }

  override def eval(buf: BoundedSortedConcat.Buf): Any = {
    val items = buf.sortedAscending
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < items.length) {
      if (i > 0) sb.append(sep)
      sb.append(items(i).toString)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: BoundedSortedConcat.Buf): Array[Byte] = {
    val items = buf.sortedAscending
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(items.length)
    items.foreach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedSortedConcat.Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_group_concat"
  override def withNewMutableAggBufferOffset(o: Int): BoundedSortedConcat =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedSortedConcat =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedSortedConcat = copy(child = newChild)
}

object BoundedSortedConcat {
  /** keep-smallest-N buffer: a max-heap (head = current largest) for
    * bag semantics, a capped TreeSet for DISTINCT */
  final class Buf(max: Int, distinct: Boolean) {
    private val desc = new java.util.Comparator[UTF8String] {
      def compare(a: UTF8String, b: UTF8String): Int = b.compareTo(a)
    }
    private val heap: java.util.PriorityQueue[UTF8String] =
      if (distinct) null else new java.util.PriorityQueue[UTF8String](desc)
    private val set: java.util.TreeSet[UTF8String] =
      if (distinct) new java.util.TreeSet[UTF8String]() else null

    def add(v: UTF8String): Unit =
      if (distinct) {
        set.add(v)
        if (set.size > max) set.pollLast()
      } else if (heap.size < max) heap.offer(v)
      else if (v.compareTo(heap.peek()) < 0) { heap.poll(); heap.offer(v) }

    def foreach(f: UTF8String => Unit): Unit =
      if (distinct) set.forEach(v => f(v)) else heap.forEach(v => f(v))

    def sortedAscending: Array[UTF8String] = {
      val arr = new scala.collection.mutable.ArrayBuffer[UTF8String]
      foreach(arr += _)
      arr.sortWith(_.compareTo(_) < 0).toArray
    }
  }
}
