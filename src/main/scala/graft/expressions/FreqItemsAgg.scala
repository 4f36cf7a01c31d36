package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary with `k` counters.
  *
  * Invariant: est(x) ≤ true(x) ≤ est(x) + n/(k+1) — every item with
  * frequency above n/(k+1) is guaranteed present. When the distinct
  * count never exceeds k, no decrements happen and counts are EXACT
  * (which is what the SQL oracle checks at test SF; the error bound is
  * spec-asserted adversarially).
  *
  * Merge is Agarwal et al., "Mergeable Summaries" (PODS'12): pointwise
  * sum, then subtract the (k+1)-th largest count and drop non-positive
  * — the result obeys the same bound, so partial summaries combine
  * map-side and the reduce side sees k-sized buffers only. That
  * mergeability is the whole point at 100 TB: corpus-wide top tokens
  * without shuffling a (token → count) table anywhere. */
class MGBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()

  def add(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != 0L) counts.put(item, cur + 1L)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      // decrement-all: O(k) on a miss, amortized O(1) per stream element
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def merge(o: MGBuffer): MGBuffer = {
    o.counts.forEach { (item, c) =>
      val cur = counts.get(item)
      counts.put(item, cur + c)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      counts.forEach { (_, c) => vals(i) = c; i += 1 }
      java.util.Arrays.sort(vals)
      val pivot = vals(vals.length - k - 1) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= pivot) it.remove() else e.setValue(e.getValue - pivot)
      }
    }
    this
  }

  /** (item, est) in (est desc, item asc) order, truncated to n. */
  def top(n: Int): Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    counts.forEach { (item, c) => arr(i) = (item, c); i += 1 }
    java.util.Arrays.sort(arr, { (a: (String, Long), b: (String, Long)) =>
      if (a._2 != b._2) java.lang.Long.compare(b._2, a._2)
      else a._1.compareTo(b._1)
    })
    if (arr.length <= n) arr else java.util.Arrays.copyOf(arr, n)
  }
}

/** `graft_freq_items(item, k, n)` → `array<struct<item:string,
  * cnt:bigint>>`: the top-n of a k-counter Misra–Gries summary, in
  * (cnt desc, item asc) order. */
case class FreqItemsAgg(child: Expression, k: Int, outN: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0, s"graft_freq_items requires k > 0, got $k")
  require(outN > 0, s"graft_freq_items requires n > 0, got $outN")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGBuffer, o: MGBuffer): MGBuffer = b.merge(o)

  override def eval(b: MGBuffer): Any =
    new GenericArrayData(b.top(outN).map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
    }.asInstanceOf[Array[Any]])

  override def serialize(b: MGBuffer): Array[Byte] = {
    var size = 8
    b.counts.forEach { (item, _) =>
      size += 12 + item.getBytes(StandardCharsets.UTF_8).length
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(b.k).putInt(b.counts.size)
    b.counts.forEach { (item, c) =>
      val bytes = item.getBytes(StandardCharsets.UTF_8)
      bb.putInt(bytes.length).put(bytes).putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new MGBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      b.counts.put(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}
