package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a binary min-heap keyed "worst at root" under
  * the ranking (score DESC, id ASC), so insertion is O(log k) and the
  * buffer never holds more than k entries.
  *
  * This is the scale-safe replacement for
  * `row_number().over(Window.partitionBy(qid))` top-k: the window form
  * funnels every candidate of one query into a single task, while this
  * aggregate keeps k rows per PARTITION per query map-side and merges
  * k-sized buffers on the reduce side — the same partial/final shape
  * Spark's own TakeOrderedAndProject uses globally, applied per group.
  * At 100 TB the per-query candidate set (entire corpus for brute
  * force) never concentrates on one executor.
  */
class TopKBuffer(val k: Int) {
  var n: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** true if (s1,i1) ranks WORSE than (s2,i2) under (score desc, id asc).
    * `Double.compare` gives a TOTAL order: NaN ranks above +Inf (so a
    * NaN-scored row is never dropped and sorts first — the ordering the
    * replaced `row_number() ... ORDER BY score DESC` window used), and
    * -0.0 ranks below 0.0 deterministically. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i // index of worst among i, l, r
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val ts = scores(i); scores(i) = scores(w); scores(w) = ts
      val ti = ids(i); ids(i) = ids(w); ids(w) = ti
      i = w
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); scores(i) = scores(p); scores(p) = ts
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      } else return
    }
  }

  def add(score: Double, id: Long): Unit =
    if (n < k) {
      scores(n) = score; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }

  def merge(o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
    this
  }

  /** (score, id) pairs in rank order (score desc, id asc) — same total
    * order as [[worse]] (NaN first, -0.0 after 0.0). */
  def sorted: Array[(Double, Long)] =
    Array.tabulate(n)(i => (scores(i), ids(i)))
      .sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      }
}

/** Mergeable bounded-heap top-k aggregate:
  * `graft_top_k(score, id, k)` → `array<struct<id:bigint, score:double>>`
  * in rank order (score desc, id asc), at most k elements.
  *
  * Input coercion: `ImplicitCastInputTypes` makes the analyzer cast
  * (or cleanly reject) non-DOUBLE scores / non-BIGINT ids at analysis
  * time — a FLOAT score or INT id widens instead of hitting a runtime
  * ClassCastException in `update`. */
case class TopKAgg(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer]
    with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(k > 0, s"graft_top_k requires k > 0, got $k")

  private def score: Expression = left
  private def id: Expression = right

  // Seq[DataType] (not Seq[AbstractDataType]: private[sql] in Spark 4)
  // is a valid covariant override naming only public types
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = b.merge(o)

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    }.asInstanceOf[Array[Any]])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * b.n)
    bb.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.scores(i)).putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bufK = bb.getInt
    val n = bb.getInt
    val b = new TopKBuffer(bufK)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val id = bb.getLong
      b.add(s, id)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}
