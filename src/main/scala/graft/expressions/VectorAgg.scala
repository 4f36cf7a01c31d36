package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise sum of `array<double>` vectors with a row count —
  * mergeable across partitions, so mean-pooling (doc embedding = mean
  * of its chunk embeddings, cluster centroid = mean of members) is one
  * partial-aggregating pass instead of a posexplode + per-index
  * shuffle of n×dim rows. */
class VecSumBuffer(var sum: Array[Double], var n: Long) {
  def add(v: ArrayData): Unit = {
    val m = v.numElements()
    if (sum == null) sum = new Array[Double](m)
    val k = math.min(m, sum.length)
    var i = 0
    while (i < k) { sum(i) += v.getDouble(i); i += 1 }
    n += 1
  }
  def merge(o: VecSumBuffer): VecSumBuffer = {
    if (o.sum != null) {
      if (sum == null) { sum = o.sum; n = o.n }
      else {
        val k = math.min(sum.length, o.sum.length)
        var i = 0
        while (i < k) { sum(i) += o.sum(i); i += 1 }
        n += o.n
      }
    }
    this
  }
}

/** mean-pool aggregate: array<double> column → array<double> mean
  * (null on empty input). */
case class VectorMeanAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_mean"

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer(null, 0L)

  override def update(b: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: VecSumBuffer, o: VecSumBuffer): VecSumBuffer = b.merge(o)

  override def eval(b: VecSumBuffer): Any =
    if (b.n == 0 || b.sum == null) null
    else new GenericArrayData(b.sum.map(_ / b.n))

  override def serialize(b: VecSumBuffer): Array[Byte] = {
    val len = if (b.sum == null) 0 else b.sum.length
    val bb = ByteBuffer.allocate(12 + 8 * len)
    bb.putLong(b.n).putInt(len)
    var i = 0
    while (i < len) { bb.putDouble(b.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val len = bb.getInt
    if (len == 0) new VecSumBuffer(null, n)
    else {
      val s = new Array[Double](len)
      var i = 0
      while (i < len) { s(i) = bb.getDouble; i += 1 }
      new VecSumBuffer(s, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMeanAgg =
    copy(child = newChild)
}
