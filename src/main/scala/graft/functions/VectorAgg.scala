package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Element-wise mean of an `array<float>`/`array<double>` column — the
  * embedding-pooling aggregate (chunk→document pooling, label/cluster
  * centroids, IVF rebalancing) that built-ins only reach via
  * posexplode + groupBy(dim) — i.e. exploding |v|× rows through an
  * extra shuffle. This runs as a `TypedImperativeAggregate`: one
  * primitive double[] buffer per group, partial aggregation map-side,
  * O(dim) merge — at 100 TB the shuffle carries one buffer per
  * (partition, group), not dim× the corpus.
  */
case class VectorAvg(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorAvg.Buffer] {

  override def prettyName: String = "vector_avg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array input, got $other")
  }

  override def createAggregationBuffer(): VectorAvg.Buffer = VectorAvg.Buffer(null, 0L)

  override def update(buf: VectorAvg.Buffer, input: InternalRow): VectorAvg.Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // fail-loudly rule (same as VectorExpressions.checkedLen): a ragged
    // group would otherwise yield a plausible-but-wrong truncated mean
    if (buf.sums != null && n != buf.sums.length)
      throw new IllegalArgumentException(
        s"vector_avg: dimension mismatch within group ($n vs ${buf.sums.length})")
    val sums = if (buf.sums == null) new Array[Double](n) else buf.sums
    val isFloat = elemType == FloatType
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"vector_avg: null element at index $i")
      sums(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    VectorAvg.Buffer(sums, buf.count + 1)
  }

  override def merge(a: VectorAvg.Buffer, b: VectorAvg.Buffer): VectorAvg.Buffer = {
    if (b.sums == null) return a
    if (a.sums == null) return b
    if (a.sums.length != b.sums.length)
      throw new IllegalArgumentException(
        s"vector_avg: dimension mismatch within group (${a.sums.length} vs ${b.sums.length})")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    VectorAvg.Buffer(a.sums, a.count + b.count)
  }

  override def eval(buf: VectorAvg.Buffer): Any =
    if (buf.sums == null || buf.count == 0L) null
    else new GenericArrayData(buf.sums.map(_ / buf.count))

  override def serialize(buf: VectorAvg.Buffer): Array[Byte] = {
    val n = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + 8 * n)
    bb.putLong(buf.count).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val n = bb.getInt()
    if (n == 0) VectorAvg.Buffer(null, count)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = bb.getDouble(); i += 1 }
      VectorAvg.Buffer(sums, count)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorAvg {
  final case class Buffer(sums: Array[Double], count: Long)
}

object vectoragg {
  /** Column API: element-wise mean of an array column per group. */
  def vector_avg(c: Column): Column =
    ExpressionUtils.column(VectorAvg(ExpressionUtils.expression(c)).toAggregateExpression())
}
