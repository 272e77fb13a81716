package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** KLL quantile sketches (Karnin–Lang–Liberty 2016, the DataSketches
  * implementation Spark already ships for its theta/HLL builtins) as
  * Catalyst aggregates/expressions — the MERGEABLE-quantiles primitive
  * Spark lacks natively: `approx_percentile` answers one query but its
  * state is not a storable, re-mergeable artifact. A KLL sketch IS:
  * per-segment sketches persist as `binary` columns, union pairwise or
  * by aggregate, and answer any quantile later with ε ≈ 1.65 % rank
  * error at k = 200 (the library default) in ~3 KB per group — the
  * foundation [[graft.sources.QuantileView]] builds its incremental
  * percentile serving on.
  *
  * Rank-error contract, honestly: KLL bounds the error of RANKS, not
  * values — a reported q-quantile is some input value whose true rank
  * lies in [q − ε, q + ε] (KllSpec pins exactly that against the
  * exact sort). Unlike HLL, MERGE IS NOT IDEMPOTENT: folding the same
  * batch twice double-weights its rows, so maintenance must be
  * exactly-once (the view layer's intent protocol, not this file's
  * concern).
  */
object kllsketch {

  private[graft] val DefaultK = 200

  /** Aggregate raw doubles into a serialized KLL sketch (binary). */
  def kll_agg(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KllSketchAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Aggregate serialized sketches into their union (binary). */
  def kll_merge_agg(c: Column): Column =
    ExpressionUtils.column(
      KllMergeAgg(ExpressionUtils.expression(c)).toAggregateExpression())

  /** Pairwise union of two serialized sketches; NULL-absorbing (a NULL
    * side yields the other).
    */
  def kll_merge(a: Column, b: Column): Column =
    ExpressionUtils.column(
      KllMerge(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Quantile values at the given ranks from a serialized sketch →
    * array<double> (NULL for a NULL/empty sketch).
    */
  def kll_quantiles(sketch: Column, ranks: Seq[Double]): Column = {
    require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
      s"ranks must be non-empty, each in [0,1]: $ranks")
    ExpressionUtils.column(
      KllQuantiles(ExpressionUtils.expression(sketch), ranks.toArray))
  }

  private[graft] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** groupBy-agg: stream the child's doubles into one KLL sketch per
  * group; partial aggregation map-side, O(k log n) merge — the shuffle
  * carries one ~3 KB sketch per (partition, group), never the rows.
  */
case class KllSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def prettyName: String = "kll_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(child.dataType match {
      case DoubleType => v.asInstanceOf[Double]
      case FloatType => v.asInstanceOf[Float].toDouble
      case LongType => v.asInstanceOf[Long].toDouble
      case IntegerType => v.asInstanceOf[Int].toDouble
      case dt => throw new IllegalArgumentException(s"kll_agg: unsupported input type $dt")
    })
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) null else buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = kllsketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** groupBy-agg over SERIALIZED sketches: union them (the rollup path —
  * any coarser grouping is answered from stored sketches alone).
  */
case class KllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def prettyName: String = "kll_merge_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(kllsketch.DefaultK)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(kllsketch.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }
  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) null else buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = kllsketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Pairwise sketch union — the view-merge expression (runs once per
  * GROUP row in a MERGE, not per source row: CodegenFallback is fine
  * at that cardinality). NULL-absorbing on either side.
  */
case class KllMerge(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "kll_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else {
      val s = kllsketch.heapify(l.asInstanceOf[Array[Byte]])
      s.merge(kllsketch.heapify(r.asInstanceOf[Array[Byte]]))
      s.toByteArray
    }
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Quantile values at fixed ranks from a serialized sketch. INCLUSIVE
  * search criteria (the DataSketches default): the returned value is an
  * actual input value whose rank covers the requested one.
  */
case class KllQuantiles(child: Expression, ranks: Array[Double])
    extends Expression with CodegenFallback {
  override def prettyName: String = "kll_quantiles"
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val s = kllsketch.heapify(v.asInstanceOf[Array[Byte]])
      if (s.isEmpty) null
      else new GenericArrayData(s.getQuantiles(ranks, QuantileSearchCriteria.INCLUSIVE))
    }
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
