package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches as native Catalyst aggregates/expressions — the SET
  * OPERATION sibling of the HLL distinct-count path: an HLL register
  * array can only union, but a theta sketch (a uniform sample of the
  * keys' hash space) also INTERSECTS and DIFFERENCES, so persisted
  * per-segment sketches answer "users in BOTH types", "in A but not
  * B", Jaccard overlap — across a 100 TB corpus, from kilobytes,
  * without a row ever being re-read. That is the audience-overlap /
  * cross-segment-leak analytics HLL structurally cannot do.
  *
  * Scale shape: [[ThetaSketchAgg]] is a `TypedImperativeAggregate` —
  * one k-sample buffer per (partition, group), partial aggregation
  * map-side, the shuffle carries sketches (≤ 8·k bytes), never keys.
  * The set ops run on the aggregated row set (one row per group):
  * they stay scalar expressions whose codegen calls the library
  * kernel statically, so surrounding projections keep whole-stage
  * codegen. Union is idempotent (re-merging the same sketch is a
  * no-op), so sketch-view replay semantics match [[graft.sources.SketchView]].
  */
object ThetaKernels {
  // lgK 12 → k = 4096 retained hashes: ~1.6 % rse on unions,
  // intersection error scales with the overlap fraction (documented
  // DataSketches behavior) — one fixed config keeps sketches mergeable
  // with uniform error bars
  val LgK: Int = 12

  def newUnion(): Union = SetOperation.builder().setLogNominalEntries(LgK).buildUnion()

  def estimate(sk: Array[Byte]): Double =
    Sketches.wrapCompactSketch(Memory.wrap(sk)).getEstimate

  def intersectionBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val it = SetOperation.builder().buildIntersection()
    it.intersect(Sketches.wrapCompactSketch(Memory.wrap(a)))
    it.intersect(Sketches.wrapCompactSketch(Memory.wrap(b)))
    it.getResult.toByteArray
  }

  def aNotBBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(Sketches.wrapCompactSketch(Memory.wrap(a)),
        Sketches.wrapCompactSketch(Memory.wrap(b)))
      .toByteArray

  def unionBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u = newUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(a)))
    u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
    u.getResult.toByteArray
  }
}

/** Shared buffer plumbing for the two theta aggregates: the buffer is
  * a live Union gadget; partials serialize as COMPACT sketches
  * (lossless for union — the gadget keeps the k smallest hashes, which
  * is exactly what the compact image stores).
  */
trait ThetaAggBase extends TypedImperativeAggregate[Union] {
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Union = ThetaKernels.newUnion()

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaKernels.newUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }
}

/** `theta_sketch_agg(key)` — sketch the distinct keys of a group. */
case class ThetaSketchAgg(child: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends ThetaAggBase {
  override def prettyName: String = "theta_sketch_agg"
  override def children: Seq[Expression] = Seq(child)

  private lazy val updater: (Union, Any) => Unit = child.dataType match {
    case LongType    => (u, v) => u.update(v.asInstanceOf[Long])
    case IntegerType => (u, v) => u.update(v.asInstanceOf[Int].toLong)
    case ShortType   => (u, v) => u.update(v.asInstanceOf[Short].toLong)
    case DoubleType  => (u, v) => u.update(v.asInstanceOf[Double])
    case StringType  => (u, v) => u.update(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType  => (u, v) => u.update(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(
      s"theta_sketch_agg: unsupported key type $other")
  }

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) updater(buf, v)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `theta_union_agg(sketch)` — union PERSISTED sketches (the rollup
  * aggregate: coarser groupings from stored per-segment sketches).
  */
case class ThetaUnionAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends ThetaAggBase {
  override def prettyName: String = "theta_union_agg"
  override def children: Seq[Expression] = Seq(child)

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(Sketches.wrapCompactSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `theta_estimate(sketch)` — distinct estimate of a sketch. Codegen
  * emits a static kernel call, so enclosing projections stay in
  * whole-stage codegen.
  */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    ThetaKernels.estimate(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ThetaKernels.estimate($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `theta_intersection(a, b)` — sketch of the key-set intersection. */
case class ThetaIntersection(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "theta_intersection"
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.intersectionBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaKernels.intersectionBytes($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `theta_a_not_b(a, b)` — sketch of the key-set difference. */
case class ThetaANotB(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "theta_a_not_b"
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.aNotBBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaKernels.aNotBBytes($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `theta_union(a, b)` — pairwise sketch union. */
case class ThetaUnionBin(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "theta_union"
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.unionBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaKernels.unionBytes($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object theta {
  def theta_sketch_agg(c: Column): Column =
    ExpressionUtils.column(ThetaSketchAgg(ExpressionUtils.expression(c)).toAggregateExpression())
  def theta_union_agg(c: Column): Column =
    ExpressionUtils.column(ThetaUnionAgg(ExpressionUtils.expression(c)).toAggregateExpression())
  def theta_estimate(c: Column): Column =
    ExpressionUtils.column(ThetaEstimate(ExpressionUtils.expression(c)))
  def theta_intersection(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaIntersection(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def theta_a_not_b(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaANotB(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def theta_union(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaUnionBin(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
