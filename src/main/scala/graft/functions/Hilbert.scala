package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Hilbert-curve index for N-dimensional data clustering — the
  * boundary-pollution fix for z-order range splits (SURVEY §5; the
  * same upgrade Delta's liquid clustering made over OPTIMIZE ZORDER).
  *
  * Why it matters for file skipping: a compaction splits the curve
  * into contiguous per-file ranges. The z-curve teleports at bit
  * rollovers (…0111 → 1000… jumps across the whole space), so a file
  * straddling a high rollover inherits a near-full min/max span in
  * every lower-interleaved dimension — measured in the
  * `lakehouse_zorder3_prune` row as a median file date-span of ~24 %
  * of the range. The Hilbert curve is CONTINUOUS: consecutive cells
  * always differ by one step in exactly one dimension, so a contiguous
  * range of h-values is a connected blob whose per-dimension span
  * shrinks like (cells)^(1/n) — no rollover class of polluted files.
  *
  * Algorithm: Skilling's compact transform ("Programming the Hilbert
  * curve", AIP Conf. Proc. 707, 2004 — public domain): axes → the
  * "transpose" form in place (one pass of invert/exchange per bit
  * level, Gray-decode), then the transpose bits interleave into one
  * long exactly like the z-value (dimension 0 taking the top position
  * of each group). Runs in O(n·bits) integer ops per row at write
  * time (compaction), evaluated through one static-shaped helper call
  * from generated code — no boxing, no UDF serialization.
  */
object Hilbert {

  /** In-place axes → Hilbert transpose + interleave. `x` holds the
    * n coordinates, each in [0, 2^bits); returns the Hilbert index in
    * [0, 2^(n·bits)). MUTATES `x` (callers pass a scratch copy).
    */
  def encode(x: Array[Long], bits: Int): Long = {
    val n = x.length
    // Skilling: inverse-undo excess work, top bit down to bit 1
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p // invert low bits of axis 0
        else {
          val t = (x(0) ^ x(i)) & p // exchange low bits of axes 0 and i
          x(0) ^= t; x(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1L
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose → one long: bit b of axis j lands at position
    // b·n + (n−1−j) — axis 0 most significant within each bit group
    var h = 0L
    var b = 0
    while (b < bits) {
      var j = 0
      while (j < n) {
        h |= ((x(j) >>> b) & 1L) << (b * n + (n - 1 - j))
        j += 1
      }
      b += 1
    }
    h
  }
}

/** hilbert_index(coords): array<long> of n rank-normalized coordinates
  * (each in [0, 2^bits)) → the Hilbert index as long. n·bits ≤ 63 so
  * the index stays a non-negative long (the [[graft.operators.Layout]]
  * z-value contract). Out-of-range coordinates refuse loudly — a
  * silently-masked coordinate would cluster the row into the wrong
  * region, which is a data-layout corruption no one would see until
  * pruning went wrong.
  */
case class HilbertIndex(child: Expression, bits: Int) extends UnaryExpression {
  override def prettyName: String = "hilbert_index"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits >= 1 && bits <= 31 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs 1..31 bits, got $bits")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> coordinates, got ${other.catalogString}")
  }

  /** Called from both interpreted eval and generated code. */
  def encodeRow(a: ArrayData): Long = {
    val n = a.numElements()
    if (n < 1) throw new IllegalArgumentException(s"$prettyName: empty coordinates")
    if (n.toLong * bits > 63) throw new IllegalArgumentException(
      s"$prettyName: n*bits must be <= 63, got $n*$bits")
    val x = new Array[Long](n)
    val max = 1L << bits
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      if (v < 0L || v >= max) throw new IllegalArgumentException(
        s"$prettyName: coordinate $i = $v outside [0, 2^$bits)")
      x(i) = v
      i += 1
    }
    Hilbert.encode(x, bits)
  }

  override def nullSafeEval(v: Any): Any = encodeRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hilbertExpr", this,
      classOf[HilbertIndex].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.encodeRow($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
