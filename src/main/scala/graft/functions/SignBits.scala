package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 1-bit (sign) quantization kernels — the most aggressive storage
  * lever for vector search at 100 TB: one BIT per dimension instead of
  * 32 (float) or 8 (int8, [[graft.operators.Quantize]]), a 32× scan-byte
  * reduction. The standard serving shape (faiss `IndexBinaryFlat`,
  * SimHash-style retrieval; reference analog: the Lance engine's
  * quantized search behind demo.ipynb cell 11): candidate-generate by
  * Hamming distance over the packed bits, then exact-rerank the
  * survivors on the float column.
  *
  * Both kernels are codegen'd Catalyst expressions (no UDF, no boxing):
  * the pack loop reads primitive floats out of columnar ArrayData and
  * ORs sign bits into a long[] built in generated Java; the distance
  * loop is XOR + `Long.bitCount` — the JIT lowers bitCount to a single
  * POPCNT instruction, so scoring is ~dim/64 instructions per row.
  *
  * Arithmetic is engine-neutral by construction — a sign test and a
  * mismatch count involve no rounding at all — so a DuckDB oracle
  * counting `(a_i >= 0) <> (b_i >= 0)` over the raw float column
  * reproduces the packed XOR/POPCNT result exactly, bit-for-bit.
  */
object SignBits

/** sign_pack(v): array<float|double> → array<long> of ceil(dim/64)
  * words; bit (i mod 64) of word (i div 64) is set iff v(i) >= 0.
  * Deterministic and foldable, so a packed literal query vector
  * constant-folds to one array at plan time.
  */
case class SignPack(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sign_pack"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array input, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    val n = a.numElements()
    val out = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      if (x >= 0.0) out(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val get = elemType match {
        case FloatType  => s"(double) $a.getFloat($i)"
        case DoubleType => s"$a.getDouble($i)"
        case _          => throw new IllegalStateException("unreachable")
      }
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[($n + 63) >>> 6];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (($get) >= 0.0) { $out[$i >>> 6] |= 1L << ($i & 63); }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hamming_distance(a, b): XOR + popcount over two packed sign-bit
  * vectors (array<long> from [[SignPack]]); equals the number of
  * dimensions whose signs disagree. Mismatched word counts fail loudly
  * (a silent common-prefix score would be plausible-but-wrong).
  */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "hamming_distance"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> (sign_pack output), " +
          s"got ${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: mismatched packed widths ($n vs ${b.numElements()} words)")
    var s = 0; var i = 0
    while (i < n) { s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: mismatched packed widths (" + $n + " vs " + $b.numElements() + " words)");
         |}
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
