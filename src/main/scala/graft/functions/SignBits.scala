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

/** adc_dot(q, packed): ASYMMETRIC scoring over sign-quantized vectors —
  * the query stays FLOAT, the database side is the 1-bit [[SignPack]]
  * column: score = Σ_i (bit_i ? q_i : −q_i) = ⟨q, sign(v)⟩ with
  * sign(v) ∈ {−1,+1}^d. The faiss-style ADC trick (asymmetric distance
  * computation, Jégou et al., PQ paper §III): keeping the query
  * unquantized preserves most of the ranking fidelity symmetric
  * Hamming throws away (Hamming collapses each q_i to its sign too),
  * while the SCAN still reads only 1 bit/dim — the memory-bandwidth
  * term that dominates a 100 TB serving sweep. The loop is ALU-trivial
  * (a bit test + signed add per dim) against 32× fewer scan bytes.
  *
  * Width contract: packed must carry exactly ceil(q.len/64) words —
  * mismatches fail loudly (a silent prefix score would be
  * plausible-but-wrong). Terms are the query's floats widened to
  * double and summed left-to-right, the house accumulation order every
  * float kernel here shares with the DuckDB oracle.
  */
case class AdcDot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "adc_dot"
  override def dataType: DataType = DoubleType

  private def qElemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array query, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(qt, _), ArrayType(LongType, _)) if qt == FloatType || qt == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double> query, array<bigint> sign_pack output), " +
          s"got ${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[ArrayData]; val p = r.asInstanceOf[ArrayData]
    val n = q.numElements()
    val words = (n + 63) >>> 6
    if (p.numElements() != words)
      throw new IllegalArgumentException(
        s"$prettyName: query dim $n needs $words packed words, got ${p.numElements()}")
    val isFloat = qElemType == FloatType
    var s = 0.0; var i = 0
    while (i < n) {
      val x = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      if (((p.getLong(i >>> 6) >>> (i & 63)) & 1L) == 1L) s += x else s -= x
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, p) => {
      val n = ctx.freshName("n"); val w = ctx.freshName("w")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val get = qElemType match {
        case FloatType  => s"(double) $q.getFloat($i)"
        case DoubleType => s"$q.getDouble($i)"
        case _          => throw new IllegalStateException("unreachable")
      }
      s"""
         |int $n = $q.numElements();
         |int $w = ($n + 63) >>> 6;
         |if ($p.numElements() != $w) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: query dim " + $n + " needs " + $w +
         |    " packed words, got " + $p.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ((($p.getLong($i >>> 6) >>> ($i & 63)) & 1L) == 1L) { $s += ($get); }
         |  else { $s -= ($get); }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
