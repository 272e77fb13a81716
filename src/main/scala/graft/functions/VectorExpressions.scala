package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The reference's vector search (demo.ipynb cell 11,
  * `hudi_vector_search(..., 'cosine')`) runs distance kernels inside the
  * Lance native engine. The Spark-first equivalent is a codegen'd
  * Catalyst expression: the similarity loop is emitted straight into
  * whole-stage-generated Java, reading primitive floats out of columnar
  * ArrayData with zero boxing and no UDF serialization boundary.
  *
  * All accumulation is in `double` (each float widened exactly), so a
  * DuckDB oracle computing over `embedding::DOUBLE[]` sees the same
  * arithmetic.
  *
  * Element types supported: array<float> and array<double>.
  */
trait VectorKernel { self: BinaryExpression =>
  override def dataType: DataType = DoubleType

  protected def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array input, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if (a == FloatType || a == DoubleType) && a == b =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> or two array<double> args, " +
            s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  /** getter fragment for codegen: reads element i of array `arr` as double */
  protected def getter(arr: String, i: String): String = elemType match {
    case FloatType  => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case _ => throw new IllegalStateException("unreachable")
  }

  protected def getElem(a: ArrayData, i: Int): Double = elemType match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case _ => throw new IllegalStateException("unreachable")
  }

  /** runtime dimension guard (eval path): scoring a silent common
    * prefix of mismatched vectors would return a plausible-but-wrong
    * number — fail loudly instead (DuckDB's list kernels do the same).
    */
  protected def checkedLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: mismatched vector dimensions ($n vs ${b.numElements()})")
    n
  }

  /** same guard, codegen path: emitted ahead of the kernel loop. */
  protected def dimGuard(a: String, b: String, n: String): String =
    s"""int $n = $a.numElements();
       |if ($n != $b.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$prettyName: mismatched vector dimensions (" + $n + " vs " + $b.numElements() + ")");
       |}""".stripMargin
}

/** cosine_similarity(a, b) = dot(a,b) / (sqrt(|a|^2) * sqrt(|b|^2)).
  * The two-sqrt form (not sqrt(na*nb)) is deliberate: it is the exact op
  * sequence DuckDB's list_cosine_similarity uses, so oracle comparisons
  * are bit-identical even at quantization boundaries (e.g. self-match).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorKernel {
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkedLen(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getElem(a, i); val y = getElem(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |${dimGuard(a, b, n)}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(a, i)};
         |  double $y = ${getter(b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_product(a, b), double accumulation. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorKernel {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkedLen(a, b)
    var dot = 0.0; var i = 0
    while (i < n) { dot += getElem(a, i) * getElem(b, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
         |${dimGuard(a, b, n)}
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (${getter(a, i)}) * (${getter(b, i)});
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2_distance(a, b) = sqrt(sum((a_i - b_i)^2)). */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression with VectorKernel {
  override def prettyName: String = "l2_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = checkedLen(a, b)
    var s = 0.0; var i = 0
    while (i < n) { val d = getElem(a, i) - getElem(b, i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |${dimGuard(a, b, n)}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (${getter(a, i)}) - (${getter(b, i)});
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** vector_norm(a) = sqrt(sum(a_i^2)). */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array input, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    var s = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (elemType == FloatType) s"(double) $a.getFloat" else s"$a.getDouble"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $get($i);
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
