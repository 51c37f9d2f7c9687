package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float arrays in
  * ONE fused loop (dot, ‖a‖², ‖b‖² as three accumulators), with
  * whole-stage codegen.
  *
  * BIT-IDENTICAL to the composed form
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with left-fold dots
  * (the accumulators are independent, so fusing the loops preserves
  * each accumulation sequence exactly; the final combine is the same
  * IEEE op order) — pinned in OperatorGoldenSpec. Versus the composed
  * expression tree this turns 3 array traversals per pair into 1, which
  * is the dominant cost of brute-force / IVF cosine scoring where
  * neighbor norms can't be cheaply pre-joined. NULL semantics mirror
  * the composed DotProductF form: null array, length mismatch, or any
  * null element yields NULL — and so does a zero-norm (or empty) input,
  * where cosine is undefined (the composed form's non-ANSI Divide also
  * NULLs on the 0.0 divisor; a raw NaN would silently flip IS NULL
  * filters after the optimizer rule fuses user SQL).
  */
case class CosineSimF(left: Expression, right: Expression,
    failOnZero: Boolean = false)
    extends BinaryExpression {

  // getFloat reads require array<float> inputs — reject anything else at
  // analysis time (the expression is SQL-reachable via GraftExtensions,
  // where array<double> literals would otherwise yield garbage).
  // Hand-rolled: ExpectsInputTypes needs private[sql] AbstractDataType.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // may be null even for non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var naa = 0.0; var nbb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      naa += xv * xv
      nbb += yv * yv
      i += 1
    }
    // zero-norm (or empty) input: cosine is undefined — NULL on the
    // direct function surface (never a raw-Java NaN, which would flip
    // IS NULL filters), or an arithmetic error when the optimizer rule
    // fused an ANSI-mode Divide (failOnZero preserves the un-fused
    // query's divide-by-zero semantics exactly)
    val denom = math.sqrt(naa) * math.sqrt(nbb)
    if (denom == 0.0) {
      if (failOnZero) throw new ArithmeticException("Division by zero")
      null
    } else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val naa = ctx.freshName("naa")
      val nbb = ctx.freshName("nbb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $naa = 0.0; double $nbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $x.getFloat($i);
         |    double $yv = (double) $y.getFloat($i);
         |    $dot += $xv * $yv;
         |    $naa += $xv * $xv;
         |    $nbb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($naa) * java.lang.Math.sqrt($nbb);
         |    if ($denom == 0.0) {
         |      ${if (failOnZero)
                  s"""throw new ArithmeticException("Division by zero");"""
                else s"${ev.isNull} = true;"}
         |    }
         |    else { ${ev.value} = $dot / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight) // failOnZero preserved
}

object CosineSimF {
  import org.apache.spark.sql.graft.ColumnBridge
  /** Column-level entry point (expects two array<float> columns). */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      CosineSimF(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
