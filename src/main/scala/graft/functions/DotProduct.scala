package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two float arrays, with
  * whole-stage codegen (SURVEY §2.L stretch item).
  *
  * Semantically identical to the HOF form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` —
  * a strict left-to-right double accumulation over the elements — but
  * evaluated as a tight primitive loop instead of per-element lambda
  * dispatch, which keeps the brute-force cosine path inside one codegen
  * stage. NULL semantics mirror the HOF form exactly (required because
  * DotProductRewrite substitutes this expression session-wide): a null
  * array, a LENGTH MISMATCH (zip_with pads the shorter side with nulls,
  * which poison the sum), or any null element all yield NULL.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  // The eval/codegen bodies read elements with getFloat, so anything but
  // array<float> must FAIL ANALYSIS — on array<double> the same reads
  // would bit-reinterpret garbage under codegen. This expression is
  // SQL-reachable (GraftExtensions registers it), so the guard is load-
  // bearing for direct user SQL, not just for the rewrite rule.
  // (ExpectsInputTypes is unusable outside the sql package —
  // AbstractDataType is private[sql] — so the check is hand-rolled.)
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
  override def prettyName: String = "dot_product_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductF {
  import org.apache.spark.sql.graft.ColumnBridge
  /** Column-level entry point (expects two array<float> columns). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      DotProductF(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
