package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: common-element COUNT of two SORTED
  * distinct bigint arrays in one O(n+m) merge pass, with whole-stage
  * codegen.
  *
  * Agrees exactly with `size(array_intersect(a, b))` when both inputs
  * are sorted-ascending with distinct elements (randomized-pinned in
  * ScalaTest) — which is precisely the shape of the graph ops'
  * `sort_array(collect_list(...))` adjacency arrays. Versus the
  * composed form this never materializes the intersection ARRAY (no
  * per-row allocation, no hash set): for the sparsify scoring loop,
  * where only the count survives into the Jaccard arithmetic, the
  * intersection buffer is pure garbage-collector pressure at 100-TB
  * adjacency widths. The triangle op keeps `array_intersect` — it
  * needs the witness ELEMENTS, not just the count.
  *
  * NULL semantics mirror [[CosineSimF]]: null array or any null
  * element yields NULL. No sortedness check is performed at runtime
  * (it would cost the pass the fusion saves) — the contract is the
  * caller's, like every merge join's.
  */
case class SortedIntersectCountF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  if ($x.isNullAt($i) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountF {
  import org.apache.spark.sql.graft.ColumnBridge
  /** Column-level entry point (expects two sorted array<bigint> cols). */
  def count(a: Column, b: Column): Column =
    ColumnBridge.toColumn(SortedIntersectCountF(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}
