package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator` UDTF: positional k-gram word shingles
  * (SURVEY §2.L — the declared-optional custom-Generator stretch).
  *
  * `shingle_gen(words, k)` emits one row `(pos, shingle)` per window
  * position `0 … n−k` over an `array<string>`, with the shingle built
  * by space-joining the k words — exactly the rows the built-in
  * composition
  * `posexplode(transform(sequence(0, size(words)−k), i → concat_ws(' ',
  * slice(words, i+1, k))))` produces (equivalence pinned in ScalaTest),
  * but in ONE generator evaluation instead of materializing the full
  * shingle ARRAY per row first: the transform-based form allocates an
  * O(words × k) array value per document before the Generate consumes
  * it, which for the dedup pipeline's 5-gram shingling is the dominant
  * allocation. A generator streams the windows row by row.
  *
  * Semantics mirrored from the composition: NULL or shorter-than-k
  * input emits nothing (the `size ≥ k` guard built in); null elements
  * inside a window are skipped by the join exactly like `concat_ws`.
  * Generators are not codegen'd by Spark (Generate is its own physical
  * operator), so CodegenFallback costs nothing here.
  */
case class ShingleGen(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = true)))

  override def prettyName: String = "shingle_gen"

  private lazy val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return Iterator.empty
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) words(i) = arr.getUTF8String(i)
      i += 1
    }
    (0 to n - k).iterator.map { p =>
      // concatWs skips nulls — the same null-element semantics as the
      // built-in concat_ws the equivalence test compares against
      InternalRow(p, UTF8String.concatWs(sep,
        java.util.Arrays.copyOfRange(words, p, p + k): _*))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleGen {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-level entry point: `df.select($"id", ShingleGen.shingles($"words", 5))`
    * yields columns (pos, shingle). */
  def shingles(words: Column, k: Int): Column =
    ColumnBridge.toColumn(ShingleGen(ColumnBridge.toExpression(words), k))
}
