package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused form of the engine's portable hash primitive
  * ([[graft.Det.md5int60]]): the first 60 bits of md5 as a positive
  * long, bit-identical to the composed chain
  * `conv(substring(md5(x), 1, 15), 16, 10) CAST long` — proven by a
  * randomized equivalence spec AND by the full oracle gate (every
  * hash-derived split/sample/arm assignment in the t2 map flows
  * through it).
  *
  * Why native: the chain materializes a 32-char hex string, substrings
  * it, and re-parses 15 chars back to binary — three codegen'd
  * expressions and two string allocations per row on the hot path of
  * ~15 operators (splits, samplers, A/B arms, erasure tombstones). The
  * fused form runs one digest over the raw UTF-8 bytes and assembles
  * the 60-bit value directly from the first 7½ digest bytes: the 15
  * leading hex nibbles ARE the high nibbles of the digest, so
  * `(first 7 bytes) << 4 | high nibble of byte 7` is exactly the
  * base-16 parse of the substring. No hex string ever exists.
  *
  * Both eval and codegen route through [[Md5Int60F.hash60]] (a
  * thread-local MessageDigest — instance reuse without contention),
  * keeping the two paths trivially identical.
  */
case class Md5Int60F(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_int60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Int60F.hash60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Int60F.hash60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Int60F {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long — the base-16
    * value of the digest's 15 leading hex nibbles. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >>> 4)
  }

  import org.apache.spark.sql.graft.ColumnBridge
  /** Column-level entry point (expects a string column). */
  def md5int60(c: Column): Column =
    ColumnBridge.toColumn(Md5Int60F(ColumnBridge.toExpression(c)))
}
