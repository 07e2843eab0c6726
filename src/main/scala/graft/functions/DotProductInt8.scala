package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the int8-array dot product — the inner
  * loop of the quantized similarity path (SimilarityOps.quantizedTopK).
  * Same rationale as [[DotProduct]]: the `aggregate(zip_with(...))`
  * higher-order formulation materializes a zipped intermediate and folds
  * through generic getters with a per-element lambda dispatch; this emits
  * one fused multiply-accumulate loop over the two byte buffers.
  *
  * Integer arithmetic is exact (|x|≤127, so a 64-dim dot is ≤ ~1.0e6 —
  * nowhere near long overflow), so the result is bit-identical to the HOF
  * fold and to the DuckDB oracle's integer list_sum regardless of order;
  * the loop keeps index order anyway for symmetry with DotProduct.
  */
case class DotProductInt8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_int8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getByte(i).toLong * y.getByte(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductInt8 =
    copy(left = newLeft, right = newRight)
}

object DotProductInt8 {
  /** Column-level accessor (no SQL registration needed). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProductInt8(Bridge.expression(a), Bridge.expression(b)))
}
