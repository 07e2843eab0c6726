package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the double-array dot product — the inner
  * loop of every similarity operator (cosine top-k, near-dup pairs, label
  * centroids; SURVEY §2 extension surface).
  *
  * Why a custom Expression instead of the `aggregate(zip_with(...))`
  * higher-order-function formulation (kept as `SimilarityOps.dotHof` for
  * the spec cross-check): the HOF materializes a zipped intermediate array
  * and folds through generic SpecializedGetters with a lambda dispatch per
  * element; `doGenCode` emits one fused multiply-add loop over the two
  * `ArrayData` buffers. Accumulation order is identical (index order,
  * starting at 0.0), so results are bit-equal to the HOF and to the
  * DuckDB oracle's `list_sum(list_transform(...))`.
  *
  * Length mismatch yields the dot over the common prefix (embeddings are
  * fixed-width by schema; the HOF twin would null-pad instead — the spec
  * pins equality on real data, where lengths always agree).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level accessor (no SQL registration needed). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
