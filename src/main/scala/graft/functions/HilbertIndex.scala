package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 2-D HILBERT curve index of cells
  * (x, y) ∈ [0, 2^bits)² — the sort key of `TxTable.compactHilbert`.
  *
  * Why a custom Expression instead of the `aggregate` higher-order
  * function: HOFs are CodegenFallback — the 16-round flip-and-rotate
  * recurrence evaluated interpreted, per row, with a struct allocation
  * per round, measured 23.7 s for one 600k-row rewrite; `doGenCode`
  * emits the same recurrence as a tight Java while-loop that whole-stage
  * codegen inlines (sub-second). The interpreted twin (`nullSafeEval`)
  * calls the identical shared `compute`, so both paths agree by
  * construction; PropertySpec pins the curve itself by its DEFINING
  * properties — full-grid bijection and unit-step adjacency — so no
  * transcription error can hide behind a copied reference.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 16, s"hilbert cells of 1..16 bits, got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_index"

  override protected def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertIndex.compute(xv.asInstanceOf[Long], yv.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) =>
      s"${ev.value} = graft.functions.HilbertIndex$$.MODULE$$.compute($xs, $ys, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** The classic xy→d flip-and-rotate recurrence, shared verbatim by the
    * interpreted and generated paths (the codegen calls straight into
    * this JIT-compiled method — one static call per row beats inlined
    * source once C2 warms, and keeps one copy of the algorithm). */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // Quadrant rotation: ry == 0 swaps the (possibly flipped) axes.
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column-level accessor (no SQL registration needed). */
  def apply(x: Column, y: Column, bits: Int): Column =
    Bridge.column(HilbertIndex(Bridge.expression(x), Bridge.expression(y), bits))
}
