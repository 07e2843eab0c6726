package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling hash
  * (graft.ops.TextOps.HashBase/HashMod over the input's UTF-8 bytes) —
  * the document-fingerprinting hot path.
  *
  * Why a custom Expression instead of a UDF: `doGenCode` emits a tight Java
  * loop that whole-stage codegen inlines into the scan stage — no
  * serialization, no lambda dispatch per char, no boxing. The `aggregate`
  * higher-order-function formulation (TextOps.rollingHash) allocates an
  * array of per-char longs and folds through generic SpecializedGetters;
  * this loop touches each byte once. Identical results on ASCII input
  * (byte == codepoint); byte-based is the defined semantic at scale.
  */
case class RollingHash(child: Expression,
                       base: Long = graft.ops.TextOps.HashBase,
                       mod: Long = graft.ops.TextOps.HashMod) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * ${base}L + ($bytes[$i] & 0xff)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column-level accessor (no SQL registration needed). */
  def apply(c: Column): Column = Bridge.column(RollingHash(Bridge.expression(c)))

  /** Parameterized variant — independent hash families for sketching ops
    * (SimHash draws two; the constants live with the op that uses them). */
  def apply(c: Column, base: Long, mod: Long): Column =
    Bridge.column(RollingHash(Bridge.expression(c), base, mod))
}

/** SparkSessionExtensions hook: `spark.sql.extensions=graft.functions.GraftExtensions`
  * makes `graft_rolling_hash(str)` available in SQL text. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.rollingHashDescriptor)
  }
}

object GraftExtensions {
  val rollingHashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
    (children: Seq[Expression]) => RollingHash(children.head))

  /** Runtime registration for sessions created without the extensions conf
    * (e.g. the driver harness builds its own SparkSession). */
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark,
      rollingHashDescriptor._1, rollingHashDescriptor._2, rollingHashDescriptor._3)
}
