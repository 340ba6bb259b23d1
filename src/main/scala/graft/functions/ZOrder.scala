package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge

/** Morton (Z-order) interleave of two 16-bit grid coordinates — the
  * space-filling-curve key behind multi-dimensional data clustering
  * (the Delta/Iceberg `ZORDER BY` layout play): sorting by the
  * interleaved key keeps rows close in BOTH dimensions physically
  * adjacent, so per-file/row-group min/max stats become tight boxes on
  * each dimension and a 2-D box predicate skips most of the table at
  * scan time.
  *
  * The key only decides physical ROW ORDER at write time — it never
  * appears in a query result, so it needs no oracle mirror; correctness
  * of the layout's consumers is gated by their own oracles over the
  * original columns. Codegen'd like every graft kernel: the magic-number
  * bit spreading is 10 ops per coordinate, far cheaper than a loop. */
@ExpressionDescription(
  usage = "z_value(a, b) - Morton interleave of two coords clamped to [0, 65535]")
case class ZValue(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrder.morton($x, $y);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {

  /** Spread the low 16 bits of `v` to even bit positions (standard
    * magic-number bit interleave). */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code of two coordinates clamped to the 16-bit grid: `a` on
    * even bits, `b` on odd. */
  def morton(a: Long, b: Long): Long = {
    val ca = math.min(math.max(a, 0L), 65535L)
    val cb = math.min(math.max(b, 0L), 65535L)
    spread(ca) | (spread(cb) << 1)
  }

  def z_value(a: Column, b: Column): Column =
    GraftColumnBridge.column(ZValue(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
