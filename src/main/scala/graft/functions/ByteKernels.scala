package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge

/** Fused byte-domain kernels for the multimodal blob path (r11) — each
  * replaces a per-BYTE interpreted lambda chain
  * (`aggregate(transform(sequence(...), j => ascii(substr(...))), ...)`)
  * with one generated loop over the binary value. The corpus is ASCII,
  * so unsigned byte sums equal the HOF forms' per-character `ascii`
  * sums exactly (the documented premise of the whole opaque-blob oracle
  * family) and no oracle hash moves. Found the same way as the r6g
  * token-kernel sweep: multimodal_frame_sample read 7.7 s at sf1 with
  * per-byte lambdas fully dominating a map-only scan. */

/** Unsigned sum of all bytes — `aggregate(transform(sequence(1, len),
  * j => ascii(substr(b, j, 1))), 0L, _ + _)` fused. */
@ExpressionDescription(
  usage = "sum_bytes(binary) - unsigned sum of all bytes")
case class SumBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    ByteKernels.sumBytes(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ByteKernels.sumBytes($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unsigned sum of every `stride`-th byte starting at offset 0 — the
  * nearest-neighbor byte-decimation sum of [[graft.operators.Multimodal]]
  * mediaResize, fused. */
@ExpressionDescription(
  usage = "stride_sum_bytes(binary, stride) - unsigned sum of every stride-th byte")
case class StrideSumBytes(child: Expression, stride: Int) extends UnaryExpression {
  require(stride > 0, "stride must be positive")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    ByteKernels.strideSumBytes(a.asInstanceOf[Array[Byte]], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ByteKernels.strideSumBytes($x, $stride);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteKernels {

  def sumBytes(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  def strideSumBytes(bytes: Array[Byte], stride: Int): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += stride }
    s
  }

  def sum_bytes(b: Column): Column =
    GraftColumnBridge.column(SumBytes(GraftColumnBridge.expression(b)))

  def stride_sum_bytes(b: Column, stride: Int): Column =
    GraftColumnBridge.column(StrideSumBytes(GraftColumnBridge.expression(b), stride))
}
