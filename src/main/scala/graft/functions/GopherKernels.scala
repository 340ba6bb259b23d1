package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd kernels for the Gopher rule battery (the r6g discipline:
  * a higher-order-function lambda evaluates interpreted per element,
  * and quality_gopher_rules paid one regex + one lambda PER WORD — the
  * sf3 scaling run measured the query at ~28x wall for 30x data, the
  * per-byte constant fully dominating. Each kernel is one fused loop
  * over the array, byte-level where ASCII semantics allow, inside
  * whole-stage codegen.
  *
  * Value compatibility with the HOF forms is exact (the oracle SQL and
  * hashes are unchanged):
  *  - count_alpha mirrors `regexp_count(lower(w), "[a-z]") > 0`: the
  *    element is Unicode-lowercased with UTF8String.toLowerCase (the
  *    same kernel functions.lower uses — Kelvin-sign K lowers to k
  *    exactly like the old path) and its BYTES are scanned for a-z
  *    (multi-byte continuation bytes are >= 0x80 and cannot collide).
  *  - count_bullet/count_ellipsis mirror substring(ltrim(l),1,1) IN
  *    (-,*,•) / endswith(rtrim(l), "...") — ltrim/rtrim strip 0x20
  *    only, the bullet is matched as its 3-byte UTF-8 sequence.
  *  - count_in_lower mirrors CountIn over transform(w, lower). */
@ExpressionDescription(
  usage = "count_nonempty(array<string>) - elements with length > 0")
case class CountNonEmpty(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    GopherKernels.countNonEmpty(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.GopherKernels.countNonEmpty($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "count_alpha(array<string>) - elements whose lowercase form contains a-z")
case class CountAlpha(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    GopherKernels.countAlpha(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.GopherKernels.countAlpha($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "count_bullet_lines(array<string>) - lines whose first non-space char is -, * or •")
case class CountBulletLines(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    GopherKernels.countBullet(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.GopherKernels.countBullet($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "count_ellipsis_lines(array<string>) - lines ending with ... after space-rtrim")
case class CountEllipsisLines(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    GopherKernels.countEllipsis(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.GopherKernels.countEllipsis($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "count_in_lower(array<string>) - elements whose lowercase form is in the set")
case class CountInLower(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = LongType
  @transient private lazy val set = CountIn.toSet(words)
  override def nullSafeEval(a: Any): Any =
    GopherKernels.countInLower(a.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, classOf[java.util.HashSet[_]].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.GopherKernels.countInLower($x, $setRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherKernels {

  def countNonEmpty(ws: ArrayData): Long = {
    val n = ws.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (ws.getUTF8String(i).numBytes() > 0) c += 1
      i += 1
    }
    c
  }

  def countAlpha(ws: ArrayData): Long = {
    val n = ws.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      val lw = ws.getUTF8String(i).toLowerCase
      val bytes = lw.getBytes
      var j = 0
      var hit = false
      while (!hit && j < bytes.length) {
        val b = bytes(j)
        if (b >= 'a' && b <= 'z') hit = true
        j += 1
      }
      if (hit) c += 1
      i += 1
    }
    c
  }

  def countBullet(ls: ArrayData): Long = {
    val n = ls.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      val bytes = ls.getUTF8String(i).getBytes
      var j = 0
      while (j < bytes.length && bytes(j) == ' ') j += 1
      if (j < bytes.length) {
        val b = bytes(j)
        val bullet = b == '-' || b == '*' ||
          (b == 0xE2.toByte && j + 2 < bytes.length &&
            bytes(j + 1) == 0x80.toByte && bytes(j + 2) == 0xA2.toByte)
        if (bullet) c += 1
      }
      i += 1
    }
    c
  }

  def countEllipsis(ls: ArrayData): Long = {
    val n = ls.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      val bytes = ls.getUTF8String(i).getBytes
      var e = bytes.length
      while (e > 0 && bytes(e - 1) == ' ') e -= 1
      if (e >= 3 && bytes(e - 1) == '.' && bytes(e - 2) == '.' && bytes(e - 3) == '.')
        c += 1
      i += 1
    }
    c
  }

  def countInLower(ws: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = ws.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (set.contains(ws.getUTF8String(i).toLowerCase)) c += 1
      i += 1
    }
    c
  }

  def count_nonempty(a: Column): Column =
    GraftColumnBridge.column(CountNonEmpty(GraftColumnBridge.expression(a)))
  def count_alpha(a: Column): Column =
    GraftColumnBridge.column(CountAlpha(GraftColumnBridge.expression(a)))
  def count_bullet_lines(a: Column): Column =
    GraftColumnBridge.column(CountBulletLines(GraftColumnBridge.expression(a)))
  def count_ellipsis_lines(a: Column): Column =
    GraftColumnBridge.column(CountEllipsisLines(GraftColumnBridge.expression(a)))
  def count_in_lower(a: Column, words: Seq[String]): Column =
    GraftColumnBridge.column(CountInLower(GraftColumnBridge.expression(a), words))
}
