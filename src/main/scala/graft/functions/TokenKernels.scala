package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Fused token-array kernels (r6g) — each replaces an interpreted
  * higher-order `filter`/`aggregate` lambda chain in a timed map-only
  * scan with one generated loop. Every kernel reproduces its HOF
  * predecessor's arithmetic exactly, so no oracle hash moves. */

/** Occurrences of any member of a FIXED word set in a token array —
  * `size(filter(ws, _.isInCollection(set)))` with the per-token lambda
  * fused away. Occurrence semantics (repeats count), matching the
  * oracles' `len(list_filter(...))`. */
@ExpressionDescription(
  usage = "count_in(array<string>) - occurrences of a fixed word set")
case class CountIn(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = LongType

  @transient private lazy val set = CountIn.toSet(words)

  override def nullSafeEval(a: Any): Any =
    CountIn.compute(a.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, classOf[java.util.HashSet[_]].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.CountIn.compute($x, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountIn {

  private[functions] def toSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def compute(ws: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = ws.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (set.contains(ws.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def count_in(a: Column, words: Seq[String]): Column =
    GraftColumnBridge.column(CountIn(GraftColumnBridge.expression(a), words))
}

/** Sum of per-token character lengths —
  * `aggregate(ws, 0L, (acc, w) => acc + length(w))` fused. */
@ExpressionDescription(
  usage = "sum_char_lengths(array<string>) - total characters across tokens")
case class SumCharLengths(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    SumCharLengths.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SumCharLengths.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SumCharLengths {

  def compute(ws: ArrayData): Long = {
    val n = ws.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += ws.getUTF8String(i).numChars(); i += 1 }
    s
  }

  def sum_char_lengths(a: Column): Column =
    GraftColumnBridge.column(SumCharLengths(GraftColumnBridge.expression(a)))
}

/** Order-sensitive rolling token fingerprint — the
  * `aggregate(transform(ws, ascii(first)·256 + length), 0L,
  * (acc, x) => (acc·31 + x) % 2147483647)` fold fused into one loop.
  * Token code uses the first code point (tokens here are [a-z0-9]+, so
  * the first byte IS the code point — matching Spark's `ascii`). */
@ExpressionDescription(
  usage = "token_fingerprint(array<string>) - rolling hash over token codes")
case class TokenFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    TokenFingerprint.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TokenFingerprint.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenFingerprint {

  def compute(ws: ArrayData): Long = {
    val n = ws.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val w = ws.getUTF8String(i)
      val code = (w.getByte(0) & 0xff).toLong * 256L + w.numChars()
      acc = (acc * 31L + code) % 2147483647L
      i += 1
    }
    acc
  }

  def token_fingerprint(a: Column): Column =
    GraftColumnBridge.column(TokenFingerprint(GraftColumnBridge.expression(a)))
}
