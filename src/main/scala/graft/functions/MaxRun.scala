package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge

/** Native Catalyst expression: length of the longest run of equal
  * ADJACENT elements in a string array — callers pass a sorted array to
  * get the max multiplicity of any value (doc_repetition's max_repeat).
  *
  * Replaces an `aggregate()` fold whose accumulator was a 3-field
  * struct (prev, run, best): higher-order folds evaluate through
  * interpreted lambdas and allocate a struct per element, and the
  * struct-state form also falls out of whole-stage codegen. This is one
  * generated loop with two longs and a string compare — the same
  * (count-equal-adjacent) arithmetic, so swapping it in changes no
  * oracle hash. Empty arrays → 0 (the fold's zero state); null input →
  * null. */
@ExpressionDescription(
  usage = "max_run(array<string>) - longest run of equal adjacent elements")
case class MaxRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    MaxRun.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.MaxRun.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxRun {

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    var best = 1L
    var run = 1L
    var i = 1
    while (i < n) {
      if (arr.getUTF8String(i) == arr.getUTF8String(i - 1)) {
        run += 1
        if (run > best) best = run
      } else run = 1L
      i += 1
    }
    best
  }

  def max_run(a: Column): Column =
    GraftColumnBridge.column(MaxRun(GraftColumnBridge.expression(a)))
}
