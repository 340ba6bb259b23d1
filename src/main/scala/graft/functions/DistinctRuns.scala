package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge

/** Native Catalyst expression: number of runs of equal ADJACENT elements
  * in a string array — callers pass a SORTED array to get its distinct
  * count. On a sorted array this equals `size(array_distinct(arr))`
  * exactly (equal values are adjacent iff the array is sorted), without
  * array_distinct's per-row hash set and materialized output array: the
  * r14 doc_repetition profile showed the distinct pass duplicating work
  * the max_run pass's sorted input had already paid for. Same loop
  * shape as [[MaxRun]] — two longs and a string compare per element.
  * Empty array → 0; null input → null. */
@ExpressionDescription(
  usage = "distinct_runs(array<string>) - number of runs of equal adjacent elements")
case class DistinctRuns(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    DistinctRuns.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.DistinctRuns.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistinctRuns {

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    var runs = 1L
    var i = 1
    while (i < n) {
      if (arr.getUTF8String(i) != arr.getUTF8String(i - 1)) runs += 1
      i += 1
    }
    runs
  }

  def distinct_runs(a: Column): Column =
    GraftColumnBridge.column(DistinctRuns(GraftColumnBridge.expression(a)))
}
