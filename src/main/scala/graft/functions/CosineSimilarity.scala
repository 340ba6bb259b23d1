package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/** Native Catalyst expression: cosine similarity of two double arrays.
  *
  * The Column-function formulation (`zip_with` + `aggregate`) evaluates
  * per-element through interpreted higher-order lambdas; this expression
  * generates a single fused Java loop via `doGenCode`, so vector math
  * stays inside whole-stage codegen — the "custom Expression beats UDF"
  * rung of the extension ladder. Math is the same IEEE sequence the
  * DuckDB oracle uses (ascending dot and norm accumulators,
  * `dot / (sqrt(na)·sqrt(nb))`), so exact hash-compares keep working.
  *
  * Null/length semantics: null if either side is null; 0.0 for length
  * mismatch or zero-norm inputs (callers treat "no signal" as orthogonal).
  */
@ExpressionDescription(
  usage = "cosine_similarity(array<double>, array<double>) - cosine of the angle between two vectors")
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // library-internal: callers guarantee array<double> inputs (casts applied
  // at call sites), so no analysis-time coercion contract is declared
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    CosineSimilarity.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.CosineSimilarity.compute($x, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Shared by interpreted eval and generated code — one tight loop. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (n != y.numElements()) return 0.0
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val a = x.getDouble(i)
      val b = y.getDouble(i)
      dot += a * b
      na += a * a
      nb += b * b
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosine_similarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Native Catalyst expression: ascending-order dot product of two double
  * arrays — the same fused-loop rationale as [[CosineSimilarity]]
  * (`zip_with` + `aggregate` evaluates through interpreted higher-order
  * lambdas and falls out of whole-stage codegen). The accumulation order
  * is the ascending left-to-right sequence the HOF form and the DuckDB
  * oracle's `list_dot_product` both use, so swapping it into a query
  * changes no hash. Length mismatch → 0.0 (the [[CosineSimilarity]]
  * "no signal" convention); null if either side is null. */
@ExpressionDescription(
  usage = "dot_product(array<double>, array<double>) - ascending-order dot product")
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.DotProduct.compute($x, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Shared by interpreted eval and generated code — one tight loop,
    * ascending order (the oracle's list_dot_product sequence). */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (n != y.numElements()) return 0.0
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
