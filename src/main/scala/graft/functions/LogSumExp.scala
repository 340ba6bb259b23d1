package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Numerically-stable log-domain sum: logsumexp(x₁…xₙ) = m + ln(Σ exp(xᵢ−m)).
  *
  * This is SURVEY A11 — the one genuinely custom aggregate in the port.
  * The reference hand-rolls it as `sumLogProbs(a,b) = max + log1p(exp(min −
  * max))` and folds pairwise (`RunPersonalizedPageRankBasic.java:595-607`)
  * to keep PageRank masses in log space without underflow.
  *
  * Two implementations with IDENTICAL per-row arithmetic (asserted
  * against each other in FunctionsSpec):
  *
  *  - [[LogSumExpAgg]], a native `DeclarativeAggregate`: the running
  *    (max, scaled-sum) buffer lives in two primitive double slots of the
  *    hash-aggregate buffer, every update/merge is a codegen'd Catalyst
  *    expression, and the whole aggregation runs in `HashAggregateExec`
  *    inside whole-stage codegen. This is the production path — in the
  *    log-space PPR loop it replaces an object-hash aggregation that
  *    paid per-row encode/decode on ~1M rows × 10 iterations.
  *  - [[aggregator]], the typed `Aggregator` form (kept as the
  *    cross-check and as the reference-shaped combiner/reducer
  *    formulation — Spark runs it as a two-phase aggregation exactly
  *    like the reference's combiner/reducer split).
  */
object LogSumExp {

  case class Buf(m: Double, s: Double) // m = running max, s = Σ exp(x−m)

  val aggregator: Aggregator[Double, Buf, Double] =
    new Aggregator[Double, Buf, Double] {
      def zero: Buf = Buf(Double.NegativeInfinity, 0.0)
      def reduce(b: Buf, x: Double): Buf =
        // −∞ inputs contribute exp(−∞)=0, but must not reach the arithmetic
        // below: with an empty buffer (b.m = −∞) the x ≤ b.m branch would
        // compute exp(−∞ − −∞) = NaN and poison the whole group. Mirrors
        // the merge() guards (reference sumLogProbs has the same case).
        if (x == Double.NegativeInfinity) b
        else if (b.m == Double.NegativeInfinity) Buf(x, 1.0)
        else if (x <= b.m) Buf(b.m, b.s + math.exp(x - b.m))
        else Buf(x, b.s * math.exp(b.m - x) + 1.0)
      def merge(a: Buf, b: Buf): Buf =
        if (a.m == Double.NegativeInfinity) b
        else if (b.m == Double.NegativeInfinity) a
        else if (a.m >= b.m) Buf(a.m, a.s + b.s * math.exp(b.m - a.m))
        else Buf(b.m, b.s + a.s * math.exp(a.m - b.m))
      def finish(b: Buf): Double =
        if (b.m == Double.NegativeInfinity) Double.NegativeInfinity
        else b.m + math.log(b.s)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** The typed-Aggregator Column form (cross-check path). */
  def logsumexpUdaf(c: Column): Column = udaf(aggregator).apply(c)

  /** Column form for DataFrame aggregations — the native declarative
    * aggregate (codegen'd hash aggregation). */
  def logsumexp(c: Column): Column =
    GraftColumnBridge.column(
      LogSumExpAgg(GraftColumnBridge.expression(c)).toAggregateExpression())
}

/** Native logsumexp as a `DeclarativeAggregate`: branch-for-branch the
  * same IEEE arithmetic as [[LogSumExp.aggregator]]'s reduce/merge/finish
  * (see the NaN guards there), expressed as Catalyst expressions over a
  * two-double buffer so the aggregation stays in `HashAggregateExec` +
  * whole-stage codegen instead of object aggregation. Null inputs are
  * skipped (SQL aggregate semantics), like the −∞ branch. */
case class LogSumExpAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "logsumexp"

  private lazy val m = AttributeReference("m", DoubleType, nullable = false)()
  private lazy val s = AttributeReference("s", DoubleType, nullable = false)()
  private val negInf = Literal(Double.NegativeInfinity, DoubleType)

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(m, s)
  override lazy val initialValues: Seq[Expression] = Seq(negInf, Literal(0.0, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = child
    val skip = Or(IsNull(x), EqualTo(x, negInf))
    Seq(
      If(skip, m,
        If(EqualTo(m, negInf), x,
          If(LessThanOrEqual(x, m), m, x))),
      If(skip, s,
        If(EqualTo(m, negInf), Literal(1.0, DoubleType),
          If(LessThanOrEqual(x, m),
            Add(s, Exp(Subtract(x, m))),
            Add(Multiply(s, Exp(Subtract(m, x))), Literal(1.0, DoubleType))))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(EqualTo(m.left, negInf), m.right,
      If(EqualTo(m.right, negInf), m.left,
        If(GreaterThanOrEqual(m.left, m.right), m.left, m.right))),
    If(EqualTo(m.left, negInf), s.right,
      If(EqualTo(m.right, negInf), s.left,
        If(GreaterThanOrEqual(m.left, m.right),
          Add(s.left, Multiply(s.right, Exp(Subtract(m.right, m.left)))),
          Add(s.right, Multiply(s.left, Exp(Subtract(m.left, m.right))))))))

  override lazy val evaluateExpression: Expression =
    If(EqualTo(m, negInf), negInf, Add(m, Log(s)))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
