package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Numerically-stable log-domain sum: logsumexp(x₁…xₙ) = m + ln(Σ exp(xᵢ−m)).
  *
  * This is SURVEY A11 — the one genuinely custom aggregate in the port.
  * The reference hand-rolls it as `sumLogProbs(a,b) = max + log1p(exp(min −
  * max))` and folds pairwise (`RunPersonalizedPageRankBasic.java:595-607`)
  * to keep PageRank masses in log space without underflow.
  *
  * Implemented as a typed `Aggregator` with a running (max, scaled-sum)
  * buffer, so both the partial (map-side) and merge (reduce-side) paths
  * stay stable — Spark runs it as a two-phase aggregation exactly like the
  * reference's combiner/reducer split.
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

  /** Column form for DataFrame aggregations. */
  def logsumexp(c: Column): Column = udaf(aggregator).apply(c)
}
