package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the summed non-overlapping occurrence
  * counts of a fixed set of ASCII literal needles in one string, in a
  * single pass over the raw UTF-8 bytes.
  *
  * Replaces the `needles.map(t => regexp_count(text, lit(t))).reduce(+)`
  * chain on [[graft.operators.TextQuality.langId]]'s hot path: that form
  * runs one full Java-regex engine pass over every document PER NEEDLE
  * (six for the English trigram profile). This kernel fetches the bytes
  * once and runs a plain windowed byte-compare per needle — no regex
  * machinery, no per-needle string re-materialization.
  *
  * Semantics contract (pinned generatively in PropertiesSpec, and
  * corpus-wide by the unchanged DuckDB oracle): each needle is counted
  * independently with regex-scan NON-OVERLAPPING semantics — scan left
  * to right, and on a match resume AFTER the matched window (i += len),
  * exactly what `regexp_count`/`regexp_extract_all` do for a literal
  * pattern. Needles must be non-empty ASCII: an ASCII byte sequence
  * never matches inside a UTF-8 multibyte sequence, so byte positions
  * and character positions agree for both the match test and the
  * resume-after skip. */
@ExpressionDescription(
  usage = "count_literals(string) - summed non-overlapping counts of fixed ASCII needles")
case class CountLiterals(child: Expression, needles: Seq[String])
    extends UnaryExpression {
  require(needles.nonEmpty && needles.forall(n =>
    n.nonEmpty && n.forall(_ < 0x80)),
    s"needles must be non-empty ASCII literals, got $needles")

  override def dataType: DataType = LongType

  @transient private lazy val needleBytes: Array[Array[Byte]] =
    needles.map(_.getBytes("US-ASCII")).toArray

  override def nullSafeEval(a: Any): Any =
    CountLiterals.compute(a.asInstanceOf[UTF8String], needleBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("needles", needleBytes,
      "byte[][]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.CountLiterals.compute($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountLiterals {

  def compute(s: UTF8String, needles: Array[Array[Byte]]): Long = {
    val b = s.getBytes
    val len = b.length
    var total = 0L
    var k = 0
    while (k < needles.length) {
      val nd = needles(k)
      val nl = nd.length
      var i = 0
      while (i <= len - nl) {
        var j = 0
        while (j < nl && b(i + j) == nd(j)) j += 1
        if (j == nl) { total += 1; i += nl } else i += 1
      }
      k += 1
    }
    total
  }

  def count_literals(a: Column, needles: Seq[String]): Column =
    GraftColumnBridge.column(CountLiterals(GraftColumnBridge.expression(a), needles))
}
