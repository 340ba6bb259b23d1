package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftColumnBridge

/** Codegen'd kernels for the C4 line-level cleaning heuristics
  * (Raffel et al. 2020, arXiv:1910.10683 §2.2 — the rule battery the
  * C4/mC4 pretraining corpora were built with). Same discipline as
  * [[GopherKernels]]: the per-line predicate is one fused byte-level
  * loop inside whole-stage codegen instead of a HOF lambda + regex
  * per line (the r6g lesson: interpreted per-element constants dominate
  * a map-only corpus scan).
  *
  * A line is KEPT when all three hold (ibid.):
  *  - it ends (after space-rtrim) in a terminal punctuation mark:
  *    `.` `!` `?` or the end-quote `"`;
  *  - it contains at least [[C4Kernels.minWordsPerLine]] whitespace
  *    words (RE2 `\s` within a line: space, tab, newline, form feed,
  *    CR — NOT 0x0B, which Java's `\s` would add — maximal
  *    non-whitespace runs, so exactly the oracle's
  *    `len([x for x in regexp_split_to_array(l,'\s+') if len(x)>0])`);
  *  - its lowercase form does not contain "javascript".
  *
  * Byte-level scanning is exact under UTF-8: continuation bytes are
  * >= 0x80 and cannot collide with the ASCII punctuation/whitespace
  * tested; the "javascript" containment lowers with
  * UTF8String.toLowerCase — the same kernel `functions.lower` uses.
  * The page-level rules (>= 5 sentences, no "lorem ipsum", no `{`)
  * stay plain Catalyst expressions in the query; only the per-line
  * loops need kernels.
  */
@ExpressionDescription(
  usage = "count_c4_kept_lines(array<string>) - lines passing the C4 line rules")
case class CountC4KeptLines(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    C4Kernels.countKept(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.C4Kernels.countKept($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "sum_c4_sentences(array<string>) - terminal-punct count over C4-kept lines")
case class SumC4Sentences(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    C4Kernels.sumSentences(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.C4Kernels.sumSentences($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object C4Kernels {

  /** C4's "at least three words" line rule (ibid. §2.2). */
  val minWordsPerLine = 3L

  private val javascript = UTF8String.fromString("javascript")

  /** RE2's `\s` — [\t\n\f\r ] WITHOUT 0x0B (vertical tab) — because the
    * DuckDB oracle splits words with RE2 `regexp_split_to_array(l,'\s+')`.
    * Java's `\s` includes 0x0B; matching it here was a latent
    * cross-engine divergence (r10 advice), now exercised by the
    * engineered c4Samples row whose word count a \x0B decides. */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r'

  /** The C4 line predicate — shared by both kernels so kept-count and
    * sentence-sum can never disagree on which lines are kept. */
  def isKept(line: UTF8String): Boolean = {
    val bytes = line.getBytes
    var e = bytes.length
    while (e > 0 && bytes(e - 1) == ' ') e -= 1
    if (e == 0) return false
    val last = bytes(e - 1)
    if (!(last == '.' || last == '!' || last == '?' || last == '"')) return false
    // maximal non-whitespace runs == nonempty \s+ split tokens
    var words = 0L
    var i = 0
    var inWord = false
    while (i < bytes.length) {
      val ws = isWs(bytes(i))
      if (!ws && !inWord) { words += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    if (words < minWordsPerLine) return false
    !line.toLowerCase.contains(javascript)
  }

  def countKept(ls: ArrayData): Long = {
    val n = ls.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (isKept(ls.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Sentence proxy over the KEPT text: occurrences of `.` `!` `?` in
    * kept lines (byte scan — continuation bytes cannot collide). */
  def sumSentences(ls: ArrayData): Long = {
    val n = ls.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      val l = ls.getUTF8String(i)
      if (isKept(l)) {
        val bytes = l.getBytes
        var j = 0
        while (j < bytes.length) {
          val b = bytes(j)
          if (b == '.' || b == '!' || b == '?') c += 1
          j += 1
        }
      }
      i += 1
    }
    c
  }

  def count_c4_kept_lines(a: Column): Column =
    GraftColumnBridge.column(CountC4KeptLines(GraftColumnBridge.expression(a)))
  def sum_c4_sentences(a: Column): Column =
    GraftColumnBridge.column(SumC4Sentences(GraftColumnBridge.expression(a)))
}
