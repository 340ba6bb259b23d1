package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: adjacent-pair strings `"w[i] w[i+1]"`
  * from a token array — the flat-string form of [[TextFunctions.bigrams]]
  * used where the bigram is a VALUE (dedup keys, repetition stats)
  * rather than a struct to destructure.
  *
  * Replaces `transform(zip_with(...), concat_ws(...))`: two nested
  * higher-order functions evaluate per element through interpreted
  * lambdas (plus a struct allocation per pair) and keep the whole
  * projection out of whole-stage codegen. This is one generated loop
  * concatenating UTF8 bytes. Output strings are identical, so oracle
  * hashes are unchanged. <2 tokens → empty array; null input → null. */
@ExpressionDescription(
  usage = "bigram_strings(array<string>) - adjacent-pair strings \"w[i] w[i+1]\"")
case class BigramStrings(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    BigramStrings.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.BigramStrings.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramStrings {

  private val space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n - 1)
    var i = 0
    var prev = ws.getUTF8String(0)
    while (i < n - 1) {
      val next = ws.getUTF8String(i + 1)
      out(i) = UTF8String.concat(prev, space, next)
      prev = next
      i += 1
    }
    new GenericArrayData(out)
  }

  def bigram_strings(a: Column): Column =
    GraftColumnBridge.column(BigramStrings(GraftColumnBridge.expression(a)))
}

/** Native Catalyst expression: all space-joined word k-grams of a token
  * array (positions i..i+k-1), k fixed at plan time — the generalized
  * sibling of [[BigramStrings]] for the dedup family's shingles, where
  * the `transform(sequence(...), concat_ws(element_at×k))` form paid an
  * interpreted lambda + k positional lookups per shingle. Output
  * strings identical; callers apply `array_distinct` on top where set
  * semantics are wanted. <k tokens → empty array; null → null. */
@ExpressionDescription(
  usage = "ngram_strings(array<string>) - space-joined k-grams (k fixed at construction)")
case class NgramStrings(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    NgramStrings.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NgramStrings.compute($x, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramStrings {

  private val space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(ws: ArrayData, k: Int): ArrayData = {
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = ws.getUTF8String(i); i += 1 }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](2 * k - 1)
      var j = 0
      while (j < k) {
        parts(2 * j) = toks(i + j)
        if (j < k - 1) parts(2 * j + 1) = space
        j += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def ngram_strings(a: Column, k: Int): Column =
    GraftColumnBridge.column(NgramStrings(GraftColumnBridge.expression(a), k))
}

/** Native Catalyst expression: ALL ordered pairs `"ws[i] ws[j]"` (i ≠ j)
  * of a token array — the co-occurrence pair generator for the PMI
  * family. The input is the per-doc first-40-DISTINCT token set
  * (`PairsPMI.scala:85`), so the output is bounded at 40·39 = 1,560
  * strings per document and each ordered pair appears exactly once —
  * the same multiset the previous `ex JOIN ex ON doc_id` formulation
  * produced, but generated locally inside one codegen'd loop: the two
  * doc_id exchanges and the sort-merge machinery of the self-join
  * disappear, and the pair stream feeds the (w1, w2) partial aggregate
  * inside the same task. Tokens are whitespace-split upstream, so the
  * space separator is unambiguous. <2 tokens → empty array; null → null. */
@ExpressionDescription(
  usage = "pair_strings(array<string>) - all ordered pairs \"w[i] w[j]\", i != j")
case class PairStrings(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    PairStrings.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PairStrings.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairStrings {

  private val space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. Null tokens are
    * SKIPPED (treated as absent), honoring the declared
    * `containsNull = false` output type for any input — the sole call
    * site feeds `array_distinct(slice(tokenize(...)))` which cannot
    * hold nulls, but the kernel is a generic expression and must not
    * smuggle a null through a non-nullable slot (review r12c). */
  def compute(ws: ArrayData): ArrayData = {
    val n0 = ws.numElements()
    var n = 0
    val toks = new Array[UTF8String](n0)
    var i = 0
    while (i < n0) {
      if (!ws.isNullAt(i)) { toks(n) = ws.getUTF8String(i); n += 1 }
      i += 1
    }
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n * (n - 1))
    var k = 0
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (i != j) { out(k) = UTF8String.concat(toks(i), space, toks(j)); k += 1 }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def pair_strings(a: Column): Column =
    GraftColumnBridge.column(PairStrings(GraftColumnBridge.expression(a)))
}
