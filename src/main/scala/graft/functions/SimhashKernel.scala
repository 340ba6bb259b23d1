package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge

/** Native Catalyst expression: the full 60-bit SimHash fingerprint of a
  * token array, in one generated per-row loop.
  *
  * The aggregate formulation ([[graft.operators.Dedup.simhashFingerprint]]
  * until r14) exploded every token occurrence and ran 60 conditional-sum
  * agg columns over a doc_id exchange — correct and map-side-combined,
  * but it paid (a) one exploded row per occurrence, (b) Spark's
  * md5 → HEX STRING → substring → conv(16,10) chain per occurrence (three
  * string materializations to reach a 60-bit integer), and (c) a
  * hash-aggregate carrying 60 long states per doc. A SimHash fingerprint
  * is a PER-DOCUMENT pure function — nothing about it needs an exchange —
  * so this kernel computes the whole thing inside the scan projection:
  * one MD5 over the token's UTF-8 bytes (top 60 bits read directly off
  * the raw digest, no hex string), 60 counter updates, one sign pass.
  * The fingerprint stage of `dedup_simhash` becomes a zero-shuffle
  * map-only scan; at corpus scale the occurrence explosion and the
  * 60-state aggregate never exist at all.
  *
  * Bit-exactness contract (oracle-checked corpus-wide, generatively
  * pinned in PropertiesSpec): per token, `h` equals
  * `conv(substring(md5(w), 1, 15), 16, 10)` — the leading 15 hex chars
  * of the digest are the top 60 bits of its first 8 bytes, so
  * `firstEightBytesBigEndian >>> 4` is the same value with no string in
  * between. Per bit b: count +1 when bit b of h is set, else −1 (summing
  * ±1 per OCCURRENCE equals summing ±tf per type); fingerprint bit b is
  * set iff the count is > 0 — exactly the aggregate form's
  * `sum(when(...)) > 0`. A null token (impossible from `tokenize`, whose
  * output is null-free) mirrors the aggregate form's null-propagation:
  * `when(null === 1, 1).otherwise(-1)` took the otherwise branch, i.e.
  * −1 on every bit.
  *
  * Reference behavior: near-dup detection over the corpus
  * (ShadongLiu/Hadoop-and-Spark computes per-token hash features in its
  * text pipeline, e.g. PairsPMI.scala's tokenize+hash pass); SimHash per
  * Charikar, "Similarity estimation techniques from rounding algorithms",
  * STOC 2002. */
@ExpressionDescription(
  usage = "simhash60(array<string>) - 60-bit md5-derived SimHash fingerprint")
case class Simhash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    Simhash60.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.Simhash60.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash60 {

  val bits = 60

  /** Shared by interpreted eval and generated code. One MessageDigest
    * instance per row (it resets itself on `digest()`), reused across
    * the row's tokens — no thread-local needed, no allocation per
    * token beyond the digest's own output array. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s == null) {
        // mirror the aggregate form: null hash → otherwise(−1) per bit
        var b = 0
        while (b < bits) { counts(b) -= 1; b += 1 }
      } else {
        val d = md.digest(s.getBytes)
        // leading 15 hex chars == top 60 bits of the first 8 digest bytes
        var top = 0L
        var j = 0
        while (j < 8) { top = (top << 8) | (d(j) & 0xffL); j += 1 }
        val h = top >>> 4
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  def simhash60(a: Column): Column =
    GraftColumnBridge.column(Simhash60(GraftColumnBridge.expression(a)))
}
