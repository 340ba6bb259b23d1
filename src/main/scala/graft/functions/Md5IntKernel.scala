package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for [[TextFunctions.md5Int]]: the leading
  * `hexChars` hex digits of md5, as a long — read straight off the raw
  * digest bytes.
  *
  * The Column-chain form `conv(substring(md5(c), 1, n), 16, 10)`
  * materializes a 32-char hex STRING per call (Spark's Md5 expression
  * renders the digest to hex), substrings it (another UTF8String), then
  * re-parses the hex back to the integer it started as. That chain sits
  * on per-OCCURRENCE hot paths — the span-dedup gram hash, the
  * spam/embedding feature bucketizers, the minhash-error lanes — where
  * the three string materializations cost more than the md5 itself.
  * This kernel computes the digest once (thread-local MessageDigest,
  * reset by `digest()` itself) and assembles the value nibble-by-nibble
  * from the raw bytes: zero intermediate strings, bit-identical output
  * for every `hexChars` ≤ 15 (pinned generatively in PropertiesSpec
  * against the conv-chain arithmetic). The DuckDB oracle mirror
  * ([[TextFunctions.md5IntSql]]) is untouched — values are unchanged,
  * so every consuming oracle row stays exact. */
@ExpressionDescription(
  usage = "md5_int(string, n) - leading n hex digits of md5 as a BIGINT")
case class Md5Int(child: Expression, hexChars: Int) extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 15,
    s"hexChars must be in [1, 15] (60 bits max, clear of BIGINT sign), got $hexChars")

  // child must already be StringType (callers cast explicitly — the
  // repo's kernel convention, same as SeededHashes); a non-string child
  // fails fast in nullSafeEval rather than silently hashing a
  // different byte rendering than the DuckDB oracle's md5(TEXT)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    Md5Int.compute(a.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.Md5Int.compute($x, $hexChars);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Int {

  /** One digest instance per thread: Spark evaluates a partition on one
    * thread, `digest()` resets the instance, and `getInstance("MD5")`
    * per row would pay a provider lookup on exactly the per-occurrence
    * paths this kernel exists to speed up. */
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String, hexChars: Int): Long = {
    val d = md.get().digest(s.getBytes)
    // leading hexChars nibbles, big-endian — exactly the value
    // conv(substring(hex(digest), 1, hexChars), 16, 10) parses
    var v = 0L
    var c = 0
    while (c < hexChars) {
      val b = d(c >> 1) & 0xff
      val nibble = if ((c & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      c += 1
    }
    v
  }

  def md5_int(a: Column, hexChars: Int): Column =
    GraftColumnBridge.column(Md5Int(GraftColumnBridge.expression(a), hexChars))
}
