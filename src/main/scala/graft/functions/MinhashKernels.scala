package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: K 64-bit hash lanes of one string, for
  * the MinHash signature pass ([[graft.operators.Dedup]]).
  *
  * The direct formulation — K independent `xxhash64(seed_i, sh)` agg
  * columns — re-hashes the full shingle string K times per occurrence;
  * at K=64 the signature pass costs 64 string hashes per (doc, shingle)
  * row and measures as large as the candidate join itself (BuildProf,
  * sf1: minhash_bands 3.7 s vs jaccard_pairs 3.5 s). This kernel hashes
  * the string ONCE (XXH64, Spark's own xxhash64 implementation) and
  * derives the K lanes with a splitmix64 stream over the base value —
  * one generated loop, 1 string hash + K integer mixes per row.
  *
  * splitmix64 (Steele/Lea/Flood, "Fast splittable pseudorandom number
  * generators", OOPSLA 2014 — the finalizer Java's SplittableRandom
  * ships) is a bijective full-avalanche mixer, the standard way to
  * expand one 64-bit value into an independent-behaving hash family;
  * for min-wise hashing the lanes only need pairwise-uniform behavior.
  * The derived buckets differ from the old seeds' — candidate SETS may
  * shift — but every LSH consumer verifies candidates with exact
  * Jaccard before emitting, so the registered outputs are unchanged
  * (oracle-gated) as long as banding recall holds, which DedupSpec
  * gates structurally and the oracle re-run confirms corpus-wide.
  *
  * CORRELATED-COLLISION caveat (r12 advice): deriving all K lanes from
  * ONE 64-bit base changes the failure structure, not just the seeds.
  * With K independent string hashes, two distinct shingles collide on
  * lane i independently (~2^-64 per lane); here, a collision on the
  * BASE value collides on EVERY lane and EVERY band simultaneously
  * (~2^-64 per shingle pair, total — astronomically rare, but
  * all-or-nothing when it happens). Downstream exact-Jaccard
  * verification bounds the damage to RECALL (a spurious shared minimum
  * can only add candidates, which verify away; it can remove a true
  * candidate only via the same 2^-64 event). A future consumer WITHOUT
  * an exact-verify stage — e.g. trusting band buckets as final — must
  * not inherit this kernel unknowingly: use independent seeded hashes
  * there, or accept the correlated failure mode explicitly. */
@ExpressionDescription(
  usage = "seeded_hashes(string) - K splitmix64-derived hash lanes of xxhash64(string)")
case class SeededHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    SeededHashes.compute(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SeededHashes.compute($x, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SeededHashes {

  private val GOLDEN = 0x9E3779B97F4B7C15L

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Shared by interpreted eval and generated code. Returns an unboxed
    * primitive-long array (UnsafeArrayData): the signature pass runs
    * this per (doc, shingle) occurrence, and a GenericArrayData here
    * would box K longs per row — measured to cost as much as the K
    * string hashes it replaced. */
  def compute(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.expressions.UnsafeArrayData = {
    val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      out(i) = mix(base + (i + 1) * GOLDEN)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def seeded_hashes(a: Column, k: Int): Column =
    GraftColumnBridge.column(SeededHashes(GraftColumnBridge.expression(a), k))
}
