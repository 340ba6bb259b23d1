package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter construction as an algebraic aggregate.
  *
  * The filter is a fixed-size bitset (an `array<bigint>` of `nBits/64`
  * words) built by OR-merge — a commutative, associative monoid, so
  * Spark computes map-side partials per partition and the shuffle
  * carries one bitset per partition instead of the element stream
  * (the in-mapper-combining shape, SURVEY A2, applied to set
  * membership). Probe positions are computed as COLUMN expressions
  * (`xxhash64(seed=i, e) mod m`, codegen'd) and fed to the aggregate
  * pre-hashed — builder and prober share the identical expression, so
  * the no-false-negative guarantee is structural: an inserted element's
  * probe re-evaluates the same positions that set its bits
  * (PropertiesSpec pins it generatively; bit-boundary positions 0, 63,
  * 64, m−1 included by construction of the law's random draws).
  *
  * Classic use (Bloom 1970; the standard semi-join prune in
  * distributed query engines): replace a broadcast of a large exact
  * key set with a ~10-bits-per-key bitset, stream the big side
  * map-only through the bitset, and exact-verify only the survivors —
  * false positives cost verify work, never correctness.
  */
object BloomFilter {

  /** Bitset OR-monoid over pre-hashed bit positions. `nBits` must be a
    * multiple of 64. The buffer is mutated in place (Aggregator
    * contract permits it); merge ORs word-wise. */
  class BitsetAgg(nBits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(nBits % 64 == 0, s"nBits must be a multiple of 64, got $nBits")
    private val nWords = nBits / 64
    def zero: Array[Long] = new Array[Long](nWords)
    def reduce(b: Array[Long], pos: Long): Array[Long] = {
      b((pos >>> 6).toInt) |= 1L << (pos & 63)
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < nWords) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** The i-th probe position of expression `e` in an m-bit filter:
    * `xxhash64(i, e) mod m` — k independent hash functions by seeding
    * xxhash64 with the probe index (codegen'd on both build and probe
    * sides). */
  def position(e: Column, i: Int, nBits: Long): Column =
    pmod(xxhash64(lit(i), e), lit(nBits))

  /** True iff `pos`'s bit is set in the bitset column `bloom`
    * (element_at is 1-based; the shift amount is a column, so the
    * variable-shift SQL form is used). */
  def bitSet(bloom: Column, pos: Column): Column =
    call_function("shiftright",
      element_at(bloom, shiftright(pos, 6).cast("int") + lit(1)),
      pmod(pos, lit(64L)).cast("int"))
      .bitwiseAND(lit(1L)) === lit(1L)

  /** Membership test: all k probe positions of `e` are set. */
  def mightContain(bloom: Column, e: Column, k: Int, nBits: Long): Column =
    (0 until k).map(i => bitSet(bloom, position(e, i, nBits))).reduce(_ && _)
}
