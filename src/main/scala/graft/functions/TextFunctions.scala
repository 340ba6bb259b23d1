package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-analytics column functions (SURVEY §2.8 F1–F7).
  *
  * The reference tokenizes with bespin's `Tokenizer.tokenize`
  * (`WordCount.java:61`, trait mixed in at `PairsPMI.scala:42`): lowercase,
  * strip non-alphanumerics, split. Re-expressed as pure `Column`
  * expressions so the whole tokenize→explode→aggregate pipeline stays
  * inside whole-stage codegen — no UDF, no serialization boundary; at
  * 100 TB the tokenizer is the hot loop of every text job.
  *
  * The exact same semantics are mirrored in the DuckDB oracles as
  * `list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), ...)`.
  */
object TextFunctions {

  /** F1: lowercase, split on runs of non-alphanumerics, drop empties.
    * `array_remove(_, "")` drops exactly the elements the previous
    * `filter(length > 0)` HOF dropped (split emits no nulls, order
    * preserved) — but ArrayRemove is a codegen'd collection expression
    * while the lambda filter evaluated interpreted per token in every
    * text query's scan projection (r6g). */
  def tokenize(c: Column): Column =
    array_remove(split(lower(c), "[^a-z0-9]+"), "")

  /** DuckDB mirror of [[tokenize]] over a column named `text` — the single
    * source of truth for every oracle CTE; a tokenizer change that touches
    * only one side would silently break the hash-compare of every text
    * operator. */
  val tokenizeSql: String =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)"

  /** Cross-engine deterministic integer hash: the leading `hexChars` hex
    * digits of md5, parsed as an integer. md5 is bit-identical in Spark
    * and DuckDB, so hash-derived featurizations (simhash, hashing-trick
    * features, stratified sampling) become SQL-oracle-able. Keep
    * `hexChars ≤ 15` (60 bits) to stay clear of BIGINT sign overflow.
    * Since r14 this is the native [[Md5Int]] kernel — same value as the
    * original `conv(substring(md5(c), 1, hexChars), 16, 10)` chain
    * (pinned generatively), with the digest read directly instead of
    * three intermediate string materializations per call. */
  def md5Int(c: Column, hexChars: Int): Column =
    Md5Int.md5_int(c, hexChars)

  /** DuckDB mirror of [[md5Int]] over the SQL expression `e`: hex decode
    * via a shift-sum list comprehension — integer arithmetic throughout
    * (a 16^k double power would lose exactness past 2^53). */
  def md5IntSql(e: String, hexChars: Int): String =
    s"""(list_sum([((strpos('0123456789abcdef', substr(md5($e), x, 1)) - 1)::BIGINT
        << (($hexChars - x) * 4)) for x in range(1, ${hexChars + 1})]))::BIGINT"""

  /** F6: adjacent-pair (bigram) structs from a token array.
    * `zip_with` pads the shorter side with null, so the trailing
    * (last, null) pair is filtered out. Reference: `tokens.sliding(2)`
    * (`ComputeBigramRelativeFrequencyPairs.scala:61`). */
  def bigrams(toks: Column): Column =
    filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)

  /** P9: the reference PMI jobs consider only the first 40 tokens of a
    * line, deduplicated (`PairsPMI.scala:66-68`). */
  def first40Distinct(toks: Column): Column =
    array_distinct(slice(toks, 1, 40))
}
