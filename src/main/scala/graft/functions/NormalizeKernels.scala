package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd replacements for the two PER-CHARACTER regex passes in the
  * corpus-normalization family. `regexp_replace` with a single-codepoint
  * pattern re-enters the Java regex machinery once per character of
  * every document — measured (sf3, 32-way-parallel scan): text_normalize
  * 14.4 s and doc_quality 11.8 s while every non-regex corpus scan of
  * the same shape ran 1-2 s. Each kernel is one codepoint loop with
  * EXACTLY the regex chain's semantics, so the DuckDB oracles (which
  * spell the same chains in RE2) hash-match unchanged.
  */
object NormalizeKernels {

  /** `trim(regexp_replace(regexp_replace(lowered, "[^a-z0-9 \t\n\r\f]",
    * " "), "[ \t\n\r\f]+", " "))` ≡ the maximal runs of [a-z0-9]
    * codepoints of the (already lowercased) input joined by single
    * spaces: every char outside [a-z0-9] becomes whitespace under the
    * first regex (or already is), the second collapses whitespace runs,
    * trim drops the ends. The caller lowercases with Spark's `lower`
    * so case folding stays byte-identical with the builtin. */
  def joinAlnumRuns(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      } else {
        // any other codepoint — ascii ws, punctuation, or non-ascii
        // (surrogate pairs included: neither half is alnum) — separates
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** `length(regexp_replace(lowered, "[a-z0-9 ]", ""))` ≡ the count of
    * codepoints outside [a-z0-9 ] — i.e. string length in CODEPOINTS
    * (what Spark's `length` counts) minus the alnum-or-space ones;
    * surrogate pairs count once, like the regex engine counts them. */
  def countNonAlnumSpace(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var cnt = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      val keep = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == ' '
      if (!keep) cnt += 1
      i += Character.charCount(cp)
    }
    cnt
  }

  /** `regexp_count(lowered, "[a-z]+|[0-9]+|[^a-z0-9 ]")` ≡ (# maximal
    * a-z runs) + (# maximal 0-9 runs) + (# codepoints outside
    * [a-z0-9 ]): the regex engine scans left-to-right, so a letter
    * starts one whole-run match, a digit likewise, any other non-space
    * codepoint is a single-char match, and spaces match nothing. */
  def countBpeishTokens(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var cnt = 0L
    var run = 0 // 0 none, 1 letters, 2 digits
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp >= 'a' && cp <= 'z') {
        if (run != 1) { cnt += 1; run = 1 }
      } else if (cp >= '0' && cp <= '9') {
        if (run != 2) { cnt += 1; run = 2 }
      } else {
        run = 0
        if (cp != ' ') cnt += 1
      }
      i += Character.charCount(cp)
    }
    cnt
  }

  /** Shared by interpreted eval and generated code: original first,
    * then the deletion at each codepoint index in order. */
  def deletionVariants(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.toString
    val nCp = str.codePointCount(0, str.length)
    val out = new Array[Any](nCp + 1)
    out(0) = s
    var cp = 0
    var idx = 0
    while (cp < nCp) {
      val next = str.offsetByCodePoints(idx, 1)
      out(cp + 1) = UTF8String.fromString(str.substring(0, idx) + str.substring(next))
      idx = next
      cp += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** The ≤k-codepoint-deletion neighborhood (FastSS / symmetric-delete
    * generalized to edit distance k): every DISTINCT string reachable by
    * deleting at most k codepoints — the original first, then depth 1
    * in position order, then depth 2, ... (BFS over unique strings, so
    * the order is deterministic and the nondeterminism audit stays
    * clean). Distinctness matters at k ≥ 2: deleting positions (i, j)
    * and (j, i) reach the same string and repeated codepoints alias, so
    * emitting duplicates would multiply the downstream equi-join's
    * fan-out per bucket for no recall.
    *
    * Completeness (ed(a,b) ≤ k ⇒ a and b share a variant): fix an
    * optimal edit script between a and b; deleting from a the ≤k
    * positions the script substitutes-at-or-deletes and from b the ≤k
    * positions it substitutes-at-or-inserts leaves both at the script's
    * common subsequence — a member of both neighborhoods. So the
    * variant equi-join is a complete candidate generator for any k,
    * with the exact `levenshtein` verify restoring precision. */
  def deletionVariantsUpTo(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.toString
    val seen = new java.util.LinkedHashSet[String]()
    seen.add(str)
    var frontier: List[String] = str :: Nil
    var depth = 0
    while (depth < k && frontier.nonEmpty) {
      val next = List.newBuilder[String]
      frontier.foreach { t =>
        var idx = 0
        while (idx < t.length) {
          val after = t.offsetByCodePoints(idx, 1)
          val v = t.substring(0, idx) + t.substring(after)
          if (seen.add(v)) next += v
          idx = after
        }
      }
      frontier = next.result()
      depth += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Position-carrying single-deletion neighborhood: (original, -1)
    * then (delete codepoint i, i) for each i — the FastSS refinement
    * that lets the ed ≤ 1 candidate join carry the deletion POSITION in
    * its key. Why it matters at scale: on a dense key space (zero-padded
    * consecutive IDs — TPC-H customer names) the position-blind variant
    * buckets grow with corpus density and Σ|bucket|² goes superlinear
    * (measured r13: 2.45 s at sf0.1 → 207 s at sf1, 84× at 10× data).
    * Keying by (variant, position) shrinks a substitution bucket to the
    * strings that differ at exactly THAT position (≤ alphabet size),
    * restoring ~linear cost. Completeness for ed(a,b) ≤ 1:
    *  - a == b: they share every (del_i, i), and (a, -1) == (b, -1);
    *  - substitution at i: del_i(a) == del_i(b) — same position i;
    *  - insertion/deletion: the longer's del_i equals the SHORTER
    *    ITSELF — matched by joining deletions (pos ≥ 0) against
    *    originals, not by position equality.
    * So (same-position equi-join) ∪ (deletion ⋈ original) is a complete
    * candidate generator at radius 1, with exact levenshtein verify
    * unchanged. */
  def deletionVariantsPos(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.toString
    val nCp = str.codePointCount(0, str.length)
    val out = new Array[Any](nCp + 1)
    out(0) = org.apache.spark.sql.catalyst.InternalRow(s, -1)
    var cp = 0
    var idx = 0
    while (cp < nCp) {
      val next = str.offsetByCodePoints(idx, 1)
      out(cp + 1) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(str.substring(0, idx) + str.substring(next)), cp)
      idx = next
      cp += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Position-PAIR 2-deletion neighborhood: (delete codepoints i and j,
    * i, j) for every i < j — C(nCp, 2) entries, positions in ORIGINAL
    * codepoint coordinates, no 0- or 1-deletion entries (those live in
    * [[deletionVariantsPos]]). The radius-2 analog of the positional
    * refinement: a same-length pair differing by exactly two
    * substitutions at positions {i, j} shares the variant obtained by
    * deleting i and j from EITHER side — same string, same position
    * pair — so an equi-join on (v, i, j) is complete for the
    * substitution-substitution subcase with buckets bounded by the
    * per-position-pair alphabet instead of the whole ≤2-deletion
    * neighborhood (see Dedup.editDistancePairsDirected's k=2
    * decomposition for how the remaining ed-2 classes are covered). */
  def deletionVariantsPos2(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.toString
    val nCp = str.codePointCount(0, str.length)
    val out = new Array[Any](if (nCp < 2) 0 else nCp * (nCp - 1) / 2)
    if (nCp >= 2) {
      // codepoint index -> char offset, once
      val offs = new Array[Int](nCp + 1)
      var c = 0
      var idx = 0
      while (c < nCp) { offs(c) = idx; idx = str.offsetByCodePoints(idx, 1); c += 1 }
      offs(nCp) = str.length
      var n = 0
      var i = 0
      while (i < nCp) {
        var j = i + 1
        while (j < nCp) {
          val sb = new java.lang.StringBuilder(str.length)
          sb.append(str, 0, offs(i))
          sb.append(str, offs(i + 1), offs(j))
          sb.append(str, offs(j + 1), str.length)
          out(n) = org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromString(sb.toString), i, j)
          n += 1
          j += 1
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def deletion_variants(a: Column): Column =
    GraftColumnBridge.column(DeletionVariants(GraftColumnBridge.expression(a)))

  def deletion_variants_pos(a: Column): Column =
    GraftColumnBridge.column(
      DeletionVariantsPos(GraftColumnBridge.expression(a)))

  def deletion_variants_pos2(a: Column): Column =
    GraftColumnBridge.column(
      DeletionVariantsPos2(GraftColumnBridge.expression(a)))

  def deletion_variants_up_to(a: Column, k: Int): Column =
    GraftColumnBridge.column(
      DeletionVariantsUpTo(GraftColumnBridge.expression(a), k))

  def join_alnum_runs(a: Column): Column =
    GraftColumnBridge.column(JoinAlnumRuns(GraftColumnBridge.expression(a)))

  def count_bpeish_tokens(a: Column): Column =
    GraftColumnBridge.column(CountBpeishTokens(GraftColumnBridge.expression(a)))

  def count_non_alnum_space(a: Column): Column =
    GraftColumnBridge.column(CountNonAlnumSpace(GraftColumnBridge.expression(a)))
}

@ExpressionDescription(
  usage = "join_alnum_runs(string) - [a-z0-9] runs joined by single spaces")
case class JoinAlnumRuns(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    NormalizeKernels.joinAlnumRuns(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NormalizeKernels.joinAlnumRuns($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "count_bpeish_tokens(string) - matches of [a-z]+|[0-9]+|[^a-z0-9 ]")
case class CountBpeishTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    NormalizeKernels.countBpeishTokens(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NormalizeKernels.countBpeishTokens($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "count_non_alnum_space(string) - codepoints outside [a-z0-9 ]")
case class CountNonAlnumSpace(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    NormalizeKernels.countNonAlnumSpace(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NormalizeKernels.countNonAlnumSpace($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: the string plus every single-codepoint-
  * deletion variant — the symmetric-delete neighborhood for exact
  * edit-distance-1 joins (the FastSS / symmetric-delete family:
  * Bocek et al., "Fast Similarity Search in Large Dictionaries", 2007;
  * the scheme SymSpell popularized). Two strings with ed ≤ 1 ALWAYS
  * share a variant: substitution — delete the differing position from
  * both; insertion/deletion — delete the inserted codepoint from the
  * longer; equality — the strings themselves. So an equi-join on
  * variants is a COMPLETE candidate generator, and unlike positional
  * segment/q-gram blocking it stays subquadratic on shared-prefix
  * entity strings (a variant carries the whole discriminating tail, so
  * "customer#..."-style common prefixes do not collapse into one hot
  * bucket the way a prefix segment does). Codepoint-aware: deleting
  * half a surrogate pair would manufacture invalid strings. */
/** Position-carrying sibling of [[DeletionVariants]] — see
  * [[NormalizeKernels.deletionVariantsPos]] for the scale argument and
  * the radius-1 completeness cases. */
@ExpressionDescription(
  usage = "deletion_variants_pos(string) - array of (variant, deleted position); original at pos -1")
case class DeletionVariantsPos(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.IntegerType, nullable = false))),
      containsNull = false)
  override def nullSafeEval(a: Any): Any =
    NormalizeKernels.deletionVariantsPos(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NormalizeKernels.deletionVariantsPos($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Position-pair sibling at radius 2 — see
  * [[NormalizeKernels.deletionVariantsPos2]] for the completeness
  * subcase it carries. */
@ExpressionDescription(
  usage = "deletion_variants_pos2(string) - array of (variant, i, j) for every codepoint pair i < j deleted")
case class DeletionVariantsPos2(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("i",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("j",
          org.apache.spark.sql.types.IntegerType, nullable = false))),
      containsNull = false)
  override def nullSafeEval(a: Any): Any =
    NormalizeKernels.deletionVariantsPos2(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NormalizeKernels.deletionVariantsPos2($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The parameterized sibling of [[DeletionVariants]]: the DISTINCT
  * ≤k-deletion neighborhood (see
  * [[NormalizeKernels.deletionVariantsUpTo]] for the completeness
  * argument). `k` is a plan-time constant carried on the expression —
  * at k = 1 the output is exactly `array_distinct(deletion_variants(s))`
  * (pinned generatively in PropertiesSpec). */
@ExpressionDescription(
  usage = "deletion_variants_up_to(string, k) - distinct variants with <= k codepoint deletions")
case class DeletionVariantsUpTo(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 0, s"deletion depth k must be >= 0, got $k")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    NormalizeKernels.deletionVariantsUpTo(a.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NormalizeKernels.deletionVariantsUpTo($x, $k);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "deletion_variants(string) - the string + each 1-codepoint-deletion")
case class DeletionVariants(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    NormalizeKernels.deletionVariants(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NormalizeKernels.deletionVariants($x);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
