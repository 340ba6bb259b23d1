package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning over the corpus — the tokenizer-
  * training stage of an LLM data pipeline (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"),
  * expressed Spark-first.
  *
  * Scale shape — why this survives 100 TB where a naive port would not:
  * after ONE pass over the corpus (the wordcount shuffle), the working
  * set is the (distinct token, count) table, whose size is the VOCABULARY
  * — corpus-size-independent (Heaps-law sublinear in practice). Every
  * merge iteration is then one grouped aggregation + one map over that
  * table: pair counts weighted by word frequency are exactly the corpus
  * pair counts, so no iteration ever touches the documents again. The
  * per-iteration argmax is a 1-row driver fetch (bounded by
  * construction, the knn-query-side pattern).
  *
  * Representation: each distinct token becomes its DOUBLE-space-joined
  * symbol string with a terminal `_` marker ("the" → "t  h  e  _";
  * tokens are [a-z0-9]+ so `_` cannot collide). A merge of pair (a, b)
  * pads the word with one outer space and rewrites every " a  b "
  * occurrence to " ab " — `replace` has identical
  * leftmost-non-overlapping semantics in Spark and DuckDB, and the
  * double-space invariant is what makes that EQUAL true left-to-right
  * BPE: each match consumes one of the two delimiter spaces on each
  * side and the replacement restores it, so an immediately adjacent
  * occurrence still has its boundary. (The single-space encoding fails
  * exactly there — consecutive "a b a b" merges only the first pair
  * because the shared delimiter is consumed — a divergence the
  * PropertiesSpec generative law caught against a driver-side reference
  * before it shipped.) Boundaries cannot match mid-symbol: a match
  * requires a space immediately before the full symbol `a` and after
  * `b`, and symbols never contain spaces. This is what makes the whole
  * iterative procedure SQL-oracle-able: the oracle replays all K
  * iterations as unrolled MATERIALIZED CTE stages (the spam-SGD / IVF
  * discipline). Ties on pair count break by pair string ascending —
  * total order, both engines.
  *
  * [[bpeMerges]] returns the learned merge table (step, pair, merged,
  * pair count at selection time). [[bpeVocab]] returns the corpus
  * subword vocabulary after applying all K merges — segmentation counts
  * weighted by token frequency, i.e. the APPLY side's aggregate result.
  */
object Bpe {

  /** Number of merges learned. Small because the synthetic corpus's
    * vocabulary is small; the plan is K-iteration generic. */
  val merges = 12

  /** (spaced symbol string, token count) fixed point after `upTo` merges,
    * plus the merge log. One corpus pass, then vocabulary-sized work. */
  /** The per-iteration argmax under BPE's criterion: raw pair count
    * (the selection key IS the count). Returns (pair, count, key). */
  private def pickByCount(cur: DataFrame): Array[org.apache.spark.sql.Row] = {
    val toks = split(col("w"), "  ")
    cur
      .select(explode(TextFunctions.bigrams(toks)).as("p"), col("cnt"))
      .groupBy(concat_ws(" ", col("p.w1"), col("p.w2")).as("pair"))
      .agg(sum(col("cnt")).as("c"))
      .select(col("pair"), col("c"), col("c").as("k"))
      .orderBy(desc("k"), asc("pair"))
      .limit(1)
      .collect() // 1 row — the per-iteration argmax, bounded by construction
  }

  /** WordPiece's criterion (Schuster & Nakajima 2012; the wordpiece /
    * SentencePiece-BPE "likelihood gain" rule as publicly described):
    * merge the pair maximizing count(ab) / (count(a) · count(b)) — the
    * pointwise association, not the raw frequency, so rare-but-
    * exclusive pairs merge before frequent-but-independent ones. The
    * key is quantized to an exact integer — floor(c·10¹² / (uₐ·u_b)) —
    * because a raw double ratio's total ORDER is what the argmax
    * consumes and quantization makes ties well-defined on both engines
    * (same floor on the same IEEE division; all inputs exact in
    * doubles: c ≤ 2^53/10¹², uₐ·u_b ≤ 2^53). Ties break by pair
    * string ascending, the BPE discipline. */
  private def pickByRatio(cur: DataFrame): Array[org.apache.spark.sql.Row] = {
    val toks = split(col("w"), "  ")
    val uni = cur.select(explode(toks).as("sym"), col("cnt"))
      .groupBy("sym").agg(sum(col("cnt")).as("uc"))
    cur
      .select(explode(TextFunctions.bigrams(toks)).as("p"), col("cnt"))
      .groupBy(col("p.w1").as("a"), col("p.w2").as("b"))
      .agg(sum(col("cnt")).as("c"))
      .join(uni.toDF("a", "ua"), "a")
      .join(uni.toDF("b", "ub"), "b")
      .select(concat_ws(" ", col("a"), col("b")).as("pair"), col("c"),
        floor(col("c").cast("double") * lit(1000000000000L) /
          (col("ua") * col("ub"))).cast("long").as("k"))
      .orderBy(desc("k"), asc("pair"))
      .limit(1)
      .collect()
  }

  private def trainLoop(spark: SparkSession, dir: String)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    val (fixed, log) = mergeLoop(spark, dir, pickByCount)
    (fixed, log.map { case (k, pair, merged, c, _) => (k, pair, merged, c) })
  }

  /** The shared merge loop: only the argmax criterion differs between
    * BPE and WordPiece — the spaced-form rewrite, the double-space
    * delimiter invariant, early exhaustion, and the checkpoint
    * discipline are identical. Log rows: (step, pair, merged, count,
    * selection key). */
  private def mergeLoop(spark: SparkSession, dir: String,
      pick: DataFrame => Array[org.apache.spark.sql.Row])
      : (DataFrame, Seq[(Int, String, String, Long, Long)]) = {
    val words = Tables.documents(spark, dir)
      .select(explode(TextFunctions.tokenize(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(
        concat(regexp_replace(col("tok"), "(.)", "$1  "), lit("_")).as("w"),
        col("cnt"))
    var cur = words.localCheckpoint(true) // cut the lineage once; each
    // iteration below re-checkpoints so the plan stays K-independent
    val log = Seq.newBuilder[(Int, String, String, Long, Long)]
    var k = 1
    var exhausted = false
    while (k <= merges && !exhausted) {
      val best = pick(cur)
      if (best.isEmpty) {
        // a tiny vocabulary can fully merge before K steps: every word
        // is a single symbol, no pairs remain — stop, don't throw. (The
        // unrolled oracle assumes K available merges, which holds for
        // the fixtures; the generative PropertiesSpec law covers the
        // early-exhaustion corpora against the driver-side reference.)
        exhausted = true
      } else {
        val (pair, c, key) =
          (best(0).getString(0), best(0).getLong(1), best(0).getLong(2))
        val merged = pair.replace(" ", "")
        log += ((k, pair, merged, c, key))
        cur = cur.select(
          trim(regexp_replace(
            concat(lit(" "), col("w"), lit(" ")),
            lit(" " + java.util.regex.Pattern.quote(pair.replace(" ", "  ")) + " "),
            lit(" " + merged + " "))).as("w"),
          col("cnt")).localCheckpoint(true)
        k += 1
      }
    }
    (cur, log.result())
  }

  /** WordPiece merge learning — same loop, association-ratio argmax.
    * Emits the selection key so the ranking itself is hash-gated. */
  def wordpieceMerges(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    mergeLoop(spark, dir, pickByRatio)._2
      .toDF("step", "pair", "merged", "pair_count", "score_key")
      .orderBy("step")
  }

  /** The learned merge table — deterministic, hash-checkable against the
    * unrolled-CTE oracle. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    trainLoop(spark, dir)._2
      .toDF("step", "pair", "merged", "pair_count")
      .orderBy("step")
  }

  /** The subword vocabulary after all merges: explode each token's final
    * segmentation, weight by token frequency — the aggregate the APPLY
    * stage of the pipeline feeds to the embedding table. */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    trainLoop(spark, dir)._1
      .select(explode(split(col("w"), "  ")).as("subword"), col("cnt"))
      .groupBy("subword").agg(sum(col("cnt")).as("n_occurrences"))
      .orderBy("subword")

  /** Tokenizer APPLY — the encode half of the BPE pipeline (Sennrich et
    * al. 2016 §3): segment every document with the learned merges and
    * report per-doc token/subword counts plus fertility (subwords per
    * word — the standard tokenizer-quality metric).
    *
    * Scale shape: encoding does NOT re-touch tokens one merge at a time.
    * [[trainLoop]]'s fixed point already holds the final segmentation of
    * every DISTINCT token (the vocabulary — corpus-size-independent), so
    * apply is: recover (token → subword count) from the spaced forms
    * (deleting delimiters and the terminal `_` restores the original
    * token, since merges never change content) and broadcast-join the
    * exploded corpus tokens against that dictionary — one map-side join
    * + one grouped aggregation over the corpus, no iteration. At 100 TB
    * the dictionary stays Heaps-law small while the corpus pass is
    * embarrassingly parallel — the shape a production tokenizer service
    * uses (segment the vocab once, stream the corpus through it).
    *
    * Fertility is one double division rounded 4dp per doc — magnitude-
    * bounded (subwords/word ≤ max token length), AnyScale-exact. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val fixed = trainLoop(spark, dir)._1
    val flat = translate(col("w"), " ", "")
    val dict = fixed.select(
      flat.substr(lit(1), length(flat) - 1).as("tok"),
      size(split(col("w"), "  ")).cast("long").as("n_subwords"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFunctions.tokenize(col("text"))).as("tok"))
      .join(broadcast(dict), Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("n_subwords").as("n_subwords"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_tokens"), 4))
      .orderBy("doc_id")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_merges" -> (bpeMerges _),
    "bpe_vocab" -> (bpeVocab _),
    "bpe_encode" -> (bpeEncode _),
    "wordpiece_merges" -> (wordpieceMerges _))

  /** The oracle: K merge iterations unrolled as CTE stages. Stage s{k}
    * holds the spaced forms after k merges; p{k} the weighted pair
    * counts; b{k} the argmax. Identical `replace` semantics on both
    * engines make the replay exact. */
  private def stagesSql(k: Int, ratio: Boolean = false): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH toks AS (
        SELECT unnest(${TextFunctions.tokenizeSql}) AS tok FROM documents),
      w0 AS (SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY tok),
      s0 AS MATERIALIZED (SELECT regexp_replace(tok, '(.)', '\\1  ', 'g') || '_' AS w, cnt FROM w0)""")
    for (i <- 1 to k) {
      // under the ratio criterion the argmax key is the quantized
      // association floor(c*1e12/(u_a*u_b)) over the same pair counts —
      // the mirror of pickByRatio's IEEE sequence
      val bStage =
        if (ratio)
          s"""u$i AS MATERIALIZED (
        SELECT s AS sym, sum(cnt)::BIGINT AS uc
        FROM (SELECT unnest(string_split(w, '  ')) AS s, cnt FROM s${i - 1})
        GROUP BY 1),
      b$i AS MATERIALIZED (
        SELECT pair, c,
               floor((c::DOUBLE * 1000000000000) / (ua.uc * ub.uc))::BIGINT AS k
        FROM p$i JOIN u$i ua ON string_split(pair, ' ')[1] = ua.sym
                 JOIN u$i ub ON string_split(pair, ' ')[2] = ub.sym
        ORDER BY k DESC, pair ASC LIMIT 1),"""
        else
          s"b$i AS MATERIALIZED (SELECT pair, c FROM p$i ORDER BY c DESC, pair ASC LIMIT 1),"
      sb.append(s""",
      p$i AS MATERIALIZED (
        SELECT l[x] || ' ' || l[x + 1] AS pair, sum(cnt)::BIGINT AS c
        FROM (SELECT string_split(w, '  ') AS l, cnt FROM s${i - 1}),
             unnest(range(1, len(l))) t(x)
        GROUP BY 1),
      $bStage
      s$i AS MATERIALIZED (
        SELECT trim(replace(' ' || w || ' ',
                            ' ' || replace((SELECT pair FROM b$i), ' ', '  ') || ' ',
                            ' ' || replace((SELECT pair FROM b$i), ' ', '') || ' ')) AS w,
               cnt
        FROM s${i - 1})""")
    }
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    "bpe_merges" -> {
      val rows = (1 to merges).map(i =>
        s"SELECT $i AS step, pair, replace(pair, ' ', '') AS merged, c AS pair_count FROM b$i")
        .mkString("\n        UNION ALL ")
      s"""${stagesSql(merges)}
      SELECT step, pair, merged, pair_count FROM (
        $rows)
      ORDER BY step"""
    },
    "wordpiece_merges" -> {
      val rows = (1 to merges).map(i =>
        s"SELECT $i AS step, pair, replace(pair, ' ', '') AS merged, " +
          s"c AS pair_count, k AS score_key FROM b$i")
        .mkString("\n        UNION ALL ")
      s"""${stagesSql(merges, ratio = true)}
      SELECT step, pair, merged, pair_count, score_key FROM (
        $rows)
      ORDER BY step"""
    },
    "bpe_vocab" ->
      s"""${stagesSql(merges)}
      SELECT sub.subword, sum(s.cnt)::BIGINT AS n_occurrences
      FROM (SELECT w, cnt FROM s$merges) s,
           unnest(string_split(s.w, '  ')) sub(subword)
      GROUP BY 1 ORDER BY subword""",
    // encode: the same unrolled replay, then the fixed point's spaced
    // forms become the (token -> subword count) dictionary (delete the
    // delimiters + terminal '_' to recover the token) and every doc's
    // exploded tokens join it — the apply-side plan restated in SQL
    "bpe_encode" ->
      s"""${stagesSql(merges)},
      seg AS MATERIALIZED (
        SELECT substr(replace(w, ' ', ''), 1, len(replace(w, ' ', '')) - 1) AS tok,
               len(string_split(w, '  '))::BIGINT AS n_subwords
        FROM s$merges),
      dt AS (SELECT doc_id, unnest(${TextFunctions.tokenizeSql}) AS tok
             FROM documents)
      SELECT doc_id, count(*)::BIGINT AS n_tokens,
             sum(n_subwords)::BIGINT AS n_subwords,
             round(sum(n_subwords)::DOUBLE / count(*), 4) AS fertility
      FROM dt JOIN seg USING (tok)
      GROUP BY doc_id ORDER BY doc_id""")
}
