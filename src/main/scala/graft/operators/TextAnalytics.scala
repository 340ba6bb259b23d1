package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's a0–a2 text-analytics surface over the `documents` table:
  * word count (`WordCount.java`), next-word extraction (`PerfectX.java`),
  * bigram relative frequency pairs/stripes
  * (`ComputeBigramRelativeFrequency{Pairs,Stripes}.scala`), and pairs/stripes
  * PMI (`PairsPMI.scala`, `StripesPMI.scala`).
  *
  * Design notes for scale + oracle parity:
  *  - Everything is tokenize→explode→groupBy: map-side partial aggregation
  *    is automatic (the reference hand-writes in-mapper combining,
  *    `WordCount.java:68-99`), and the only shuffles are the groupBys on
  *    word / pair keys. No driver-side collection anywhere.
  *  - The pairs-vs-stripes dichotomy from the reference (per-pair rows vs
  *    per-word maps) is preserved: pairs queries emit one row per pair;
  *    stripes queries aggregate per-word sorted "w2:value" entry strings —
  *    the map monoid (`HMapStFW.plus`) becomes collect_list + sort_array.
  *  - Relative frequencies are emitted as a RAW double division (cnt/total):
  *    a single IEEE division of two exact ints is bit-identical in Spark
  *    and DuckDB, so no rounding is needed. Transcendentals (log10 for PMI)
  *    are NOT bit-guaranteed across libm implementations, so PMI is rounded
  *    to 6dp (tie-straddle probability ~1e-10). In stripe strings doubles
  *    are encoded as floor(x·1e6) micro-units — floor of an identical
  *    double is exact, dodging printf's half-even vs Java's half-up.
  *  - The marginal-count trick the reference needs a special `(A,*)` key +
  *    custom partitioner for (`ComputeBigramRelativeFrequencyPairs.scala:
  *    62-82`) is a window sum over the w1 partition here (SURVEY A8).
  */
object TextAnalytics {

  /** Word whose successors we count — the testdata analog of PerfectX's
    * literal "perfect" (`PerfectX.java:61-72`); "data" is frequent in the
    * generated corpus. */
  val anchorWord = "data"
  val pmiThreshold = 10

  private def toks(spark: SparkSession, dir: String) =
    Tables.documents(spark, dir).select(col("doc_id"), tokenize(col("text")).as("ws"))

  /** A1: word count. */
  def wordCount(spark: SparkSession, dir: String): DataFrame =
    toks(spark, dir)
      .select(explode(col("ws")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** P8: count words that immediately follow the anchor word. */
  def nextWordCount(spark: SparkSession, dir: String): DataFrame =
    toks(spark, dir)
      .select(explode(bigrams(col("ws"))).as("bg"))
      .filter(col("bg.w1") === anchorWord)
      .select(col("bg.w2").as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("word"))

  /** A1 under key skew: two-phase salted aggregation. Word frequencies are
    * Zipfian, so a single hot word can pin one reducer; salting first
    * aggregates on (word, salt) — spreading a hot key over `salts`
    * reducers — then re-aggregates the partials on word alone. Result is
    * identical to [[wordCount]] (same oracle); only the shuffle shape
    * differs. AQE's skew handling covers joins, but aggregation skew is
    * still the query author's job at 100 TB. */
  val salts = 8
  def wordCountSalted(spark: SparkSession, dir: String): DataFrame =
    toks(spark, dir)
      .select(explode(col("ws")).as("word"), pmod(col("doc_id"), lit(salts)).as("salt"))
      .groupBy("word", "salt").agg(count(lit(1)).as("partial"))
      .groupBy("word").agg(sum("partial").as("cnt"))
      .orderBy("word")

  /** A8: bigram relative frequency, pairs form — P(w2|w1) as one row per
    * bigram. The w1-marginal is a window sum, not a second job. */
  def bigramRelFreqPairs(spark: SparkSession, dir: String): DataFrame = {
    val counts = toks(spark, dir)
      .select(explode(bigrams(col("ws"))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("relfreq",
        col("cnt").cast("double") / sum(col("cnt")).over(Window.partitionBy("w1")))
      .orderBy("w1", "w2")
  }

  /** The reference's LITERAL saved-text shape for the pairs job —
    * `ComputeBigramRelativeFrequencyPairs.scala:83` emits
    * `"((" + w1 + ", " + w2 + ") " + " " + p + ")"` (note the two
    * spaces) with `p` as raw Scala `Double.toString`. Spark's
    * double→string cast IS Java's `Double.toString`, so the line is
    * byte-identical to what the reference's `saveAsTextFile` writes;
    * TextGoldenSpec pins it against an independently-formatted
    * driver-side golden. Not oracle-registered: DuckDB's VARCHAR cast
    * uses shortest-round-trip notation, which differs from Java's in
    * exponent-threshold cases — the VALUES are already hash-gated via
    * `bigram_relfreq_pairs`; this twin carries only the text shape. */
  def bigramRelFreqPairsText(spark: SparkSession, dir: String): DataFrame =
    bigramRelFreqPairs(spark, dir)
      .select(concat(lit("(("), col("w1"), lit(", "), col("w2"), lit(")  "),
        col("relfreq").cast("string"), lit(")")).as("line"))

  /** A9: bigram relative frequency, stripes form — per w1, the stripe map
    * serialized as sorted `w2:⌊relfreq·1e6⌋` entries (exact across engines).
    * Reference: `ComputeBigramRelativeFrequencyStripes.scala:70-84`. */
  def bigramRelFreqStripes(spark: SparkSession, dir: String): DataFrame = {
    val counts = toks(spark, dir)
      .select(explode(bigrams(col("ws"))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("micros",
        floor(col("cnt").cast("double") / sum(col("cnt")).over(Window.partitionBy("w1")) * 1e6)
          .cast("long"))
      .groupBy("w1")
      .agg(
        count(lit(1)).as("stripe_size"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("w2"), col("micros")))),
            e => concat_ws(":", e.getField("w2"), e.getField("micros"))),
          ",").as("stripe"))
      .orderBy("w1")
  }

  /** The reference's LITERAL saved-text shape for the stripes job —
    * `ComputeBigramRelativeFrequencyStripes.scala:70-84` emits
    * `"(" + A + ", {" + entries.mkString(", ") + "})"` with each entry
    * `B + "=" + relfreq` as raw Scala `Double.toString` (Spark's
    * double→string cast). One deliberate canonicalization: the
    * reference's entry order is its in-memory HashMap's iteration order
    * — incidental, nondeterministic across JVMs — so this twin sorts
    * entries by B (a stable order a user diffing outputs would impose
    * anyway). Not oracle-registered for the same reason as
    * [[bigramRelFreqPairsText]]: the VALUES are hash-gated by
    * `bigram_relfreq_stripes`; TextGoldenSpec pins the shape. */
  def bigramRelFreqStripesText(spark: SparkSession, dir: String): DataFrame = {
    val counts = toks(spark, dir)
      .select(explode(bigrams(col("ws"))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("relfreq",
        col("cnt").cast("double") / sum(col("cnt")).over(Window.partitionBy("w1")))
      .groupBy("w1")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("w2"), col("relfreq")))),
          e => concat(e.getField("w2"), lit("="),
            e.getField("relfreq").cast("string"))),
        ", ").as("entries"))
      .orderBy("w1")
      .select(concat(lit("("), col("w1"), lit(", {"), col("entries"), lit("})"))
        .as("line"))
  }

  /** Pair counts for PMI: per doc, first-40-distinct tokens, all ordered
    * co-occurring pairs (`PairsPMI.scala:85`), plus per-word doc frequency
    * and the doc count — all as one DataFrame DAG (the reference runs two
    * MR jobs with an HDFS side-channel between them, SURVEY §3.2). */
  private def pmi(spark: SparkSession, dir: String): DataFrame = {
    val ws = toks(spark, dir).select(col("doc_id"), first40Distinct(col("ws")).as("ws"))
    val ex = ws.select(col("doc_id"), explode(col("ws")).as("w"))
    val wordCounts = ex.groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val nDocs = ws.agg(count(lit(1)).as("n_docs"))
    // ordered co-occurring pairs generated LOCALLY per doc (the token
    // set is distinct and ≤40, so ≤1,560 pairs/doc) by a codegen'd
    // kernel — the same multiset the earlier `ex JOIN ex ON doc_id`
    // produced, minus the join's two doc_id exchanges and sorts; the
    // only exchange left on this branch is the (w1, w2) aggregate's,
    // fed map-side. The pair splits back to columns AFTER the ≥10
    // filter, where the survivor set is tiny.
    val pairCounts = ws
      .select(explode(graft.functions.PairStrings.pair_strings(col("ws"))).as("p"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= pmiThreshold)
      .withColumn("w1", substring_index(col("p"), " ", 1))
      .withColumn("w2", substring_index(col("p"), " ", -1))
      .drop("p")
    pairCounts
      .join(broadcast(wordCounts.withColumnRenamed("w", "w1").withColumnRenamed("wc", "c1")), "w1")
      .join(broadcast(wordCounts.withColumnRenamed("w", "w2").withColumnRenamed("wc", "c2")), "w2")
      .crossJoin(broadcast(nDocs))
      .withColumn("pmi",
        log10(col("cnt").cast("double") * col("n_docs") / (col("c1").cast("double") * col("c2"))))
  }

  /** A10 pairs form: `(w1, w2, pmi, cnt)` for pairs co-occurring ≥10 times.
    * Reference golden shape: `assignment1.md` Q4 `(maine, anjou) (3.63, 12)`. */
  def pmiPairs(spark: SparkSession, dir: String): DataFrame =
    pmi(spark, dir)
      .select(col("w1"), col("w2"), round(col("pmi"), 6).as("pmi"), col("cnt"))
      .orderBy("w1", "w2")

  /** A10 stripes form: per w1, sorted `w2:⌊pmi·1e6⌋` stripe entries. */
  def pmiStripes(spark: SparkSession, dir: String): DataFrame =
    pmi(spark, dir)
      .withColumn("micros", floor(col("pmi") * 1e6).cast("long"))
      .groupBy("w1")
      .agg(
        count(lit(1)).as("stripe_size"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("w2"), col("micros")))),
            e => concat_ws(":", e.getField("w2"), e.getField("micros"))),
          ",").as("stripe"))
      .orderBy("w1")

  /** The reference's LITERAL printed tuple shape for stripes PMI —
    * `StripesPMI.scala:97-101` emits
    * `"(" + A + ", {" + entries.mkString(",") + "})"` (comma-joined, no
    * space) with each entry `B + "=(" + pmi + "," + count + ")"`.
    * Values are OUR doubles (6dp-rounded, the pmi_stripes discipline;
    * the reference computes through a `.toFloat` cast, so its digits
    * differ — the VALUES here are hash-gated by `pmi_pairs`/
    * `pmi_stripes`, this twin carries the shape). Entry order sorted by
    * B, canonicalizing the reference's incidental groupByKey order the
    * same way as [[bigramRelFreqStripesText]]. */
  def pmiStripesText(spark: SparkSession, dir: String): DataFrame =
    pmi(spark, dir)
      .withColumn("pmi6", round(col("pmi"), 6))
      .groupBy("w1")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("w2"), col("pmi6"), col("cnt")))),
          e => concat(e.getField("w2"), lit("=("),
            e.getField("pmi6").cast("string"), lit(","),
            e.getField("cnt").cast("string"), lit(")"))),
        ",").as("entries"))
      .orderBy("w1")
      .select(concat(lit("("), col("w1"), lit(", {"), col("entries"), lit("})"))
        .as("line"))

  /** Heavy-hitter support threshold φ: a bigram is a heavy hitter when
    * its occurrence count is ≥ ceil(φ·N) (N = total bigram occurrences).
    * φ structurally bounds the OUTPUT at any scale: at most ⌈1/φ⌉ ≈ 833
    * keys can each hold a φ-share of N. The floor keeps the query
    * meaningful at tiny scale factors, where ceil(φ·N) would otherwise
    * be 1 and "heavy hitter" would mean "exists". Word bigrams (not the
    * dedup 3-gram shingles) are the domain because their frequency
    * SHARES are scale-stable on this corpus — trigram shares decay with
    * N, so a fixed φ would select the empty set at the bench SF. */
  val hhPhi = 1.2e-3
  val hhMinSupport = 4L
  /** CMS accuracy: over-estimate ≤ ε·N with probability [[hhConf]].
    * ε ≪ φ (24×) so the sketch's slack cannot promote the long tail into
    * the candidate set; the sketch is ~2 MB (7 rows × 40k counters). */
  val hhEps = 5e-5
  val hhConf = 0.99
  val hhSeed = 42

  /** Word-bigram OCCURRENCES — one row per consecutive pair, not per-doc
    * distinct (frequency is the quantity of interest here, unlike
    * [[Dedup]]'s set-semantics shingles). */
  private def bigramOccurrences(spark: SparkSession, dir: String): DataFrame =
    toks(spark, dir)
      .select(explode(
        graft.functions.BigramStrings.bigram_strings(col("ws"))).as("sh"))

  /** Approximate heavy hitters over word bigrams — the Count-Min-Sketch
    * member of the sketch trio (HLL `approx_distinct_users`, KLL
    * `value_pct_approx`, CMS here; Cormode & Muthukrishnan 2005). The
    * textbook two-pass shape that survives 100 TB:
    *
    *  1. ONE corpus pass folds every bigram occurrence into a
    *     fixed-size mergeable sketch (depth×width counters, ~2 MB at
    *     [[hhEps]]) — a map-side tree aggregation, no shuffle of raw
    *     keys; `totalCount` gives N from the same pass.
    *  2. The sketch is broadcast and a map-only filter keeps rows whose
    *     ESTIMATE reaches the support threshold. CMS never
    *     under-estimates, so no true heavy hitter is lost; the only
    *     extra rows are ε-slack false positives. The exact groupBy then
    *     shuffles ONLY the surviving rows — candidates, not the corpus —
    *     and the final exact-count filter makes the output deterministic
    *     and sketch-noise-free (which is what lets DuckDB oracle it).
    *
    * The probe is a Scala UDF by necessity: it indexes a driver-built
    * sketch object, and no built-in Column expression can (same
    * justification discipline as the banded flatMap — documented,
    * measured, no declarative alternative). Hash-compared columns are
    * the exact counts; the two flags assert the sketch contract
    * (est ≥ exact structurally; est ≤ exact + ε·N at [[hhConf]]). */
  def heavyHittersCms(spark: SparkSession, dir: String): DataFrame = {
    val occ = bigramOccurrences(spark, dir)
    val cms = occ.stat.countMinSketch(col("sh"), hhEps, hhConf, hhSeed)
    val n = cms.totalCount()
    val threshold = math.max(math.ceil(hhPhi * n).toLong, hhMinSupport)
    val slack = math.ceil(hhEps * n).toLong
    val bc = spark.sparkContext.broadcast(cms)
    val estimate = udf((s: String) => bc.value.estimateCount(s))
    occ.filter(estimate(col("sh")) >= threshold)
      .groupBy("sh")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("sh").as("bigram"), col("cnt"),
        (estimate(col("sh")) >= col("cnt")).as("est_ge_exact"),
        (estimate(col("sh")) <= col("cnt") + lit(slack)).as("est_within_eps"))
      .orderBy(col("cnt").desc, col("bigram"))
  }

  /** Vocabulary sizes at which coverage is reported. */
  val vocabKs = Seq(256L, 1024L, 4096L)

  /** Vocabulary coverage — the tokenizer-design metric: what fraction of
    * corpus token OCCURRENCES the top-K vocabulary types cover (the
    * curve that decides vocab size / OOV budget before training a
    * tokenizer). One corpus pass builds term frequencies; the top-K cut
    * is `orderBy(cnt).limit(max K)` — TakeOrderedAndProject, the
    * distributed bounded top-K, NOT a global sort — and the ranking
    * window then runs over the LIMITED set, whose maxRows the planner
    * can bound (4096 rows, one partition, provably tiny). Coverage per
    * K folds the bounded set against a 3-row literal K table; the
    * corpus-sized work is exactly wordcount's explode+groupBy. The
    * coverage division is one IEEE op on two exact longs — bit-identical
    * across engines, no rounding needed. */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tf = toks(spark, dir)
      .select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val total = tf.agg(sum(col("cnt")).as("n"))
    val top = tf.orderBy(desc("cnt"), col("w")).limit(vocabKs.max.toInt)
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("cnt"), col("w"))))
    top.join(broadcast(vocabKs.toDF("k")), col("rn") <= col("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("vocab_kept"), sum(col("cnt")).as("covered_tokens"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("vocab_kept"), col("covered_tokens"),
        col("n").as("total_tokens"),
        (col("covered_tokens").cast("double") / col("n")).as("coverage"))
      .orderBy("k")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vocab_coverage" -> (vocabCoverage _),
    "heavy_hitters_cms" -> (heavyHittersCms _),
    "wordcount" -> (wordCount _),
    "wordcount_salted" -> (wordCountSalted _),
    "next_word_count" -> (nextWordCount _),
    "bigram_relfreq_pairs" -> (bigramRelFreqPairs _),
    "bigram_relfreq_stripes" -> (bigramRelFreqStripes _),
    "pmi_pairs" -> (pmiPairs _),
    "pmi_stripes" -> (pmiStripes _))

  /** Shared tokenizer CTE fragment for the DuckDB oracles. */
  private val toksSql =
    s"""toks AS (
         SELECT doc_id,
                ${graft.functions.TextFunctions.tokenizeSql} AS ws
         FROM documents)"""

  private val bigramSql =
    s"""WITH $toksSql,
        bg AS (
          SELECT ws[i] AS w1, ws[i + 1] AS w2
          FROM toks, unnest(range(1, len(ws))) AS u(i)),
        counts AS (
          SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2)"""

  private val pmiSql =
    s"""WITH $toksSql,
        td AS (SELECT doc_id, list_distinct(ws[1:40]) AS ws FROM toks),
        ex AS (SELECT doc_id, unnest(ws) AS w FROM td),
        wc AS (SELECT w, count(*) AS wc FROM ex GROUP BY w),
        nd AS (SELECT count(*) AS n_docs FROM td),
        pc AS (
          SELECT a.w AS w1, b.w AS w2, count(*) AS cnt
          FROM ex a JOIN ex b USING (doc_id)
          WHERE a.w <> b.w
          GROUP BY a.w, b.w
          HAVING count(*) >= $pmiThreshold),
        pmi AS (
          SELECT w1, w2, cnt,
                 log10(cnt::DOUBLE * n_docs / (c1.wc::DOUBLE * c2.wc)) AS pmi
          FROM pc
          JOIN wc c1 ON pc.w1 = c1.w
          JOIN wc c2 ON pc.w2 = c2.w
          CROSS JOIN nd)"""

  val oracleSql: Map[String, String] = Map(
    // exact counts are hash-compared; TRUE flags assert the CMS contract
    // (the HLL/percentile sketch-oracle discipline). Threshold constants
    // are interpolated from the same Scala vals the Spark side uses.
    "heavy_hitters_cms" ->
      s"""WITH $toksSql,
          shq AS (
            SELECT ws[i] || ' ' || ws[i + 1] AS sh
            FROM toks, unnest(range(1, len(ws))) AS u(i)),
          tot AS (SELECT count(*) AS n FROM shq),
          cnts AS (SELECT sh, count(*) AS cnt FROM shq GROUP BY sh)
          SELECT sh AS bigram, cnt,
                 TRUE AS est_ge_exact, TRUE AS est_within_eps
          FROM cnts, tot
          WHERE cnt >= greatest(CAST(ceil($hhPhi * n) AS BIGINT), $hhMinSupport)
          ORDER BY cnt DESC, bigram""",
    // same tf build as wordcount; sum(cnt) is HUGEINT in DuckDB, cast
    // back to BIGINT; the coverage division is two exact longs
    "vocab_coverage" ->
      s"""WITH $toksSql,
          tf AS (SELECT w, count(*) AS cnt
                 FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
          tot AS (SELECT sum(cnt)::BIGINT AS n FROM tf),
          top AS (SELECT w, cnt,
                         row_number() OVER (ORDER BY cnt DESC, w) AS rn
                  FROM tf QUALIFY rn <= ${vocabKs.max}),
          ks(k) AS (VALUES ${vocabKs.map(k => s"($k::BIGINT)").mkString(", ")})
          SELECT k, count(*) AS vocab_kept,
                 sum(top.cnt)::BIGINT AS covered_tokens,
                 n AS total_tokens,
                 sum(top.cnt)::DOUBLE / n AS coverage
          FROM top JOIN ks ON top.rn <= k CROSS JOIN tot
          GROUP BY k, n ORDER BY k""",
    "wordcount" ->
      s"""WITH $toksSql
          SELECT w AS word, count(*) AS cnt
          FROM (SELECT unnest(ws) AS w FROM toks)
          GROUP BY w ORDER BY word""",
    // salted variant computes the identical result — same oracle
    "wordcount_salted" ->
      s"""WITH $toksSql
          SELECT w AS word, count(*) AS cnt
          FROM (SELECT unnest(ws) AS w FROM toks)
          GROUP BY w ORDER BY word""",
    "next_word_count" ->
      s"""$bigramSql
          SELECT w2 AS word, cnt
          FROM counts WHERE w1 = '$anchorWord'
          ORDER BY cnt DESC, word""",
    "bigram_relfreq_pairs" ->
      s"""$bigramSql
          SELECT w1, w2, cnt,
                 cnt::DOUBLE / sum(cnt) OVER (PARTITION BY w1) AS relfreq
          FROM counts ORDER BY w1, w2""",
    "bigram_relfreq_stripes" ->
      s"""$bigramSql,
          micro AS (
            SELECT w1, w2,
                   CAST(floor(cnt::DOUBLE / sum(cnt) OVER (PARTITION BY w1) * 1e6) AS BIGINT) AS micros
            FROM counts)
          SELECT w1, count(*) AS stripe_size,
                 string_agg(w2 || ':' || micros, ',' ORDER BY w2) AS stripe
          FROM micro GROUP BY w1 ORDER BY w1""",
    "pmi_pairs" ->
      s"""$pmiSql
          SELECT w1, w2, round(pmi, 6) AS pmi, cnt
          FROM pmi ORDER BY w1, w2""",
    "pmi_stripes" ->
      s"""$pmiSql
          SELECT w1, count(*) AS stripe_size,
                 string_agg(w2 || ':' || CAST(floor(pmi * 1e6) AS BIGINT), ',' ORDER BY w2) AS stripe
          FROM pmi GROUP BY w1 ORDER BY w1""")
}
