package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the remaining stages a training-data
  * pipeline runs between raw text and a training shard (extension
  * mandate, next to Dedup/TextQuality/DocEmbedding):
  *
  *  - `sample_stratified`: deterministic per-language downsampling by
  *    hash threshold — the standard "md5(id) mod 1000 < rate" corpus
  *    sampling. Map-only, no shuffle, resample-stable (re-runs keep the
  *    same rows), and language mix is controlled by one rate table.
  *  - `doc_repetition`: intra-document repetition signals (the Gopher /
  *    MassiveText-style duplicate-n-gram filters, Rae et al. 2021
  *    §A1.1): per-doc bigram duplicate fraction + hottest-bigram run.
  *    Entirely per-row array expressions — no shuffle at all; all
  *    ratios are exact int/int doubles.
  *  - `text_normalize`: lowercase + punctuation strip + whitespace
  *    collapse, with before/after sizes. Pure per-row expressions.
  *  - `corpus_funnel`: the end-to-end retention report — total →
  *    length-filtered → quality-filtered → exact-deduplicated →
  *    hash-sampled — as ONE query: a conditional-aggregation pass over
  *    the scan plus one dedup shuffle, stacked into (stage, n_docs)
  *    rows. At 100 TB this is the shape of a daily curation audit: two
  *    jobs, no driver-side counting loop.
  *
  * Everything is md5-keyed (cross-engine exact) and fully
  * oracle-checked.
  */
object CorpusPipeline {

  /** Per-mille keep rates per language stratum (fixed rate table). */
  val sampleRates: Seq[(String, Int)] =
    Seq("en" -> 500, "de" -> 300, "es" -> 300, "fr" -> 300, "zh" -> 200)
  val defaultRate = 100

  /** Flat per-mille rate for the funnel's final sampling stage. */
  val funnelRate = 300
  val funnelMinChars = 200
  val funnelMinQuality = 0.5

  private def docs(spark: SparkSession, dir: String) =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
        tokenize(col("text")).as("ws"))

  /** Hash bucket in [0, 1000): the sampling coordinate. 15 hex chars of
    * md5 over the decimal doc_id — uniform, deterministic, identical in
    * SQL. */
  private def bucket(c: org.apache.spark.sql.Column) =
    pmod(md5Int(c.cast("string"), 15), lit(1000L))

  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val rate = sampleRates.foldRight(lit(defaultRate)) { case ((l, r), e) =>
      when(col("lang") === l, lit(r)).otherwise(e)
    }
    docs(spark, dir)
      .withColumn("bucket", bucket(col("doc_id")))
      .withColumn("rate_permille", rate.cast("long"))
      .filter(col("bucket") < col("rate_permille"))
      .select("doc_id", "lang", "bucket", "rate_permille")
      .orderBy("doc_id")
  }

  /** Shuffle-FREE by construction: a document's bigrams all live in its
    * own row, so every statistic is an array expression — explode +
    * groupBy would shuffle the full bigram volume to recompute what a
    * per-row fold already knows. max_repeat = longest run in the sorted
    * bigram array (O(n log n) per doc; fine while single docs stay
    * bounded — a multi-GB pathological doc would need the explode form).
    */
  def docRepetition(spark: SparkSession, dir: String): DataFrame = {
    // codegen'd longest-equal-run loop (graft.functions.MaxRun) over the
    // sorted bigrams — replaces an aggregate() fold whose 3-field struct
    // accumulator allocated per element through interpreted lambdas
    // (r6g; same count-equal-adjacent arithmetic, hashes unchanged)
    docs(spark, dir)
      // equivalent to filtering on a nonempty bigram array, but the
      // pushed-down predicate only re-evaluates tokenize, not the whole
      // bigram construction (Catalyst pushes filters through projects by
      // re-inlining their expressions)
      .filter(size(col("ws")) >= 2)
      // codegen'd pair-string loop (graft.functions.BigramStrings) — the
      // transform(zip_with(...), concat_ws) form paid two interpreted
      // HOFs + a struct per pair (r6g; identical strings, hashes
      // unchanged). r14: sort ONCE and derive every statistic from the
      // sorted array — size is order-free, the distinct count is the
      // sorted array's run count (DistinctRuns; == size(array_distinct)
      // exactly, without the per-row hash set + second output array),
      // and max_repeat reads the same sorted input it always did.
      .select(col("doc_id"),
        array_sort(
          graft.functions.BigramStrings.bigram_strings(col("ws"))).as("sbg"))
      .select(
        col("doc_id"),
        size(col("sbg")).cast("long").as("n_bigrams"),
        graft.functions.DistinctRuns.distinct_runs(col("sbg")).as("n_distinct"),
        graft.functions.MaxRun.max_run(col("sbg")).as("max_repeat"))
      // exact: (bigint − bigint) / bigint on values ≪ 2^53
      .withColumn("dup_frac",
        (col("n_bigrams") - col("n_distinct")).cast("double") / col("n_bigrams"))
      .orderBy("doc_id")
  }

  /** Normalization: lowercase, strip everything outside [a-z0-9 ] and
    * explicit whitespace, collapse runs, trim. The character classes are
    * spelled out (not \\s) so Java regex and RE2 agree byte-for-byte. */
  def textNormalize(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      // one codepoint loop ≡ trim(regexp_replace(regexp_replace(lower,
      // "[^a-z0-9 \t\n\r\f]", " "), "[ \t\n\r\f]+", " ")) — the
      // single-codepoint regex pass re-entered the regex engine per
      // character (kernel scaladoc has the measured A/B); the oracle
      // still spells the regex chain and hashes identically
      .withColumn("norm_text",
        graft.functions.NormalizeKernels.join_alnum_runs(lower(col("text"))))
      .select(
        col("doc_id"),
        length(col("text")).as("n_before"),
        length(col("norm_text")).as("n_after"),
        col("norm_text"))
      .orderBy("doc_id")

  def corpusFunnel(spark: SparkSession, dir: String): DataFrame = {
    // quality is a pure per-row function of (ws, n_chars), so it is
    // computed INSIDE the one scan (TextQuality.qualityCol — the exact
    // expression docQuality's column chain collapses to) instead of
    // joining docQuality back by doc_id: the join paid a second full
    // tokenize scan plus a doc_id exchange of both branches (r14,
    // guide §2.4). docQuality emits one row per doc unconditionally, so
    // the removed inner join never filtered anything.
    val j = docs(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        md5(array_join(col("ws"), " ")).as("sig"),
        TextQuality.qualityCol(col("ws"), col("n_chars")).as("quality"))
    val keep = col("n_chars") >= funnelMinChars && col("quality") >= funnelMinQuality
    // one pass for the row-level stages (conditional aggregation) ...
    val flat = j.agg(
      count(lit(1)).as("total"),
      count(when(col("n_chars") >= funnelMinChars, 1)).as("nonshort"),
      count(when(keep, 1)).as("good"))
    // ... one dedup shuffle for the set-level stages; the survivor is the
    // min doc_id per signature, sampled on ITS hash bucket
    val reps = j.filter(keep).groupBy("sig").agg(min("doc_id").as("rep_doc"))
    val dd = reps.agg(
      count(lit(1)).as("uniq"),
      count(when(bucket(col("rep_doc")) < funnelRate, 1)).as("sampled"))
    flat.crossJoin(dd).selectExpr(
      """stack(5,
           '1_total', total,
           '2_nonshort', nonshort,
           '3_quality', good,
           '4_exact_unique', uniq,
           '5_sampled', sampled) AS (stage, n_docs)""")
      .orderBy("stage")
  }

  /** Balanced per-language sample: EXACTLY [[balancedK]] docs per
    * language (or all of them, for strata smaller than k), chosen by
    * md5-hash order — the deterministic equivalent of a uniform random
    * k-per-stratum draw, and the standard way to build an
    * equal-representation eval slice from a skewed corpus. Unlike
    * [[sampleStratified]]'s rate threshold (whose output SIZE varies
    * with the stratum), hash-rank gives exact counts. The
    * row_number-over-hash + rank filter is precisely the window shape
    * graft.plans.TopKRewrite lowers to the bounded-PQ operator: each
    * partition keeps a k-row heap per language instead of full-sorting
    * its stratum. */
  val balancedK = 50
  def sampleBalanced(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("h", md5Int(col("doc_id").cast("string"), 15))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= balancedK)
      .select("doc_id", "lang", "rk")
      .orderBy("lang", "rk")
  }

  /** Weighted sampling without replacement via sequential Poisson
    * sampling (Ohlsson 1998, the survey-sampling PPS scheme; the
    * integer-friendly cousin of Efraimidis–Espirakis reservoir keys):
    * priority key = u / w with u = (md5Int(doc_id)+1) / 2^48 ∈ (0, 1]
    * and weight w = n_chars, keep the k SMALLEST keys per language —
    * longer documents draw proportionally higher inclusion probability,
    * the standard size-weighted mixing step in training-data pipelines.
    *
    * Cross-engine exactness without the usual u^(1/w) transcendental:
    * the key is two IEEE divisions over exact inputs ((h+1) ≤ 2^48 and
    * 2^48 are both exactly representable; division is correctly
    * rounded), so DuckDB computes bit-identical keys and the oracle
    * checks the SELECTION, not a rounded shadow of it. Ties (md5
    * collisions) break on doc_id.
    *
    * Scale shape: identical to [[sampleBalanced]] — map-only key
    * computation, then the row_number-over-window + rank filter that
    * TopKRewrite lowers to the bounded-PQ operator (k-row heap per
    * partition per language, never a global sort). */
  val weightedK = 20

  def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("pk"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("pk",
        (md5Int(col("doc_id").cast("string"), 12) + 1).cast("double")
          / lit(281474976710656.0) / col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= weightedK)
      .select("doc_id", "lang", "rk")
      .orderBy("lang", "rk")
  }

  /** Per-source document cap — the per-domain quota pass (even a
    * deduplicated corpus over-represents hot domains; production
    * pipelines cap each domain's contribution): keep the [[sourceCapK]]
    * highest-quality documents per source, ties broken by lowest
    * doc_id. Quality is [[TextQuality.docQuality]]'s proven formula —
    * one map-only scan — joined back on doc_id.
    *
    * Scale shape: the row_number-over-(source)-window + rank filter is
    * exactly the shape graft.plans.TopKRewrite lowers to the bounded-PQ
    * operator, so a hot domain with millions of documents costs a
    * k-row heap per partition plus a k-row final merge — never a full
    * sort of the domain's documents. Source keys are Zipf-skewed by
    * nature; the bounded partial aggregation is what makes the skew
    * harmless (the partial side never emits more than k rows per key
    * per partition). */
  val sourceCapK = 10
  def sourceCap(spark: SparkSession, dir: String): DataFrame = {
    val q = TextQuality.docQuality(spark, dir).select("doc_id", "quality")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(desc("quality"), col("doc_id"))
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(q, "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= sourceCapK)
      .select("doc_id", "source", "quality", "rk")
      .orderBy("source", "rk")
  }

  /** Decile fractions for the curriculum binning. */
  val decileFracs: Seq[Double] = (1 to 9).map(_ / 10.0)

  /** Quality-decile curriculum binning — the data-mixing prerequisite:
    * assign every document to a global quality decile (bin 0 = bottom
    * 10%, bin 9 = top) WITHOUT a global sort. The scale pattern is
    * threshold-broadcast binning: one aggregate computes the nine
    * decile thresholds of the quality score, the single-row threshold
    * frame broadcasts, and bin assignment is a map-only sum of nine
    * comparisons — ntile() over a global window would serialize the
    * corpus through one partition. Thresholds and quality both round to
    * 6dp (the value_percentiles discipline), so the boundary
    * comparisons are bit-identical across engines; a doc equal to a
    * threshold lands in the upper bin on both. The exact `percentile`
    * aggregate stands in for the production path's approx sketch
    * (value_pct_approx demonstrates that rank-band contract). */
  def qualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    val q = TextQuality.docQuality(spark, dir).select(col("doc_id"), col("quality"))
    val thr = q.agg(
      expr(s"percentile(quality, array(${decileFracs.mkString(", ")}))").as("t"))
      .select(decileFracs.indices.map(i =>
        round(element_at(col("t"), i + 1), 6).as(s"t$i")): _*)
    q.crossJoin(broadcast(thr))
      .withColumn("bin",
        decileFracs.indices.map(i =>
          when(col("quality") >= col(s"t$i"), 1).otherwise(0)).reduce(_ + _))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
      .orderBy("bin")
  }

  /** Sequence packing — the training-batch construction step: assign
    * documents to fixed token-budget packs (context windows) by running
    * token count, emitting each doc's pack id and its token offset
    * inside the pack. Deterministic rule: docs in doc_id order within a
    * language shard; a doc starts at the running total of its
    * predecessors and belongs to pack floor(offset / budget) — the
    * greedy concat-then-chunk packing used when sequences are joined
    * with separators and split at context boundaries. The prefix sum is
    * windowed PER SHARD (lang), so packing parallelizes across shards —
    * a single global window would serialize the corpus through one
    * partition; at 100 TB the shard key is (lang, shard_date, ...) and
    * each shard's window stays partition-sized. All-integer arithmetic. */
  val packBudget = 2048
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs(spark, dir)
      .select(col("doc_id"), col("lang"), size(col("ws")).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      // floor(int/int in doubles) is exact here: cum ≪ 2^53 and a
      // non-divisible quotient sits ≥ 1/budget from any integer
      .withColumn("pack_id", floor(col("cum_before").cast("double") / packBudget))
      .withColumn("pack_offset", col("cum_before") - col("pack_id") * packBudget)
      .select("doc_id", "lang", "n_tokens", "pack_id", "pack_offset")
      .orderBy("lang", "doc_id")
  }

  /** Temperature-based multilingual rebalancing (the XLM-R / mC4
    * α-sampling play, Conneau et al. 2020 §3.1): sample language l with
    * probability ∝ p_l^α (α < 1 flattens the language skew), realized as
    * a deterministic per-document hash filter whose per-language
    * acceptance rate is p_l^(α−1) normalized so the RAREST language
    * keeps everything (a filter cannot upsample) and the head languages
    * are downsampled hardest — the standard head-flattening a
    * multilingual training mix needs.
    *
    * Cross-engine exactness: `pow` is the only transcendental and gets
    * the log10 discipline (round to 6dp; the exponent α−1 is
    * interpolated from the SAME Scala constant into both engines);
    * thresholds integerize to micro-units, so the keep decision compares
    * two longs — no float at the boundary.
    *
    * Scale shape: the language histogram is a |langs|-row aggregate, the
    * threshold table arrives as a broadcast, and the pass itself is a
    * map-only 2-column scan + filter — the same shape
    * [[sampleStratified]] times, plus one tiny broadcast join. */
  val temperatureAlpha = 0.3
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val counts = base.groupBy("lang").agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("total"))
    val w = counts.crossJoin(broadcast(tot))
      .select(col("lang"),
        round(pow(col("cnt") / col("total"), lit(temperatureAlpha - 1)), 6).as("w6"))
    val wmax = w.agg(max(col("w6")).as("wmax"))
    val thr = w.crossJoin(broadcast(wmax))
      .select(col("lang"),
        round(round(col("w6") / col("wmax"), 6) * 1e6, 0).cast("long").as("thr_micro"))
    base
      .withColumn("bucket", pmod(md5Int(col("doc_id").cast("string"), 15), lit(1000000L)))
      .join(broadcast(thr), "lang")
      .filter(col("bucket") < col("thr_micro"))
      .select("doc_id", "lang", "bucket", "thr_micro")
      .orderBy("doc_id")
  }

  /** Output sharding — the write side of the curation pipeline: land the
    * corpus partitioned by language, the lake layout that lets every
    * downstream per-language job (sampling, per-lang dedup, shard
    * packing) prune whole directories instead of scanning the corpus.
    * Hive-style `lang=<v>/` partitions carry the column in the path, so
    * a `lang = 'en'` filter becomes a PartitionFilter — zero data files
    * of other languages are even listed. Side-effecting, so test-gated
    * (CorpusPipelineSpec asserts pruning + per-shard row fidelity)
    * rather than registered. */
  def writeLanguageShards(spark: SparkSession, dir: String, outPath: String): Unit =
    Tables.documents(spark, dir)
      // cluster by the partition column first: without it every upstream
      // task emits one file per language it happens to contain (P×L
      // small files); clustered, each language lands in ~one writer
      .repartition(col("lang"))
      .write.partitionBy("lang").mode("overwrite").parquet(outPath)

  /** Context-window chunking: [[chunkSize]]-token windows advancing by
    * [[chunkStride]] (so consecutive chunks overlap by size − stride
    * tokens — the standard sliding-window prep for a fixed-context
    * model). The last chunk may be short; a window that would add no
    * new tokens is not emitted (chunk count = 1 + ⌈(n − size)/stride⌉,
    * floored at 1). */
  val chunkSize = 16
  val chunkStride = 12

  /** Split every document into overlapping token windows — the
    * context-window chunking stage that precedes packing in a training
    * pipeline (long docs must become model-context-sized pieces BEFORE
    * [[packSequences]] bins them). Pure per-row array arithmetic:
    * chunk indices come from an integer-division count, windows are
    * `slice`s of the token array — a map-only plan whose only exchange
    * is the presentation ORDER BY's range partition, at any corpus size
    * (the explode multiplies rows ~n/stride-fold, which is the output's
    * actual size, not shuffle pressure). */
  def docChunks(spark: SparkSession, dir: String): DataFrame = {
    val (k, s) = (chunkSize, chunkStride)
    docs(spark, dir)
      .select(col("doc_id"), col("ws"), size(col("ws")).as("n"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"), col("ws"),
        explode(sequence(lit(0),
          expr(s"greatest(n - $k + $s - 1, 0) div $s"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * s).as("start_tok"),
        (least(col("chunk_idx") * s + k, col("n")) - col("chunk_idx") * s).as("n_toks"),
        array_join(slice(col("ws"), col("chunk_idx") * s + 1,
          least(col("chunk_idx") * s + k, col("n")) - col("chunk_idx") * s), " ")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Declared target mixture over languages — the data-recipe input a
    * training run fixes up front (the DoReMi / LLaMA-style mixture
    * table). Literal constants so the oracle carries the same VALUES. */
  val mixtureTargets: Seq[(String, Double)] = Seq(
    "en" -> 0.5, "zh" -> 0.2, "de" -> 0.1, "es" -> 0.1, "fr" -> 0.1)

  /** The mixture PLAN: given per-language natural token shares and the
    * declared target shares, the per-language sampling rates that hit
    * the target under a DOWNSAMPLE-ONLY discipline — rates scale so the
    * most over-demanded language samples at exactly 1.0 and nothing is
    * repeated (repetition schedules are a training-loop decision, not a
    * data-pipeline one). This is the artifact a 100 TB ingest computes
    * ONCE and every sampler downstream consumes; one corpus pass + a
    * ≤|langs| row working set (the unpartitioned windows below move at
    * most |langs| rows — bounded by the declared target list, the
    * events_resample discipline). Float shares/rates round to 6dp under
    * the registry discipline; the division sequencing matches the
    * oracle expression-for-expression. */
  def mixturePlan(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    val stats = Tables.documents(spark, dir)
      .select(col("lang"), size(tokenize(col("text"))).cast("long").as("ntok"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
    val tgt = mixtureTargets.toDF("lang", "target_share")
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    stats.join(broadcast(tgt), "lang")
      .withColumn("tot", sum(col("n_tokens")).over(all))
      .withColumn("rate_raw",
        col("target_share") / (col("n_tokens") / col("tot")))
      .withColumn("mx", max(col("rate_raw")).over(all))
      .select(
        col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("tot"), 6).as("natural_share"),
        col("target_share"),
        round(col("rate_raw") / col("mx"), 6).as("sampling_rate"),
        floor(col("n_tokens") * (col("rate_raw") / col("mx"))).cast("long")
          .as("kept_tokens"))
      .orderBy("lang")
  }

  /** Shard count for the data-loader manifest — in production, the
    * data-parallel world size (or a multiple of it). */
  val nShards = 8

  /** Training data-loader shard manifest: the deterministic doc → shard
    * assignment a distributed training job reads by (each rank opens
    * its own shard; no coordinator, no shared iterator), plus the
    * per-shard balance statistics that decide whether the assignment is
    * servable. Assignment is the seed-stable hash discipline every
    * sampler here uses (md5 over the decimal doc_id — a doc's shard
    * never changes when the corpus grows, so incremental ingest only
    * APPENDS to shards), and the manifest is one grouped aggregate:
    * docs, tokens, chars, and the token share per shard. With hash
    * assignment the expected imbalance shrinks as shards fill
    * (multinomial concentration) — the spec pins the observed token
    * imbalance under ±10% at fixture scale, and the skew column makes
    * the check a one-glance read at any scale. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .withColumn("shard_id", pmod(md5Int(col("doc_id").cast("string"), 15), lit(nShards.toLong)))
      .withColumn("n_tokens", size(col("ws")).cast("long"))
    val per = d.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tokens"))
    per.crossJoin(broadcast(tot))
      .withColumn("token_share",
        round(col("n_tokens").cast("double") / col("total_tokens"), 6))
      .select("shard_id", "n_docs", "n_tokens", "n_chars", "token_share")
      .orderBy("shard_id")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "shard_manifest" -> (shardManifest _),
    "mixture_plan" -> (mixturePlan _),
    "doc_chunks" -> (docChunks _),
    "sample_stratified" -> (sampleStratified _),
    "sample_balanced" -> (sampleBalanced _),
    "sample_weighted" -> (sampleWeighted _),
    "sample_temperature" -> (sampleTemperature _),
    "source_cap" -> (sourceCap _),
    "quality_deciles" -> (qualityDeciles _),
    "pack_sequences" -> (packSequences _),
    "doc_repetition" -> (docRepetition _),
    "text_normalize" -> (textNormalize _),
    "corpus_funnel" -> (corpusFunnel _))

  private val toksSql =
    s"""toks AS (
         SELECT doc_id, text, lang, n_chars, $tokenizeSql AS ws
         FROM documents)"""

  private def bucketSql(e: String) =
    s"(${md5IntSql(s"($e)::VARCHAR", 15)} % 1000)"

  private val mixtureTargetsSql: String =
    mixtureTargets.map { case (l, w) => s"('$l', $w)" }.mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "shard_manifest" ->
      s"""WITH d AS (
            SELECT ${md5IntSql("(doc_id)::VARCHAR", 15)} % $nShards AS shard_id,
                   len($tokenizeSql)::BIGINT AS n_tokens, n_chars
            FROM documents),
          per AS (
            SELECT shard_id, count(*) AS n_docs,
                   sum(n_tokens)::BIGINT AS n_tokens,
                   sum(n_chars)::BIGINT AS n_chars
            FROM d GROUP BY shard_id),
          tot AS (SELECT sum(n_tokens) AS total_tokens FROM per)
          SELECT shard_id, n_docs, n_tokens, n_chars,
                 round(n_tokens::DOUBLE / total_tokens, 6) AS token_share
          FROM per, tot ORDER BY shard_id""",
    "mixture_plan" ->
      s"""WITH stats AS (
            SELECT lang, count(*)::BIGINT AS n_docs,
                   sum(len($tokenizeSql))::BIGINT AS n_tokens
            FROM documents GROUP BY lang),
          tgt(lang, target_share) AS (VALUES $mixtureTargetsSql),
          j AS (
            SELECT s.lang, s.n_docs, s.n_tokens, t.target_share,
                   (SELECT sum(n_tokens) FROM stats s2
                    WHERE s2.lang IN (SELECT lang FROM tgt))::BIGINT AS tot
            FROM stats s JOIN tgt t USING (lang)),
          r AS (
            SELECT *, target_share / (n_tokens / tot::DOUBLE) AS rate_raw
            FROM j),
          m AS (SELECT max(rate_raw) AS mx FROM r)
          SELECT lang, n_docs, n_tokens,
                 round(n_tokens / tot::DOUBLE, 6) AS natural_share,
                 target_share,
                 round(rate_raw / mx, 6) AS sampling_rate,
                 floor(n_tokens * (rate_raw / mx))::BIGINT AS kept_tokens
          FROM r, m ORDER BY lang""",
    // chunk grid mirrored with the same integer arithmetic; DuckDB's
    // end-exclusive range(0, m) == Spark's inclusive sequence(0, m-1)
    "doc_chunks" ->
      s"""WITH $toksSql,
          sized AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0)
          SELECT doc_id, i AS chunk_idx, i * $chunkStride AS start_tok,
                 least(i * $chunkStride + $chunkSize, n) - i * $chunkStride AS n_toks,
                 array_to_string(
                   ws[i * $chunkStride + 1 : least(i * $chunkStride + $chunkSize, n)],
                   ' ') AS chunk_text
          FROM sized,
               unnest(range(0,
                 1 + (greatest(n - $chunkSize + $chunkStride - 1, 0) // $chunkStride)))
                 AS u(i)
          ORDER BY doc_id, chunk_idx""",
    "sample_balanced" ->
      s"""WITH h AS (
            SELECT doc_id, lang,
                   ${md5IntSql("(doc_id)::VARCHAR", 15)} AS h
            FROM documents),
          r AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
            FROM h)
          SELECT doc_id, lang, rk FROM r WHERE rk <= $balancedK
          ORDER BY lang, rk""",
    // sequential Poisson priority keys: two correctly-rounded IEEE
    // divisions over exact operands — bit-identical cross-engine, so
    // the weighted SELECTION itself is oracle-checked (no rounding)
    "sample_weighted" ->
      s"""WITH h AS (
            SELECT doc_id, lang,
                   (${md5IntSql("(doc_id)::VARCHAR", 12)} + 1)::DOUBLE
                     / 281474976710656.0 / n_chars AS pk
            FROM documents),
          r AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang ORDER BY pk, doc_id) AS rk
            FROM h)
          SELECT doc_id, lang, rk FROM r WHERE rk <= $weightedK
          ORDER BY lang, rk""",
    "pack_sequences" ->
      s"""WITH $toksSql,
          t AS (SELECT doc_id, lang, len(ws)::BIGINT AS n_tokens FROM toks),
          c AS (
            SELECT doc_id, lang, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                     AS cum_before
            FROM t),
          p AS (
            SELECT doc_id, lang, n_tokens, cum_before,
                   floor(cum_before::DOUBLE / $packBudget)::BIGINT AS pack_id
            FROM c)
          SELECT doc_id, lang, n_tokens, pack_id,
                 (cum_before - pack_id * $packBudget)::BIGINT AS pack_offset
          FROM p ORDER BY lang, doc_id""",
    "sample_stratified" ->
      s"""WITH b AS (
            SELECT doc_id, lang, ${bucketSql("doc_id")} AS bucket,
                   (CASE ${sampleRates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")}
                         ELSE $defaultRate END)::BIGINT AS rate_permille
            FROM documents)
          SELECT doc_id, lang, bucket, rate_permille
          FROM b WHERE bucket < rate_permille
          ORDER BY doc_id""",
    "sample_temperature" ->
      s"""WITH counts AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
          tot AS (SELECT sum(cnt) AS total FROM counts),
          w AS (SELECT lang, round(pow(cnt / total, ${temperatureAlpha - 1}), 6) AS w6
                FROM counts, tot),
          wm AS (SELECT max(w6) AS wmax FROM w),
          thr AS (SELECT lang, round(round(w6 / wmax, 6) * 1000000)::BIGINT AS thr_micro
                  FROM w, wm),
          b AS (SELECT doc_id, lang,
                       (${md5IntSql("(doc_id)::VARCHAR", 15)} % 1000000) AS bucket
                FROM documents)
          SELECT doc_id, lang, bucket, thr_micro
          FROM b JOIN thr USING (lang)
          WHERE bucket < thr_micro
          ORDER BY doc_id""",
    // same quality formula; thresholds via quantile_cont (linear
    // interpolation == Spark's exact `percentile`, the value_percentiles
    // discipline), bin = sum of nine >= comparisons on 6dp-rounded values
    "quality_deciles" ->
      s"""WITH $toksSql,
          q AS (
            SELECT doc_id,
                   round(least(n_chars::DOUBLE / 400.0, 1.0) * 0.4 +
                         (len(list_distinct(ws))::DOUBLE / len(ws)) * 0.4 +
                         (${TextQuality.stopCountSql}::DOUBLE / len(ws)) * 0.2, 6)
                     AS quality
            FROM toks),
          thr AS (
            SELECT ${decileFracs.zipWithIndex.map { case (f, i) =>
              s"round(quantile_cont(quality, $f), 6) AS t$i" }.mkString(",\n                   ")}
            FROM q)
          SELECT (${decileFracs.indices.map(i =>
            s"(quality >= t$i)::INT").mkString(" + ")}) AS bin,
                 count(*) AS n_docs,
                 min(quality) AS min_quality,
                 max(quality) AS max_quality
          FROM q, thr
          GROUP BY bin ORDER BY bin""",
    // the proven doc_quality formula + a per-source top-k window; ties
    // on the 6dp-rounded quality break to the lowest doc_id both sides
    "source_cap" ->
      s"""WITH $toksSql,
          q AS (
            SELECT doc_id,
                   round(least(n_chars::DOUBLE / 400.0, 1.0) * 0.4 +
                         (len(list_distinct(ws))::DOUBLE / len(ws)) * 0.4 +
                         (${TextQuality.stopCountSql}::DOUBLE / len(ws)) * 0.2, 6)
                     AS quality
            FROM toks),
          r AS (
            SELECT d.doc_id, d.source, q.quality,
                   row_number() OVER (PARTITION BY d.source
                     ORDER BY q.quality DESC, d.doc_id) AS rk
            FROM documents d JOIN q USING (doc_id))
          SELECT doc_id, source, quality, rk FROM r WHERE rk <= $sourceCapK
          ORDER BY source, rk""",
    "doc_repetition" ->
      s"""WITH $toksSql,
          b AS (
            SELECT doc_id,
                   [ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))] AS bg
            FROM toks WHERE len(ws) >= 2)
          SELECT doc_id,
                 len(bg)::BIGINT AS n_bigrams,
                 len(list_distinct(bg))::BIGINT AS n_distinct,
                 list_max(list_transform(list_distinct(bg),
                   x -> len(list_filter(bg, y -> y = x))))::BIGINT AS max_repeat,
                 (len(bg) - len(list_distinct(bg)))::DOUBLE / len(bg) AS dup_frac
          FROM b ORDER BY doc_id""",
    "text_normalize" ->
      s"""WITH n AS (
            SELECT doc_id, text,
                   trim(regexp_replace(
                     regexp_replace(lower(text), '[^a-z0-9 \\t\\n\\r\\f]', ' ', 'g'),
                     '[ \\t\\n\\r\\f]+', ' ', 'g')) AS norm_text
            FROM documents)
          SELECT doc_id, length(text) AS n_before,
                 length(norm_text) AS n_after, norm_text
          FROM n ORDER BY doc_id""",
    "corpus_funnel" ->
      s"""WITH $toksSql,
          q AS (
            SELECT doc_id,
                   round(least(n_chars::DOUBLE / 400.0, 1.0) * 0.4 +
                         (len(list_distinct(ws))::DOUBLE / len(ws)) * 0.4 +
                         (${TextQuality.stopCountSql}::DOUBLE / len(ws)) * 0.2, 6)
                     AS quality
            FROM toks),
          j AS (
            SELECT t.doc_id, t.n_chars,
                   md5(array_to_string(t.ws, ' ')) AS sig, q.quality
            FROM toks t JOIN q USING (doc_id)),
          reps AS (
            SELECT min(doc_id) AS rep_doc FROM j
            WHERE n_chars >= $funnelMinChars AND quality >= $funnelMinQuality
            GROUP BY sig)
          SELECT '1_total' AS stage, (SELECT count(*) FROM j) AS n_docs
          UNION ALL
          SELECT '2_nonshort', (SELECT count(*) FROM j WHERE n_chars >= $funnelMinChars)
          UNION ALL
          SELECT '3_quality', (SELECT count(*) FROM j
                               WHERE n_chars >= $funnelMinChars
                                 AND quality >= $funnelMinQuality)
          UNION ALL
          SELECT '4_exact_unique', (SELECT count(*) FROM reps)
          UNION ALL
          SELECT '5_sampled', (SELECT count(*) FROM reps
                               WHERE ${bucketSql("rep_doc")} < $funnelRate)
          ORDER BY stage""")
}
