package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Emits newline-delimited JSON lines; the LAST
  * complete line is the artifact:
  * {"metric":"total","value":N,"unit":"sec","queries":{name:sec,...},"sf":dir}
  *
  * Designed so the harness ALWAYS gets a parseable line even if the
  * process is killed mid-run (r5 post-mortem: rc=124 + a 3.7k-char line
  * against a 2k stdout tail = no numbers at all):
  *   - a complete JSON line is printed after the canary, after the family
  *     builds, and after timed run 1 — a kill any time after run 1 still
  *     leaves full per-query numbers as the last line;
  *   - run 2 (the min-of-two noise absorber) is deadline-gated per query
  *     and skipped wholesale when the budget runs out — a skipped query
  *     falls back to its run-1 time;
  *   - the `spread` diagnostic is capped at the 8 largest entries and
  *     dropped entirely (before any precision downgrade) if the line
  *     would overflow the harness's ~2000-char tail window;
  *   - log level is ERROR so post-print WARN floods can't push the JSON
  *     line out of the tail window;
  *   - a hot canary (> SPARK_GRAFT_CANARY_BAR, default 0.35 s) triggers
  *     bounded wait-and-remeasure retries before the timed runs start,
  *     so the official artifact prefers a quiet window over a degraded
  *     phase (r6 verdict: 65/77 entries carried ≥50 ms spread on a hot
  *     box); the reported canary is always the LAST measurement, the
  *     one that precedes the runs.
  *
  * Each query is timed with a noop-sink write, which executes the FULL
  * physical plan — `count()` would let Catalyst eliminate top-level sorts
  * and undercount the real work. A representative per-family subset is
  * warmed once on sf0.001 (JIT + codegen cache + file listing); warming
  * all 75 queries cost more wall clock than both timed runs combined and
  * was the main driver of the r5 timeout.
  */
/** The bench artifact's line renderer — separate from the main so the
  * property that decides whether a ROUND has numbers at all (the line
  * must fit the harness's ~2000-char stdout tail AND parse as JSON) is
  * pinned by BenchFormatSpec instead of discovered per round. */
private[graft] object BenchFormat {

  /** Longest line the harness tail window reliably captures. */
  val maxLineChars = 1990

  /** prev_ratio above which the line carries an explicit hot-phase
    * marker (r13 verdict item 2: the r13 official ran 1.19x its
    * committed quiet capture with near-identical io canaries — the
    * canary pair bounds gross degradation but cannot see a ~1.2x
    * phase; the committed capture itself is the reference that can). */
  val hotPhaseBar = 1.10

  /** Queries excluded from timing. `_csv` twins and the quadratic
    * `_exact` baselines re-run workloads the bench already measures
    * (exclusion is by NAME: r4's endsWith("_exact") also matched
    * dedup_exact — the production md5 dedup — and silently dropped it);
    * trending_arrivals_late is a bounded chunked-file replay (a real
    * FileStreamSource since r13) whose cost is micro-batch orchestration
    * of semantics already timed as trending_arrivals; q6_pricing_summary_sql is the SQL-API parity
    * twin of q6_pricing_summary — spark.sql lowers it to the identical
    * Catalyst plan, so timing both double-counts one workload (same
    * rationale as the _csv twins). taxi_region_hourly_stream stays
    * TIMED: its ~9 s FileStreamSource drain is real streaming-ingest
    * cost, over the r5 verdict's <1 s parity-exclusion bar. */
  // the *_sample twins (r14) are the baselines' deterministic residue
  // slices — correctness instruments for the at-scale oracle sweep
  // (their brute DuckDB oracles stay feasible at sf1 where the
  // corpus-wide ones are hours-by-construction); timing a 1/16 or 1/64
  // slice of an already-excluded baseline adds no plan structure
  val allPairsBaselines = Set("dedup_embedding_exact", "doc_embedding_exact",
    "dedup_embedding_exact_sample", "doc_embedding_exact_sample")
  // interval_join_stream, event_count_hourly_incremental (r6f) and
  // first_touch_stream (r6g) join the replay-harness set: like
  // trending_arrivals_late they are bounded replays (since r13 drained
  // through chunked FileStreamSources, no longer driver-fed
  // MemoryStreams) whose cost is micro-batch orchestration of workloads
  // the bench already times (interval_join_errors / event_count_hourly /
  // first_touch)
  // mv_hourly_rewrite (r6i) is a driver-mediated demonstration harness:
  // it registers/clears the MV around an eventCountHourly run and
  // returns collected rows — its cost is the MV build plus a workload
  // the bench already times
  // events_anomaly_stream (r6i; a chunked FileStreamSource drain since
  // r14) is a bounded replay of the timed events_anomaly workload (the
  // trending_arrivals_late rule)
  val parityHarnesses = Set("trending_arrivals_late", "q6_pricing_summary_sql",
    "interval_join_stream", "event_count_hourly_incremental",
    "first_touch_stream", "mv_hourly_rewrite", "events_anomaly_stream")

  /** The family-build metrics the bench times alongside the queries —
    * valid subsumers for [[subsumedTwins]]. */
  val buildMetrics = Set("dedup_family_build", "ppr_family_build",
    "index_build", "ann_family_build",
    // r11: the spam featurization (tokenize + one md5 per token over
    // the corpus) materialized once and read by every spam query — the
    // r6d persisted-index treatment; before, spam_apply featurized the
    // corpus twice and spam_ensemble four times
    "spam_family_build")

  /** Queries whose full workload is computed INSIDE another timed entry:
    * value_pct_approx evaluates the exact `percentile` aggregate (for
    * its rank-band contract flags) plus the sketch, so separately timing
    * value_percentiles (the exact aggregate alone) double-counts it —
    * the same double-count rationale as the `_csv` and SQL-twin
    * exclusions. inverted_index_flat's output IS the persisted index
    * artifact's content, so its workload is exactly the
    * `index_build` metric (r6). Guard: the subsuming entry must
    * stay registered (or be a build metric) or benchedNames throws. */
  val subsumedTwins = Map(
    "value_percentiles" -> "value_pct_approx",
    "inverted_index_flat" -> "index_build",
    // r14: the bounded-sample completeness twins run the parents' exact
    // pipeline (collapse-exact-first, positional FastSS join) on a 2/64
    // or 1/64 residue slice of customer — correctness instruments for
    // the at-scale oracle sweep, no plan structure the timed parent
    // lacks and a strictly smaller input
    "dedup_edit_distance_sample" -> "dedup_edit_distance",
    "dedup_edit_distance2_sample" -> "dedup_edit_distance",
    // r8: ann_ivfpq_cosine (IVFADC) is the composed flagship — the same
    // bounded sample train + literal-centroid cell probe ann_ivf_cosine
    // timed, PLUS residual encoding and the cell-routed ADC join, so
    // its plan is a strict superset of IVF-alone's; the composed entry
    // takes the timed slot and IVF-alone's filtered timing moves to
    // PLANS.md (one in, one out keeps the artifact under the
    // canary_end_sec rung)
    "ann_ivf_cosine" -> "ann_ivfpq_cosine",
    // r9: dedup_ngram_jaccard's output IS the memoized pair-graph
    // artifact the dedup_family_build metric prices (the brute shingle
    // self-join runs INSIDE the build; the query's marginal plan is an
    // artifact read + orderBy) — the inverted_index_flat -> index_build
    // precedent exactly. Its timed slot moves to dedup_jaccard_prefix,
    // the prefix-filtered candidate pipeline, which is a genuinely new
    // physical shape (df-ordered per-doc windows, prefix-key join,
    // candidate-verify semi-join) computing the same semantics
    "dedup_ngram_jaccard" -> "dedup_family_build",
    // r13: dedup_survivors runs dedupClusters VERBATIM (the CC
    // pointer-doubling loop over the memoized pair graph, the cluster-
    // size window, the orderBy) and adds one left_anti against
    // documents — dedup_clusters' whole workload is computed INSIDE the
    // timed sibling, the value_percentiles -> value_pct_approx shape
    // exactly. Its ~22 line chars fund the 78th timed entry
    // (dedup_edit_distance, the r12 post-close addition whose unfunded
    // registration shed canary_end_sec from the official line —
    // BenchFormatSpec caught it, r12 verdict item 1). Filtered timing
    // in PLANS.md.
    "dedup_clusters" -> "dedup_survivors",
    // r8: multimodal_resize is a map-only blob scan whose per-record
    // work (strided substr/ascii HOF aggregate over the media bytes) is
    // a strict SUBSET of multimodal_frame_sample's plan — the same HOF
    // kernel per frame plus a posexplode resize lacks. Precedent:
    // image_resize is excluded as subsumed by image_features for the
    // same reason (the timed sibling already prices the dominant
    // per-byte kernel). Filtered timing recorded in PLANS.md.
    "multimodal_resize" -> "multimodal_frame_sample",
    // r10: multimodal_features is the same map-only blob scan — its
    // per-record metadata+HOF aggregate is a subset of the strided-
    // substr HOF kernel multimodal_frame_sample (timed) runs per frame;
    // the multimodal_resize rationale verbatim. Its ~26 line chars fund
    // keeping canary_end_sec + canary_io_sec on the official line at 79
    // entries (filtered timing in PLANS.md)
    "multimodal_features" -> "multimodal_frame_sample",
    // r8: spam_train_shuffled is spam_train's exact physical plan (the
    // G6 repartition(1).mapPartitions sequential fold) re-run over an
    // md5-permuted document order; the delta is one bounded sort key on
    // the ~3k-doc training slice, not plan structure — the twin exists
    // to pin SGD's order-sensitivity SEMANTICALLY (oracle + SpamSpec
    // keep gating it), not to time a second identical fold. Filtered
    // timing in PLANS.md.
    "spam_train_shuffled" -> "spam_train",
    // r11: spam_apply's plan CONTAINS spam_train's entire computation
    // (train fold + rounding) plus scoring — separately timing the
    // train leg double-counts it, and its ~19 line chars fund the
    // spam_family_build metric under the canary-pinned line cap.
    // Filtered timing in PLANS.md.
    "spam_train" -> "spam_apply",
    // r10: spam_roca re-runs the timed spam_apply plan (train fold +
    // explode⋈broadcast⋈sum scoring) to get its scores; the metric tail
    // is one grouped count collapsed to the distinct-score table plus a
    // window over that bounded table — no new corpus-scale structure
    // (filtered timing in PLANS.md)
    "spam_roca" -> "spam_apply",
    // r10: ppr_topk_text re-runs the timed ppr_topk loop verbatim; its
    // marginal work is a format_string projection over the (sources×k)-
    // row result — reference-literal output fidelity, not a workload
    "ppr_topk_text" -> "ppr_topk")

  /** Queries whose PHYSICAL SHAPE is already timed by family siblings —
    * correctness stays oracle-gated in Verify like every query; the
    * timed set spends its line budget on distinct workloads (adding
    * either entry would push the line past the rung that keeps
    * canary_end_sec, the completed-vs-killed marker the r6 kill-test
    * relies on; local timings are recorded in PLANS.md):
    *  - bm25_retrieval probes the persisted index artifact five timed
    *    entries already measure (four boolean retrievals +
    *    index_term_lookup, plus the index_build metric itself); its
    *    marginal work is a |terms|-row broadcast scoring join and one
    *    grouped sum.
    *  - sample_temperature is the same map-only hash-threshold sampling
    *    scan sample_stratified times, plus a |langs|-row aggregate and
    *    broadcast.
    *  - phrase_retrieval (r6e) probes the positional artifact written by
    *    the same `index_build` the other probes gate on; its marginal
    *    work is three term-pruned scans joined on docno plus an array
    *    intersection over the matched docs' position lists.
    *  - doc_logprob_bigram (r6e) is doc_logprob's stacked-rollup shape
    *    with a wider key: same one-pass corpus aggregate, same rollup
    *    stack to a model table, same model join back and per-doc micro
    *    sum — the timed sibling already prices the plan; the bigram
    *    variant's delta is table width, not a new physical workload.
    *  - doc_chunks (r6e) is a zero-exchange map-only corpus scan with
    *    per-row array arithmetic and an explode — the physical shape
    *    text_normalize, doc_repetition, and multimodal_frame_sample
    *    already time; its delta is output fan-out, not plan structure.
    *  - pii_redact (r6f) is the same zero-exchange map-only scan shape
    *    (per-row regexp_replace/regexp_count chain — text_normalize's
    *    plan with different scalar kernels).
    *  - knn_filtered_cosine (r6e) is knn_brute_cosine's broadcast-score-
    *    rank shape with the label conjunct PRUNING candidates — strictly
    *    less work over the identical plan structure.
    *  - ann_sq_cosine (r6f) runs knn_brute_cosine's broadcast-score-rank
    *    shape twice: once over the quantized tinyint arrays (coarse),
    *    once over the 20-per-query candidate slice (rescore) — both
    *    stages' plan structure is the timed sibling's; the delta is
    *    array width, not a new physical workload (local timing in
    *    PLANS.md).
    *  - index_incremental (r6e) composes three already-timed pieces:
    *    a term-pruned probe of the persisted index (index_term_lookup's
    *    shape), a tf build over the quarter-slice batch (index_build's
    *    shape at 1/4 input), and the df window every flat-index entry
    *    carries.
    *  - events_enrich_stream (r6f) is a stateless FileStreamSource
    *    drain (ingest priced by the timed taxi_region_hourly_stream)
    *    whose per-batch content is a broadcast-join + map — the plan
    *    shape every timed dimension join already measures.
    *  - user_sessions_stream (r6e) is a second FileStreamSource drain:
    *    its ingest overhead is already priced by the timed
    *    taxi_region_hourly_stream, and its marginal content — the
    *    streaming session_window state operator — computes the batch
    *    user_sessions aggregate the timed set also measures.
    *  - dedup_spans_clean (r6e) re-runs the timed dedup_spans pipeline
    *    and adds a doc_id-keyed anti-join + one re-aggregation — its
    *    dominant cost IS the timed sibling.
    *  - dedup_best_survivor and split_leakage_safe (r6g) both re-run
    *    the timed dedup cluster pipeline (shingles → pair graph → CC,
    *    all priced by dedup_family_build + the timed dedup_survivors,
    *    which runs the CC loop verbatim since r13); their
    *    marginal work is one doc_id equi-join plus a k=1 window /
    *    a map-only hash-bucket assignment.
    *  - decontaminate_semantic (r6g) re-runs the timed
    *    dedup_embedding_cosine banded pipeline verbatim; its marginal
    *    work is a filter + per-vector argmax window over the tiny
    *    thresholded survivor set.
    *  - source_cap (r6g) is doc_quality's map-only scan (the shape
    *    lang_id/token_stats already time) joined into
    *    sample_balanced's bounded-PQ per-key top-k window shape.
    *  - first_touch (r6g) is the same bounded-PQ per-key top-1 window
    *    shape (topk_by_group / sample_balanced) over the events scan
    *    every timed event query already prices.
    *  - vocab_coverage (r6g) is wordcount's explode+groupBy tf build
    *    (the timed sibling) plus a 4096-row bounded top-k and two
    *    broadcast folds over it — constant-size marginal work.
    *  - quality_deciles (r6g) is doc_quality's map-only scan + the
    *    exact `percentile` aggregate value_percentiles already times +
    *    a broadcast threshold-bin map — no new physical workload.
    *  - conversion_funnel (r6g) is the user-keyed equi-join + grouped
    *    min shape interval_join_errors already times, folded three
    *    times over a strictly shrinking anchor frame.
    *  - events_pivot (r6g) is one conditional-aggregate pass over the
    *    events scan — q10_rollup_sets' stacked-aggregate shape with a
    *    column pivot instead of grouping sets.
    *  - user_set_ops (r6g) lowers to the distinct + left-semi/anti
    *    join shapes q8_semi_join / q12_outer_anti already time.
    *  - retention_cohorts (r6g) is first_touch's user-keyed grouped
    *    min + one user equi-join + a composite-key count — the
    *    user_sessions / interval_join shapes, with a per-week
    *    broadcast dim.
    *  - the salted twins (r6e) compute the IDENTICAL result as their base
    *    twins over the same scan+aggregate/join workload; the salting
    *    exchange they add only earns its keep under key skew the
    *    near-uniform testdata does not have, so their numbers duplicated
    *    the base twins' signal line-budget-for-line-budget (the skew
    *    mechanics stay pinned by ScaleDesignSpec's engineered-skew tests
    *    and the base/salted timings recorded in PLANS.md). */
  /** The generator-source queries have no file input at all — `rows` is
    * a fixed option, so their cost is constant along the bench's sf
    * axis and a timed entry would dilute the sf-scaling signal while
    * spending line budget the 2dp floor needs. (synth_stream_agg is
    * additionally a driver-drained memory-sink replay, the
    * parity-harness shape.) Scan semantics (partition planning,
    * filter-pruning arithmetic, column pruning, paced micro-batches)
    * are pinned by SourcesSpec and values by the range() oracle. */
  val fixedSizeSources = Set("synth_bucket_agg", "synth_stream_agg")

  /** Layout demonstrations whose evidence is the PLAN, not throughput:
    * bucketed_join's point is the absent join-side exchange and
    * partitioned_prune's the one-in-thirty partitionFilters scan — both
    * pinned by LakehouseSpec, with the layout-build cost and read-side
    * filtered timings + sf-scaling rows recorded in PLANS.md (r10). The
    * timed reads are sub-second rollups; adding them (plus a
    * lake_family_build metric) costs ~90 chars of line budget, which is
    * exactly what pushes the 82-entry line past maxLineChars and forces
    * the WHOLE artifact below the 2dp adjudication floor — the r10
    * fit-math is in BenchFormatSpec's registry test. Better: spend the
    * budget on workloads where wall-clock is the signal. */
  val planPinnedLayouts = Set("bucketed_join", "partitioned_prune",
    // r10: zorder_box_agg's evidence is the scanned-rows A/B vs the
    // scattered control (LakehouseSpec) — the read itself is a pruned
    // sub-second rollup
    "zorder_box_agg",
    // r11: the Q21 shape on the bucketed layout — the evidence is the
    // zero-exchange plan under both self-joins (LakehouseSpec pin);
    // the unbucketed q19_sole_delayer stays timed as the throughput
    // signal, and the layout twin's filtered timing lives in PLANS.md
    "q19_sole_delayer_bucketed",
    // r11: the CDC diff on the co-bucketed snapshot pair — same
    // rationale: the artifact is the exchange-free full-outer plan
    // (LakehouseSpec), values identical to snapshot_diff
    "snapshot_diff_bucketed")

  val sharedProbeTwins = Set("bm25_retrieval", "sample_temperature",
    // r6h: the four boolean retrievals probe the SAME persisted index
    // with the same term-pruned-scan + docno-intersection plan; their
    // differences (graded geo boxes in the term set, OR-chain vs
    // rare-AND selectivity) are term-set selectivity, not plan
    // structure. Two stayed timed through r13 — the base shape and the
    // OR chain — graded + rare_and moved here r6h with filtered timings
    // in PLANS.md. r14: the base postfix `(key AND value) AND (spark OR
    // stream)` already composes BOTH boolean operators over the same
    // persisted-index probe, so the OR-only chain is a strict physical
    // subset of the timed sibling (union without the intersection step);
    // it moves here too (filtered timing in PLANS.md r14) and its ~34
    // line chars fund prev_ratio + the hot marker on the official line
    // (r13 verdict item 2 — the committed-capture phase reference).
    // r15 (r14 verdict item 6): re-promotion was ATTEMPTED and the
    // BenchFormatSpec registry test rejected it — a 76-entry line with
    // all four canaries + the sf1 digest + prev_ratio aboard sheds the
    // digest at the 2dp floor, i.e. the tail window physically cannot
    // carry both. The verdict's fallback applies instead: the timed set
    // is FROZEN at the r15 roster and the line format declared FINAL —
    // BenchFormatSpec pins the freeze, and any future budget pressure
    // must be solved in the fit ladder or BENCH_LOCAL.json (the
    // canonical full-precision record), never by demoting a timed entry.
    "boolean_retrieval_graded", "boolean_retrieval_rare_and",
    "boolean_retrieval_or_chain",
    // sample_weighted (r6h) is sample_balanced's exact plan shape —
    // map-only key computation + the bounded-PQ rank-filter window —
    // with priority keys u/w instead of raw hashes; the delta is key
    // arithmetic, not plan structure (filtered timing in PLANS.md)
    "sample_weighted",
    // doc_fingerprint (r11) is the sixth timed map-only codegen'd-kernel
    // scan of documents (text_normalize, token_stats, doc_quality,
    // lang_id, doc_repetition stay timed); the delta is rolling-hash
    // arithmetic, not plan structure. Its ~23 line chars are what give
    // the four pinned canary fields headroom (filtered timing in
    // PLANS.md r11)
    "doc_fingerprint",
    "phrase_retrieval", "wordcount_salted", "q4_nation_count_salted",
    "doc_logprob_bigram", "doc_chunks", "knn_filtered_cosine",
    "ann_sq_cosine", "index_incremental", "user_sessions_stream",
    "events_enrich_stream", "dedup_spans_clean", "pii_redact",
    "dedup_best_survivor", "split_leakage_safe", "decontaminate_semantic",
    "source_cap", "first_touch", "vocab_coverage", "quality_deciles",
    "conversion_funnel", "events_pivot", "user_set_ops",
    "retention_cohorts",
    // r6i: q14_small_qty_revenue stays TIMED (fact-table agg joined back
    // to its own scan — a self-join-back workload no timed entry
    // measures). Its three siblings reuse timed plan structures:
    //  - q15_large_orders is q14's agg→join-back shape with the HAVING
    //    shrinking the build side to the heavy tail — strictly less work
    //    over the same structure, plus the TakeOrderedAndProject q7
    //    already times.
    //  - q16_disjunctive_parts is q3_part_supplier's scan⋈part join +
    //    residual filter + the single-row aggregate q1 times; its delta
    //    is expression content (the disjunction), not plan structure —
    //    the CNF-extraction behavior is pinned by RelationalSpec.
    //  - q17_wealthy_dormant composes q12_outer_anti's anti-join shape
    //    with a single-row broadcast scalar (the bounded crossJoin
    //    pattern) over the 1/400-scale customer table.
    "q15_large_orders", "q16_disjunctive_parts", "q17_wealthy_dormant",
    // r6i: snapshot_merge is q12_outer_anti's anti-join shape (the base
    // side) + a CDC-local window over the small batch + the grouped
    // rollup q4 times; key_skew_profile is two stacked hash aggregates
    // (wordcount's shape re-aggregated into a ≤64-row histogram) —
    // neither adds plan structure the timed set lacks.
    "snapshot_merge", "key_skew_profile",
    // events_anomaly is the hourly pre-aggregate every timed event query
    // prices + one WindowExec pass (q13_running_revenue's physical
    // operator; the sliding frame changes the frame spec, not the
    // operator) over a ≤|types|×|hours| table
    "events_anomaly",
    // interval_join_outer re-runs the timed interval_join_errors inner
    // pipeline and adds a left_anti on the matched keyset (the shape
    // q12_outer_anti times)
    "interval_join_outer",
    // dq_audit is two single-pass conditional aggregates (q6's multi-
    // aggregate scan shape) + the left_anti count q12 times
    "dq_audit",
    // triangle_count composes timed shapes only — distinct scans, the
    // bounded-PQ rank window (topk_by_group), equi-joins and single-row
    // aggregates; its scale content (degree orientation, O(m^1.5)
    // wedges) is a plan property, pinned in PageRankSpec. Filtered
    // timing in PLANS.md; a timed entry would also overflow the
    // 1,990-char line rung BenchFormatSpec holds.
    "triangle_count",
    // q18_cube_revenue is q10_rollup_sets' Expand+aggregate physical
    // shape with the full lattice instead of the prefix chain
    "q18_cube_revenue",
    // dedup_cluster_profile re-reads the memoized cluster artifact
    // (the CC loop the timed dedup_survivors prices since r13) and adds
    // key_skew_profile's stacked histogram aggregate over it
    "dedup_cluster_profile",
    // value_moments is a single grouped-aggregate pass over the events
    // scan — q6's multi-aggregate shape with moment buffers
    "value_moments",
    // dedup_rate_by_source is one doc_id left join against the memoized
    // cluster artifact (priced by dedup_family_build + the timed
    // dedup_survivors) + a grouped conditional aggregate
    "dedup_rate_by_source",
    // r7: image_features stays TIMED (the real-codec PNG encode+decode
    // mapPartitions pass is a new physical workload — codec CPU, not
    // scan shape). image_resize re-runs that same encode+decode per
    // record and adds the stride-2 copy loop plus a second (quarter-
    // size) round trip — its dominant cost IS the timed sibling's codec
    // work over the identical plan
    "image_resize",
    // r7: the cents twins are their float originals' exact plans (same
    // joins, same rollup/cube lattices) with integer-cents revenue
    // arithmetic — the any-scale-exact alternatives the sf1 float audit
    // motivated; the delta is expression content, not plan structure
    "q9_region_rollup_cents", "q10_rollup_cents", "q18_cube_cents",
    "q16_disjunctive_cents",
    // r7: bpe_merges stays TIMED (the iterative vocabulary-sized
    // merge loop is a new workload shape — K aggregations over the
    // checkpointed word table after one corpus pass). bpe_vocab re-runs
    // that same train loop and adds one explode+groupBy over its fixed
    // point — its dominant cost IS the timed sibling's loop
    "bpe_vocab",
    // r7 (updated r8): ann_pq_cosine probes the shared codes index the
    // ann_family_build metric now prices; its marginal work is the
    // EXHAUSTIVE-ADC broadcast-score-rank shape (ann_sq's two-stage
    // structure with codebook arithmetic instead of int8 dot products)
    // that the timed ann_ivfpq_cosine runs cell-routed — the composed
    // entry is the flagship, the exhaustive baseline's filtered timing
    // lives in PLANS.md
    "ann_pq_cosine",
    // r7: mixture_plan is token_stats' map-only tokenize scan + one
    // grouped aggregate + two unpartitioned windows over a <=|langs|
    // row table — no plan structure the timed set lacks
    "mixture_plan",
    // r9: dedup_semantic_kmeans probes the SAME shared IVFADC artifacts
    // the ann_family_build metric prices (cell assignment read off the
    // index, the r8 shared-artifact discipline) and its pair stage is
    // the equi-keyed join + codegen'd cosine + threshold shape the timed
    // dedup_embedding_cosine already measures (cell id as the join key
    // instead of (table, bucket)) plus a grouped max — no plan structure
    // the timed set lacks; a timed entry would also shed canary_end_sec
    // from the artifact line (BenchFormatSpec). Filtered timing in
    // PLANS.md.
    "dedup_semantic_kmeans",
    // r9: user_sessions_stream_chunked is the multi-batch leg of the
    // user_sessions_stream drain: FileStreamSource ingest is priced by
    // the timed taxi_region_hourly_stream, the session_window state
    // operator's content is the timed user_sessions aggregate, and the
    // chunk fixture it writes first is harness scaffolding — the delta
    // vs the excluded single-batch twin is micro-batch count, not plan
    // structure (multi-batch wall/state measured at sf1 in PLANS.md)
    "user_sessions_stream_chunked",
    // r9: bpe_encode re-runs the timed bpe_merges train loop to reach
    // the segmentation fixed point; its marginal work is a vocabulary-
    // sized broadcast dictionary + one exploded equi-join + grouped
    // aggregation — wordcount's shape with a broadcast dim (filtered
    // timing in PLANS.md)
    "bpe_encode",
    // r9: retrieval_hybrid_rrf composes two shared-probe legs — the
    // bm25 index probe (itself excluded as a shared probe of the timed
    // index artifact) and a dense leg whose vector build is wordcount's
    // explode+groupBy shape lowered to TakeOrderedAndProject — and the
    // RRF fusion itself is a ≤2k-row join, corpus-size-independent by
    // construction (filtered timing in PLANS.md)
    "retrieval_hybrid_rrf",
    // r9: decontaminate's marginal plan over the shared shingle artifact
    // (priced by dedup_family_build) is a broadcast equi-join + two
    // grouped counts — the shape many timed entries already measure; its
    // timed slot moves to decontaminate_bloom, whose bitset-OR UDAF
    // build and bitwise might-contain probe scan are genuinely new
    // physical work (filtered timing in PLANS.md)
    "decontaminate",
    // r9: bigram_relfreq_stripes' physical shape (the stripes map-monoid
    // aggregate over the bigram explode) runs VERBATIM inside the timed
    // pmi_stripes, which adds only the marginal join + log tail — the
    // same one-subsumes-its-base rationale as dedup_spans_clean; the
    // pairs-vs-stripes contrast stays timed via the pmi twins and
    // bigram_relfreq_pairs (filtered timing in PLANS.md)
    "bigram_relfreq_stripes",
    // r9: quality_gopher_rules is a zero-exchange map-only corpus scan
    // with per-row string/regex kernels — the physical shape doc_quality,
    // lang_id and text_normalize already time (filtered timing in
    // PLANS.md)
    "quality_gopher_rules",
    // r10: the recall matrix re-runs already-timed (or deliberately
    // subsumed) search plans verbatim; each delta is a left join of two
    // k×nQueries result tables — metadata scale (filtered timings in
    // PLANS.md)
    "ann_recall_ivf", "ann_recall_lsh", "ann_recall_pq", "ann_recall_ivfpq",
    // r10: minhash_jaccard_err re-runs the signature aggregate shape the
    // timed dedup_minhash_lsh prices (64 mins per doc over the shared
    // shingle artifact) plus a join against the bounded pair graph
    // (priced by dedup_family_build); filtered timing in PLANS.md
    "minhash_jaccard_err",
    // r10: q19_sole_delayer's semi and anti exchange shapes are priced
    // by the timed q8_semi_join and q12_outer_anti; its delta — both
    // probes being the fact table itself — is one extra exchange of the
    // deduplicated (order, supplier) pairs. 79 entries also breaks the
    // 2dp-with-both-canaries line fit (BenchFormatSpec); filtered
    // timing in PLANS.md
    "q19_sole_delayer",
    // r10: snapshot_diff is one key-equi full-outer join + a CASE
    // projection over orders — the outer-join exchange shape
    // q12_outer_anti (timed) already prices on the same tables
    // (filtered timing in PLANS.md)
    "snapshot_diff",
    // r10: quality_c4_rules is the same zero-exchange map-only corpus
    // scan with codegen'd per-line kernels — the quality_gopher_rules
    // rationale verbatim (filtered timing in PLANS.md)
    "quality_c4_rules",
    // r10: quality_agreement re-runs three excluded/subsumed map-only
    // battery scans and adds two doc-keyed joins into a 4-row aggregate
    // (filtered timing in PLANS.md)
    "quality_agreement",
    // r9: scd2_history is one user-keyed exchange carrying three window
    // passes + one grouped aggregate — the gaps-and-islands WindowExec
    // shape user_sessions (islands) and q13_running_revenue (running
    // sum) already time over the same events scan (filtered timing in
    // PLANS.md)
    "scd2_history",
    // r9: events_anomaly_stream_chunked is the multi-batch leg of the
    // anomaly drain — FileStreamSource ingest priced by the timed
    // taxi_region_hourly_stream, per-batch content is the
    // flatMapGroupsWithState machine whose semantics events_anomaly
    // (timed) states in batch form; the chunk fixture is harness
    // scaffolding (the user_sessions_stream_chunked rationale exactly)
    "events_anomaly_stream_chunked",
    // r10: taxi_region_hourly_stream_chunked is the reference-cadence
    // multi-batch leg of the timed taxi_region_hourly_stream — the SAME
    // source, parse, window aggregate, and oracle; the delta is
    // maxFilesPerTrigger 60 vs 2000, i.e. 24 sequential state-store
    // rounds + complete re-emits whose cost is the replay SEMANTIC
    // (~32 s vs ~6 s, recorded in PLANS.md), not a plan structure the
    // timed set lacks,
    "taxi_region_hourly_stream_chunked",
    // r9: tfidf_top_terms probes the persisted index artifact (priced by
    // index_build + the existing probe entries), adds one doc-keyed
    // equi-join + a grouped sum, and its per-source top-k lowers to the
    // same bounded-PQ exec topk_by_group times (filtered timing in
    // PLANS.md)
    "tfidf_top_terms",
    // r9: shard_manifest is wordcount's tokenize scan + one grouped
    // aggregate into an 8-row table + a single-row broadcast share —
    // no plan structure the timed set lacks (filtered timing in
    // PLANS.md)
    "shard_manifest",
    // r9: jsonl_roundtrip's parse kernel (Jackson over text rows) is
    // priced by the timed events_json_extract; its delta is source
    // plumbing (schema'd read, pruned parsing) pinned by spec, and the
    // write half is the same distributed text write graft-filesink's
    // timed paths exercise (filtered timing in PLANS.md)
    "jsonl_roundtrip",
    // r9: taxi_compaction_plan's cost IS the 1,440-file text scan the
    // timed taxi_region_hourly already prices; its marginal work is a
    // grouped count plus windows over a file-count-sized (metadata
    // scale) table (filtered timing in PLANS.md)
    "taxi_compaction_plan",
    // r9: dedup_containment re-runs the capped shingle self-join +
    // grouped count that dedup_family_build's pair-graph stage prices,
    // with an orientation union + threshold filter as the delta;
    // dup_ngram_coverage is two stacked aggregates over the shared
    // shingle artifact — key_skew_profile's shape (filtered timings in
    // PLANS.md)
    "dedup_containment", "dup_ngram_coverage",
    // r9: wordpiece_merges runs the timed bpe_merges loop verbatim with
    // a different argmax key (one extra vocabulary-sized unigram agg +
    // two joins per iteration) — the physical workload is the timed
    // sibling's (filtered timing in PLANS.md)
    "wordpiece_merges",
    // r13: dedup_edit_distance2 is the timed dedup_edit_distance's
    // physical shape (collapse-exact-first → kernel explode → variant
    // equi-join → verify → distinct → profile expansion) at radius 2 —
    // the delta is neighborhood size, data volume through the same
    // shape (since r14, the per-class leg decomposition with the
    // positional sub-sub kernel). Registered EXCLUDED from day one: the
    // unfunded 78th entry is exactly what shed the r12 canary fields
    // (filtered timings in PLANS.md: r14 sf0.1 10.63 / sf1 10.58 /
    // sf3 12.10 s)
    "dedup_edit_distance2",
    // r13: ppr_topk_log composes two TIMED physical shapes — the
    // one-exchange-per-iteration PPR loop ppr_topk runs verbatim (same
    // graph, same checkpoint cadence, same top-k window) and the
    // custom logsumexp aggregate logsumexp_by_group times standalone;
    // the delta is aggregation arithmetic (log-domain), the cents-twin
    // precedent exactly. Its ~20 line chars fund the sf1 digest fields
    // on the official line (r12 verdict item 5). Filtered timing in
    // PLANS.md; correctness stays oracle-gated like every query.
    "ppr_topk_log")

  /** The timed query set for a registry — shared with BenchFormatSpec so
    * the spec pins the REAL registry's line fit: a new query that would
    * push the artifact past the tail window fails the build, not the
    * round. */
  def benchedNames(all: Iterable[String]): Seq[String] = {
    val names = all.toSet
    subsumedTwins.foreach { case (excluded, subsumer) =>
      require(names(subsumer) || buildMetrics(subsumer) || !names(excluded),
        s"$excluded is excluded as subsumed by $subsumer, which is not registered")
    }
    // every by-name exclusion must name a REGISTERED query: a typo'd or
    // stale entry would otherwise silently exclude nothing (and hide the
    // documented intent behind a no-op)
    (allPairsBaselines ++ parityHarnesses ++ subsumedTwins.keySet ++
      sharedProbeTwins ++ fixedSizeSources ++ planPinnedLayouts).foreach { n =>
      require(names(n), s"bench exclusion '$n' names no registered query")
    }
    all.toSeq
      .filterNot(n => n.endsWith("_csv") || allPairsBaselines(n) ||
        parityHarnesses(n) || subsumedTwins.contains(n) || sharedProbeTwins(n) ||
        fixedSizeSources(n) || planPinnedLayouts(n))
      .sorted
  }

  /** One JSON line. `dp` = decimal places (trailing zeros stripped),
    * `spTake` = spread entries kept (largest first), `spreadN` = the
    * TOTAL spread count (reported even when entries are dropped),
    * `canaryEnd` < 0 omits the field, `phase` tags intermediate lines.
    * Locale.ROOT because String.format honors the JVM default locale and
    * a comma-decimal locale (de_DE, fr_FR) would emit invalid JSON;
    * negative timings are the explicit -1 failure sentinel. */
  def render(results: Seq[(String, Double)], spread: Seq[(String, Double)],
             canary: Double, canaryEnd: Double, dp: Int, spTake: Int,
             spreadN: Int, phase: Option[String], sfName: String,
             canaryIo: Double = -1.0, canaryIoEnd: Double = -1.0,
             sf1Sec: Double = -1.0, sf1N: Int = -1,
             prevRatio: Double = -1.0): String = {
    def fmt(v: Double): String =
      if (v < 0) "-1"
      else {
        val s = String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
        if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
        else s
      }
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val sp = spread.sortBy { case (_, d) => -d }.take(spTake)
    val phasePart = phase.fold("")(p => s""""phase":"$p",""")
    // canary_end < 0 (not yet measured) is omitted, not printed as -1
    val endPart =
      if (canaryEnd >= 0) s""""canary_end_sec":${fmt(canaryEnd)},""" else ""
    // I/O canary (r9 verdict): O_DIRECT sweep of the 1,440-file taxi
    // dataset — the CPU canary is blind to I/O-phase degradation, which
    // inflated the r9 artifact 4.3x while reading "quiet". < 0 omitted.
    val ioPart =
      (if (canaryIo >= 0) s""""canary_io_sec":${fmt(canaryIo)},""" else "") +
      (if (canaryIoEnd >= 0) s""""canary_io_end_sec":${fmt(canaryIoEnd)},""" else "")
    // an all-dropped spread omits the empty object AND its count (r11:
    // spread_n on a spread-less line is a diagnostic the canaries
    // outrank — those ~14 chars are what keep canary_io_end_sec on the
    // official line; the full count always lives in BENCH_LOCAL.json)
    val spPart =
      if (sp.nonEmpty) s""""spread":${obj(sp)},"spread_n":$spreadN,""" else ""
    // sf1 digest (r12 verdict item 5): the official sf0.1 line carries a
    // deadline-gated sf1 subset total when the scale fixtures exist —
    // the scale point that has twice caught defects sf0.1 hid. < 0
    // omitted (fixtures absent / budget exhausted / non-official run).
    val sf1Part =
      if (sf1Sec >= 0 && sf1N >= 0) s""""sf1_sec":${fmt(sf1Sec)},"sf1_n":$sf1N,"""
      else ""
    // prev_ratio (r13 verdict item 2): this capture's common-entry total
    // over the COMMITTED quiet capture's (the prior BENCH_LOCAL.json,
    // read before it is overwritten). The canary pair bounds gross
    // degradation but was blind to r13's ~1.2x phase (io 0.72 vs 0.67,
    // both "quiet", totals 77 vs 65 s); the committed capture is the
    // reference that can see it. > hotPhaseBar carries an explicit
    // marker so an official-to-official regression adjudication starts
    // from "the box ran hot", not from a judge-side forensic re-run.
    // the marker key is deliberately terse ("hot", riding next to the
    // ratio that justifies it): the registry line sits ~1985/1990 chars
    // at the 2dp floor and a longer key is exactly what pushes the HOT
    // case — the one where the marker matters — off the line
    val prevPart =
      if (prevRatio < 0) ""
      else s""""prev_ratio":${fmt(prevRatio)},""" +
        (if (prevRatio > hotPhaseBar) s""""hot":true,""" else "")
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$phasePart""" +
      s""""canary_sec":${fmt(canary)},$endPart$ioPart$sf1Part$prevPart""" +
      s""""queries":${obj(results)},$spPart"sf":"$sfName"}"""
  }

  /** The degradation ladder: drop spread (an unbounded diagnostic — the
    * per-query numbers are the artifact; r5 lesson), then the phase tag,
    * and only then precision — 2dp is the floor a sub-second query needs
    * to be adjudicated against the baseline. All four canary fields
    * (cpu+io, start+end) outrank everything except the 2dp floor itself
    * (r11): they are what make the artifact adjudicable at all. */
  def fitLine(results: Seq[(String, Double)], spread: Seq[(String, Double)],
              canary: Double, canaryEnd: Double, phase: Option[String],
              sfName: String, canaryIo: Double = -1.0,
              canaryIoEnd: Double = -1.0, sf1Sec: Double = -1.0,
              sf1N: Int = -1, prevRatio: Double = -1.0): String = {
    // r11 (judge item 3): BOTH end canaries — cpu (completed-vs-killed
    // marker, r6) and io (quiet-through-the-run certificate, r10) — ride
    // every rung down to the 2dp/no-spread floor and are shed only
    // together at the emergency rungs. The r10 artifact proved
    // quiet-at-START only because a lone keepIoEnd=false rung sat above
    // the floor; BenchFormatSpec now pins all four fields on the real
    // registry's fitted line.
    // the sf1 digest rides every rung above the emergency ones, like the
    // four canary fields — it is sheddable only when even the 2dp
    // no-spread floor overflows (the canaries outrank it there: they
    // certify the run itself, the digest is a bonus scale point)
    val candidates = Iterator(
      (3, 8, phase, true, true, true), (3, 8, None, true, true, true),
      (3, 0, None, true, true, true), (2, 8, None, true, true, true),
      (2, 4, None, true, true, true), (2, 0, None, true, true, true),
      (2, 0, None, true, true, false),
      (2, 0, None, false, false, false), (1, 0, None, false, false, false))
      .map { case (dp, spTake, ph, keepEnd, keepIoEnd, keepSf1) =>
        // prev_ratio rides the same rungs as the sf1 digest: both are
        // adjudication bonuses that outrank spread but yield to the four
        // canary fields and the 2dp floor
        render(results, spread, canary, if (keepEnd) canaryEnd else -1.0,
          dp, spTake, spread.size, ph, sfName, canaryIo,
          if (keepIoEnd) canaryIoEnd else -1.0,
          if (keepSf1) sf1Sec else -1.0, if (keepSf1) sf1N else -1,
          if (keepSf1) prevRatio else -1.0) }
    candidates.find(_.length <= maxLineChars)
      .getOrElse(render(results, spread, canary, -1.0, 0, 0, spread.size,
        None, sfName, canaryIo))
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val procT0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // hard wall-clock budget for the WHOLE process (driver kills at an
    // unknown >8min mark; r5 overran it). 420 s + ~30 s of sbt/JVM
    // startup keeps the process under the 8-minute directive; phases
    // degrade gracefully as the budget depletes rather than letting the
    // kill erase the artifact.
    val deadlineSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "420").toDouble
    def remaining(): Double = deadlineSec - (System.nanoTime() - procT0) / 1e9
    // deployment confs (bypass-merge pin, UTC, partitions) come from the
    // ONE shared builder — see GraftSession's scaladoc
    val builder = GraftSession.baseBuilder(cpus)
      .config("spark.sql.adaptive.enabled", "true")
    // A/B hook for confs that must be set BEFORE the context exists
    // (core/shuffle confs — runtime spark.conf.set rejects them)
    sys.env.get("SPARK_GRAFT_BUILDER_CONF")
      .foreach(_.split(';').filter(_.contains('=')).foreach { kv =>
        val i = kv.indexOf('=')
        builder.config(kv.take(i).trim, kv.drop(i + 1).trim)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B hook for custom rewrites (e.g. graft.plans.TopKRewrite)
    sys.env.get("SPARK_GRAFT_EXCLUDE_RULES")
      .foreach(spark.conf.set("spark.sql.optimizer.excludedRules", _))
    // A/B hook for runtime SQL confs: "k=v;k=v" (e.g. adaptive.enabled,
    // shuffle.partitions) — local experimentation only, driver runs bare
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val i = kv.indexOf('=')
        spark.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
      })

    def exec(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // explicit failure sentinel — a broken query must not
               // read as a fast query in the JSON line
      }
    }

    // the dedup/index/PPR families memoize shared prefixes (shingle
    // table, pair graph, persisted index, pre-partitioned graph) per
    // (session, dir); clearing between runs keeps min-of-two honest —
    // run 2 must re-pay the shared build, not report a memo hit as the
    // query's cost. Within a run the first family query carries the
    // shared-prefix cost and the rest reuse it, which is the intended
    // production shape (build once, consume many).
    def clearMemos(): Unit = {
      graft.operators.Dedup.clearMemos()
      graft.operators.InvertedIndex.clearMemos()
      graft.operators.PageRank.clearMemos()
      graft.operators.Similarity.clearMemos()
      graft.operators.SpamClassifier.clearMemos()
      graft.sources.AvroQueries.clearMemos()
      graft.sources.OrcQueries.clearMemos()
      graft.sources.JsonlQueries.clearMemos()
      graft.operators.Lakehouse.clearMemos()
    }

    // exclusion rationale on BenchFormat.benchedNames.
    // SPARK_GRAFT_BENCH_FILTER (regex) narrows the set for local
    // iteration; the driver runs unfiltered. A FILTERED run can also
    // time normally-excluded queries by naming them — that is how the
    // shape-twin exclusion rationales get their PLANS.md numbers without
    // touching the official timed set (the unfiltered driver run never
    // takes this branch).
    val nameFilter = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILTER", ".*")
    val names = {
      val official = BenchFormat.benchedNames(SparkEntry.queries.keys)
        .filter(_.matches(nameFilter))
      val optedIn =
        if (nameFilter == ".*") Nil
        else SparkEntry.queries.keys.toSeq
          .filter(n => n.matches(nameFilter) && !official.contains(n))
      (official ++ optedIn).sorted
    }
    // each family's shared artifacts are timed as their OWN metric
    // (dedup_family_build / ppr_family_build) at the head of each run, so
    // family queries report marginal cost instead of whichever member
    // runs first absorbing the shared build (per-query numbers stop
    // depending on bench order). Gating is on the families' declared
    // member sets, not name prefixes.
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try { body; (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }
    val families: Seq[(String, Set[String], String => Double)] = Seq(
      ("dedup_family_build", graft.operators.Dedup.familyMembers,
        (dir: String) => timed(graft.operators.Dedup.buildFamilyArtifacts(spark, dir))),
      ("ppr_family_build", graft.operators.PageRank.familyMembers,
        (dir: String) => timed(graft.operators.PageRank.buildFamilyArtifacts(spark, dir))),
      ("index_build", graft.operators.InvertedIndex.familyMembers,
        (dir: String) => timed(graft.operators.InvertedIndex.buildFamilyArtifacts(spark, dir))),
      ("ann_family_build", graft.operators.Similarity.annFamilyMembers,
        (dir: String) => timed(graft.operators.Similarity.buildFamilyArtifacts(spark, dir))),
      ("spam_family_build", graft.operators.SpamClassifier.familyMembers,
        (dir: String) => timed(graft.operators.SpamClassifier.buildFamilyArtifacts(spark, dir))))
      .collect { case f @ (_, members, _) if names.exists(members) => f }

    // ---- JSON line emission -------------------------------------------
    // The harness reads the last ~2000 chars of stdout and parses the
    // last complete JSON line, so every emitted line must fit that
    // window. With 77 query names the full-precision line does not:
    // candidates degrade spread first (it is an unbounded diagnostic;
    // the per-query numbers are the artifact — r5 lesson), then the
    // phase tag, then precision. Trailing zeros are stripped ("1.400" →
    // "1.4" — still a JSON number) and sf is the dir basename. The final
    // line omits `phase` (being last IS the signal); intermediate lines
    // carry it so a killed run's last line is self-describing.
    // Full precision + the COMPLETE spread always goes to
    // BENCH_LOCAL.json in the cwd — the file the judge can read without
    // the stdout-tail constraint. Locale.ROOT because String.format
    // honors the JVM default locale and a comma-decimal locale (de_DE,
    // fr_FR) would emit invalid JSON.
    val sfName = new java.io.File(sfDir).getName
    // io canary values live in closure vars so every emit/writeLocal call
    // site carries them without signature churn; set before the first emit
    var ioCanarySec = -1.0
    var ioCanaryEndSec = -1.0
    // sf1 digest (r12 verdict item 5) — measured after run 2 when the
    // scale fixtures exist and budget remains; -1 = not measured
    var sf1Sec = -1.0
    var sf1N = -1
    // prev_ratio (r13 verdict item 2): common-entry total vs the
    // committed quiet capture; -1 = no prior artifact / not computed
    var prevRatio = -1.0
    def emit(phase: Option[String], results: Seq[(String, Double)],
             spread: Seq[(String, Double)], canary: Double,
             canaryEnd: Double = -1.0): Unit =
      println(BenchFormat.fitLine(results, spread, canary, canaryEnd, phase,
        sfName, ioCanarySec, ioCanaryEndSec, sf1Sec, sf1N, prevRatio))
    // the committed quiet capture's per-query timings, read BEFORE this
    // run overwrites the file: the reference prev_ratio is computed
    // against (r13 verdict item 2). Only an official full-suite sf0.1 run
    // has a committed counterpart to compare with.
    val prevQueries: Map[String, Double] =
      if (nameFilter != ".*" || sfName != "sf0.1") Map.empty
      else try {
        val p = java.nio.file.Paths.get("BENCH_LOCAL.json")
        if (!java.nio.file.Files.exists(p)) Map.empty
        else {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(java.nio.file.Files.readAllBytes(p))
          val q = node.get("queries")
          if (q == null) Map.empty
          else {
            val b = Map.newBuilder[String, Double]
            val it = q.fields()
            while (it.hasNext) {
              val e = it.next(); b += e.getKey -> e.getValue.asDouble()
            }
            b.result().filter(_._2 >= 0)
          }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] prior BENCH_LOCAL.json unreadable: $e")
        Map.empty
      }
    def writeLocal(results: Seq[(String, Double)],
                   spread: Seq[(String, Double)], canary: Double,
                   canaryEnd: Double): Unit =
      try {
        // BENCH_LOCAL.json is the CANONICAL full-suite record the judge
        // adjudicates regressions against — a filtered debug run or a
        // non-default-sf run must never replace it (r8 advice: a 3-query
        // dedup debug line sat in the committed tree as "the" bench
        // record). Filtered/off-sf runs keep their stdout line; the
        // file write is skipped loudly. r11: a full-suite sf1 run gets
        // its OWN canonical file — the round-over-round record past the
        // page-cache cliff that the sf0.1 line cannot see (r10 verdict
        // item 5) — never touching the sf0.1 artifact.
        val localFile =
          if (nameFilter == ".*" && sfName == "sf0.1") "BENCH_LOCAL.json"
          else if (nameFilter == ".*" && sfName == "sf1") "BENCH_SF1_LOCAL.json"
          else if (nameFilter == ".*" && sfName == "sf3") "BENCH_SF3_LOCAL.json"
          else {
            System.err.println(s"[bench] BENCH_LOCAL.json NOT written: " +
              s"filter='$nameFilter' sf='$sfName' is not a canonical " +
              "full-suite sf0.1 or sf1 run")
            return
          }
        // post-GC used driver heap: the measured leg under the scaling
        // table's "flat driver memory" claim (PLANS.md r7) — every
        // driver-side collect in the registry is bounded by
        // construction, so this number must not scale with sf
        System.gc()
        val rt = Runtime.getRuntime
        val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
        val line = BenchFormat.render(results, spread, canary, canaryEnd, 3,
          spread.size, spread.size, Some("final"), sfName, ioCanarySec,
          ioCanaryEndSec, sf1Sec, sf1N, prevRatio)
        val withHeap =
          line.stripSuffix("}") + s""","driver_heap_mb":$heapMb}"""
        java.nio.file.Files.write(java.nio.file.Paths.get(localFile),
          (withHeap + "\n").getBytes("UTF-8"))
      }
      catch { case e: Throwable => System.err.println(s"[bench] local dump failed: $e") }

    // ---- canary: one fixed trivial query, timed FIRST -----------------
    // distinguishes "box degraded 2-3x" from "code regressed" without a
    // judge-side re-run (r5 forensics took an hour for want of this
    // number). Warmed on sf0.001 so it measures the environment, not
    // JIT. Runs regardless of SPARK_GRAFT_BENCH_FILTER so filtered A/B
    // runs are self-calibrating against the box's phase (quiet ≈ 0.4 s
    // on this box; degraded phases read 0.8-1.4 and scale everything).
    def measureCanary(): Double = {
      exec("q1_shipdate_count", warmDir)
      exec("q1_shipdate_count", sfDir)
    }
    // ---- I/O canary (r9 verdict item 2) -------------------------------
    // The r9 official artifact was inflated 4.3x by environment I/O
    // degradation the CPU canary could not see: taxi scans read 18-26x
    // slow while the warm 1-file canary said 0.32 "quiet". This probe is
    // built to see exactly that failure mode: an O_DIRECT sweep of the
    // taxi dataset's 1,440 small files hits the DEVICE and the open-path
    // on every measurement (the page cache is bypassed, so repeats stay
    // honest), i.e. the same legs the degraded queries paid. Quiet reads
    // ~0.2-0.7 s on this box; a 20x I/O phase reads 4-14 s. Falls back
    // to buffered reads if the FS rejects O_DIRECT (still open-path
    // sensitive). Failure → -1, and the gate ignores it rather than
    // spinning on a probe that cannot succeed.
    def measureIoCanary(): Double = {
      import java.nio.file.{Files, Paths, StandardOpenOption}
      import java.nio.channels.FileChannel
      import scala.jdk.CollectionConverters._
      val t0 = System.nanoTime()
      try {
        val dir = Paths.get(graft.operators.TaxiEvents.taxiDataDir)
        val buf = java.nio.ByteBuffer
          .allocateDirect((1 << 20) + 4096).alignedSlice(4096)
        val stream = Files.list(dir)
        val files =
          try stream.iterator().asScala
            .filter(_.getFileName.toString.matches("part-.*\\.csv"))
            .toIndexedSeq
          finally stream.close()
        files.foreach { p =>
          val ch =
            try FileChannel.open(p, StandardOpenOption.READ,
              com.sun.nio.file.ExtendedOpenOption.DIRECT)
            catch { case _: Exception =>
              FileChannel.open(p, StandardOpenOption.READ) }
          // a short read means EOF under O_DIRECT (reads return whole
          // blocks until the final partial one); reading again from the
          // now-unaligned position would throw, so stop there
          try {
            var done = false
            while (!done) {
              buf.clear()
              done = ch.read(buf) < buf.capacity()
            }
          } finally ch.close()
        }
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] io canary failed: ${e.getMessage}")
          -1.0
      }
    }
    // Quiet-box gate (r6 verdict): a hot canary means every per-query
    // number is inflated by neighbor load, so rather than burn the one
    // official artifact on a degraded phase, WAIT for a quiet window —
    // bounded retries, each preceded by a pause, abandoned whenever the
    // remaining deadline approaches what the full run itself needs. The
    // line reports the LAST measurement — the one that actually precedes
    // the timed runs — never an optimistic earlier minimum; if no
    // attempt clears the bar the run proceeds anyway, honestly labeled.
    val canaryQuietBar =
      sys.env.getOrElse("SPARK_GRAFT_CANARY_BAR", "0.35").toDouble
    // quiet O_DIRECT sweep measures 0.19-0.49 s on this box; the bar is
    // ~2x the quiet band's top (r11, tightened from 1.2 on the r10
    // verdict: a bar admitting 5x the quiet reading would eventually
    // re-admit an r9-style degraded capture). Still above the
    // cold-metadata first read, far below any real I/O phase.
    val ioQuietBar =
      sys.env.getOrElse("SPARK_GRAFT_IO_CANARY_BAR", "1.0").toDouble
    // the retry loop waits for the quiet BAND's top (0.49 — the r13
    // verdict item 2 re-gate trigger), stricter than the proceed bar:
    // r13's official ran 1.19x hot at io 0.72, between band and bar, and
    // the loop let it through without even pausing. Past the retries the
    // run still proceeds under the BAR (honestly labeled via prev_ratio
    // + phase_marker) — the band only buys waiting, never a refusal.
    val ioQuietBand =
      sys.env.getOrElse("SPARK_GRAFT_IO_CANARY_BAND", "0.49").toDouble
    var canarySec = measureCanary()
    ioCanarySec = measureIoCanary()
    def quiet(): Boolean =
      canarySec <= canaryQuietBar &&
        (ioCanarySec < 0 || ioCanarySec <= ioQuietBand)
    var canaryTries = 1
    while (!quiet() && canaryTries < 6 && remaining() > 320) {
      System.err.println(
        f"[bench] canary cpu=$canarySec%.2f (bar $canaryQuietBar%.2f) " +
          f"io=$ioCanarySec%.2f (band $ioQuietBand%.2f, bar $ioQuietBar%.2f) " +
          f"(try $canaryTries) — pausing for a quiet window")
      Thread.sleep(20000)
      canarySec = measureCanary()
      ioCanarySec = measureIoCanary()
      canaryTries += 1
    }
    emit(Some("canary"), Nil, Nil, canarySec)

    // ---- warm-up: representative per-family subset, time-boxed --------
    // one query per operator family covers the shared JIT/codegen paths
    // (parquet scan, hash agg, SMJ/BHJ, window, HOF kernels, streaming
    // state store, iterative checkpoint loop) that full warming paid 75
    // queries for. Time-boxed: past the warm budget the rest are skipped
    // — a cold first timed run is absorbed by min-of-two.
    val warmSet = Seq(
      "q6_pricing_summary", "q7_top_unshipped", "q9_region_rollup",
      "q13_running_revenue", "wordcount", "pmi_pairs",
      "inverted_index_packed", "boolean_retrieval", "dedup_minhash_lsh",
      "dedup_embedding_cosine", "doc_embedding_neardup", "ppr_topk",
      "spam_ensemble", "taxi_region_hourly", "trending_arrivals",
      "ann_ivfpq_cosine", "multimodal_frame_sample", "user_sessions",
      "approx_distinct_users").filter(names.contains)
    val warmBudget = math.min(120.0, remaining() * 0.4)
    val warmT0 = System.nanoTime()
    warmSet.foreach { n =>
      if ((System.nanoTime() - warmT0) / 1e9 < warmBudget) exec(n, warmDir)
    }
    clearMemos()

    // ---- timed run 1 (always complete) + family builds ----------------
    val builds1 = families.map { case (m, _, run) => m -> run(sfDir) }
    emit(Some("builds1"), builds1, Nil, canarySec)
    // a partial line every 20 queries: on a box degraded enough that the
    // driver kills the process MID-run-1 (the r5 failure mode), the last
    // stdout line still carries most per-query numbers instead of only
    // the family builds
    val run1b = Seq.newBuilder[(String, Double)]
    var sincePartial = 0
    names.foreach { n =>
      run1b += n -> exec(n, sfDir)
      sincePartial += 1
      if (sincePartial == 20 && n != names.last) {
        emit(Some("run1_partial"), builds1 ++ run1b.result(), Nil, canarySec)
        sincePartial = 0
      }
    }
    val run1 = run1b.result().toMap
    emit(Some("run1"), builds1 ++ names.map(n => n -> run1(n)), Nil, canarySec)

    // ---- timed run 2: deadline-gated per query ------------------------
    // a query is re-run only if the budget comfortably covers its run-1
    // cost; otherwise its run-1 number stands (min-of-one). Cheap queries
    // later in alphabetical order still get their second run even when an
    // expensive one is skipped.
    clearMemos()
    def fold(a: Double, b: Double): Double =
      if (a < 0 || b < 0) -1.0 else math.min(a, b)
    val builds1m = builds1.toMap
    val builds2 = families.flatMap { case (m, _, run) =>
      val est = math.max(builds1m(m), 0.5)
      if (builds1m(m) >= 0 && remaining() > est * 2 + 15) Some(m -> run(sfDir))
      else None
    }.toMap
    val run2 = Map.newBuilder[String, Double]
    names.foreach { n =>
      val est = math.max(run1(n), 0.5)
      if (run1(n) >= 0 && remaining() > est * 2 + 15) run2 += n -> exec(n, sfDir)
    }
    val run2m = run2.result()
    val results0 = names.map { n =>
      n -> run2m.get(n).map(fold(run1(n), _)).getOrElse(run1(n))
    }
    val buildsFinal = builds1.map { case (m, b1) =>
      m -> builds2.get(m).map(fold(b1, _)).getOrElse(b1)
    }
    // per-query spread between the two runs (|t1 − t2|), reported only
    // above a 50 ms noise floor, capped at the 8 largest by emit():
    // a future regression adjudication (like r3's stripes flag) can tell
    // run-to-run noise from a real movement without a re-run. The
    // per-query numbers stay on min.
    // build metrics included (r7 verdict: dedup_family_build moved 25%
    // with no spread data in the artifact to adjudicate noise vs
    // regression — builds get the same |t1 − t2| record as queries)
    val spread = (builds1.flatMap { case (m, b1) =>
      builds2.get(m).filter(b2 => b1 >= 0 && b2 >= 0)
        .map(b2 => m -> math.abs(b1 - b2))
    } ++ names.flatMap { n =>
      run2m.get(n).filter(t2 => run1(n) >= 0 && t2 >= 0)
        .map(t2 => n -> math.abs(run1(n) - t2))
    }).filter(_._2 >= 0.05)
    // ---- official sf0.1 capture, written BEFORE the digest leg ---------
    // end canaries measured right after the timed runs they certify; the
    // official artifact and an "official"-phase stdout line land on disk
    // and stdout BEFORE any sf1 work (r13 ADVICE item 1: a badly
    // regressed sf1 digest entry — exactly the defect class the digest
    // exists to catch — could overrun the process deadline, and the
    // driver kill must never erase the official sf0.1 capture; with this
    // order the last complete stdout line already carries it).
    var canaryEndSec = exec("q1_shipdate_count", sfDir)
    ioCanaryEndSec = measureIoCanary()
    val finalResults = buildsFinal ++ results0
    // prev_ratio vs the committed quiet capture (r13 verdict item 2):
    // >= 20 common entries so a slimmed or renamed registry cannot
    // produce a ratio from a handful of incomparable rows
    val common = finalResults.filter {
      case (n, t) => t >= 0 && prevQueries.contains(n)
    }
    if (common.size >= 20) {
      val prior = common.map { case (n, _) => prevQueries(n) }.sum
      if (prior > 0) prevRatio = common.map(_._2).sum / prior
      if (prevRatio > BenchFormat.hotPhaseBar)
        System.err.println(
          f"[bench] HOT PHASE: ${common.size} common entries run " +
            f"$prevRatio%.2fx the committed quiet capture")
    }
    writeLocal(finalResults, spread, canarySec, canaryEndSec)
    emit(Some("official"), finalResults, spread, canarySec, canaryEndSec)

    // ---- sf1 digest leg (r12 verdict item 5) ---------------------------
    // the driver benches sf0.1; the scale point that has twice caught
    // defects sf0.1 hid is sf1. When the builder-generated sf1 fixtures
    // exist on the box, a fixed representative subset (heavy corpus
    // scans, the prefix-join dedup, the iterative PPR loop, a relational
    // rollup, the session window) runs ONCE — memos cleared first, each
    // family's first member absorbing its shared build: the digest is a
    // single scale probe, not a per-query adjudication (that record is
    // the canonical full-suite BENCH_SF1_LOCAL.json). Deadline-gated per
    // entry so a degraded box sheds the digest, never the official sf0.1
    // artifact; the end canaries below bracket this leg too.
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graftscale/sf1")
    val sf1Subset = Seq(
      "dedup_jaccard_prefix", "dedup_minhash_lsh", "doc_repetition",
      "token_stats", "text_normalize", "pmi_pairs", "bpe_merges",
      "inverted_index_packed", "ppr_topk", "q5_monthly_nation",
      "user_sessions", "knn_brute_cosine")
    if (nameFilter == ".*" && sfName == "sf0.1" &&
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf1Dir)) &&
        remaining() > 150) {
      clearMemos()
      val ran = Seq.newBuilder[(String, Double)]
      sf1Subset.foreach { n =>
        if (remaining() > 60) {
          val t = exec(n, sf1Dir)
          if (t >= 0) ran += n -> t
        }
      }
      clearMemos()
      val entries = ran.result()
      if (entries.nonEmpty) {
        sf1Sec = entries.map(_._2).sum
        sf1N = entries.size
        System.err.println(f"[bench] sf1 digest: $sf1N entries, $sf1Sec%.1f s")
        // per-entry detail for the round record, next to BENCH_LOCAL.json
        try java.nio.file.Files.write(
          java.nio.file.Paths.get("BENCH_SF1_DIGEST_LOCAL.json"),
          (BenchFormat.render(entries, Nil, canarySec, -1.0, 3, 0, 0,
            Some("sf1digest"), "sf1") + "\n").getBytes("UTF-8"))
        catch { case e: Throwable =>
          System.err.println(s"[bench] sf1 digest dump failed: $e") }
      }
    }

    // re-bracket: the FINAL line's end canaries also cover the digest
    // leg (max-of-observed keeps the quiet-through-the-run certificate
    // honest about everything the process actually ran), then the
    // official artifact is re-written with the sf1 fields aboard
    if (sf1N >= 0) {
      canaryEndSec = math.max(canaryEndSec, exec("q1_shipdate_count", sfDir))
      ioCanaryEndSec = math.max(ioCanaryEndSec, measureIoCanary())
    }
    writeLocal(finalResults, spread, canarySec, canaryEndSec)
    emit(None, finalResults, spread, canarySec, canaryEndSec)
    spark.stop()
  }
}
