package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the property that decides whether a round has bench numbers at
  * all: the emitted line must fit the harness's stdout tail window AND
  * parse as JSON (r5 shipped 93/93-green code and got `parsed:null`
  * because this held for neither). Pure string logic — no Spark. */
class BenchFormatSpec extends AnyFunSuite {

  // THE REAL REGISTRY: the names whose timings the round's artifact must
  // carry — the two family-build metrics plus every benched query. A new
  // query that pushes the line past the tail window fails HERE, at build
  // time, instead of silently costing the round its numbers (r5).
  private val names = BenchFormat.buildMetrics.toSeq.sorted ++
    BenchFormat.benchedNames(SparkEntry.queries.keys)
  // realistic magnitudes: mostly sub-10 s, a few two-digit entries (the
  // streaming taxi drain reads 17-36 s), spread on most queries
  private val rng = new scala.util.Random(7)
  private val results = names.map { n =>
    n -> (if (n.contains("stream")) rng.nextDouble() * 20 + 15
          else rng.nextDouble() * 8 + 0.1)
  }
  private val spread = names.drop(3).map(_ -> (rng.nextDouble() * 2 + 0.05))

  private def parse(line: String) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(line) // throws on malformed JSON
  }

  test("the real registry's fitted line is under the tail window and parses") {
    // the r11 shape: BOTH canaries measured (cpu + io, start + end) —
    // ALL FOUR fields must survive fitting on the real registry. The
    // r10 artifact carried no canary_io_end_sec, so it certified
    // quiet-at-start only (r10 verdict item 1); a registry that only
    // fits by shedding an end canary has outgrown the budget exactly
    // like one that loses the 2dp floor.
    // r13: the official line also carries the sf1 digest (sf1_sec/sf1_n,
    // r12 verdict item 5) — the fit must hold with BOTH end canaries AND
    // the digest aboard on the real registry
    // r14: the line also carries prev_ratio + the hot-phase marker (r13
    // verdict item 2) — the worst realistic shape (a hot capture, where
    // BOTH fields render) must still fit with everything else aboard
    val line = BenchFormat.fitLine(results, spread, 0.41, 0.52, Some("final"),
      "sf0.1", 0.23, 0.31, 123.45, 12, 1.19)
    assert(parse(line).get("canary_io_sec") != null,
      "fitting shed canary_io_sec — the I/O-degradation marker (r9)")
    assert(parse(line).get("sf1_sec") != null && parse(line).get("sf1_n") != null,
      "fitting shed the sf1 digest — the scale point the official " +
        "artifact carries since r13 (r12 verdict item 5)")
    assert(parse(line).get("prev_ratio") != null,
      "fitting shed prev_ratio — the committed-capture phase reference " +
        "(r13 verdict item 2)")
    assert(parse(line).get("hot").asBoolean(),
      "a ratio above hotPhaseBar must carry the explicit marker")
    assert(line.length <= BenchFormat.maxLineChars, s"line is ${line.length} chars")
    val node = parse(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("queries").size() == names.size,
      "every per-query number survives fitting")
    // spread_n rides WITH the spread entries now (r11): on a spread-less
    // rung its ~14 chars are what keep canary_io_end_sec aboard; the
    // full spread always lives in BENCH_LOCAL.json
    if (node.get("spread") != null)
      assert(node.get("spread_n").asInt() == spread.size)
    assert(node.get("canary_sec").asDouble() > 0)
    assert(node.get("canary_end_sec") != null,
      "fitting shed canary_end_sec — the completed-run marker (r6)")
    assert(node.get("canary_io_end_sec") != null,
      "fitting shed canary_io_end_sec — the quiet-through-the-run marker (r11)")
    assert(node.get("sf").asText() == "sf0.1")
    // precision floor: the artifact the judge grades against the baseline
    // must keep at least 2dp on the real registry — if this line fit only
    // at 1dp, it is time to slim the timed set, not to ship coarse numbers
    val it = node.get("queries").fields()
    var twoDp = 0
    while (it.hasNext) { if (it.next().getValue.asText().matches(".*\\.\\d\\d")) twoDp += 1 }
    assert(twoDp > names.size / 4,
      s"only $twoDp/${names.size} entries kept 2dp — the registry outgrew the line budget")
  }

  test("full precision never silently loses spread entries in the local dump") {
    val line = BenchFormat.render(results, spread, 0.41, 0.52, 3,
      spread.size, spread.size, Some("final"), "sf0.1")
    val node = parse(line)
    assert(node.get("spread").size() == spread.size)
    assert(node.get("phase").asText() == "final")
  }

  test("prev_ratio under the hot bar renders without the marker; unmeasured is omitted") {
    val quiet = BenchFormat.render(results.take(3), Nil, 0.4, 0.5, 3, 0, 0,
      None, "sf0.1", prevRatio = 0.94)
    val qn = parse(quiet)
    assert(qn.get("prev_ratio").asDouble() == 0.94)
    assert(qn.get("hot") == null,
      "a quiet-or-better ratio must not claim a hot phase")
    val none = BenchFormat.render(results.take(3), Nil, 0.4, 0.5, 3, 0, 0,
      None, "sf0.1")
    assert(parse(none).get("prev_ratio") == null,
      "no prior artifact -> no ratio field, not a -1 sentinel")
  }

  test("failure sentinel and unmeasured end-canary render correctly") {
    val line = BenchFormat.fitLine(
      Seq("broken_query" -> -1.0, "ok_query" -> 1.25), Nil, 0.4, -1.0, None, "sf0.01")
    val node = parse(line)
    assert(node.get("queries").get("broken_query").asInt() == -1)
    assert(node.get("value").asDouble() == 1.25, "failed query excluded from total")
    assert(node.get("canary_end_sec") == null, "unmeasured end canary is omitted")
  }

  test("comma-decimal default locale cannot corrupt the JSON") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = BenchFormat.fitLine(results.take(3), Nil, 0.41, 0.5, None, "sf0.1")
      assert(!line.replaceAll("\"[^\"]*\"", "").contains(','.toString + "5"),
        "no comma-decimal leaked outside strings")
      parse(line)
    } finally java.util.Locale.setDefault(prev)
  }

  test("tiny lines keep full precision; oversized inputs still return a line") {
    val small = BenchFormat.fitLine(Seq("q1" -> 1.234567), Nil, 0.4, -1.0, Some("run1"), "sf0.1")
    assert(small.contains("\"q1\":1.235"), small) // 3dp survives when it fits
    assert(parse(small).get("phase").asText() == "run1")
    // pathological: so many queries even 0dp overflows — a line is still
    // produced (the harness may truncate, but we never throw or hang)
    val huge = (1 to 500).map(i => s"very_long_query_name_number_$i" -> 1.0)
    val line = BenchFormat.fitLine(huge, Nil, 0.4, 0.4, None, "sf0.1")
    parse(line)
  }

  test("the timed set is frozen at the r15 roster - demotion is not a budget tool") {
    // r14 verdict item 6: the timed set shrank three rounds running
    // (78 -> 76 -> 75) to fund stdout-line fields. From r15 the roster
    // is FROZEN: the full-precision record is BENCH_LOCAL.json (the
    // file-is-canonical contract the writeLocal guard enforces); the
    // stdout line is a digest whose fit ladder sheds spread/precision,
    // never per-query entries. Growing the set (new queries) is fine;
    // any shrink below the r15 roster fails here at build time.
    // (Re-promoting boolean_retrieval_or_chain — the verdict's first
    // choice — was attempted and rejected by the registry-fit test
    // above: a 76th entry sheds the sf1 digest at the 2dp floor, so the
    // verdict's stated fallback — freeze at 75, format final — applies.)
    val timed = BenchFormat.benchedNames(SparkEntry.queries.keys).toSet
    val r15Roster = Set(
      "ann_ivfpq_cosine", "ann_lsh_cosine", "approx_distinct_users",
      "asof_last_error", "avro_roundtrip", "bigram_relfreq_pairs",
      "boolean_retrieval", "bpe_merges",
      "corpus_funnel", "decontaminate_bloom", "dedup_edit_distance",
      "dedup_embedding_cosine", "dedup_exact", "dedup_incremental",
      "dedup_jaccard_prefix", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_spans", "dedup_survivors", "doc_embedding_neardup",
      "doc_logprob", "doc_quality", "doc_repetition", "event_count_hourly",
      "event_count_sliding", "events_json_extract", "events_resample",
      "heavy_hitters_cms", "image_features", "index_term_lookup",
      "interval_join_errors", "inverted_index_packed", "knn_brute_cosine",
      "lang_id", "logsumexp_by_group", "multimodal_frame_sample",
      "next_word_count", "orc_roundtrip", "pack_sequences", "pmi_pairs",
      "pmi_stripes", "ppr_topk", "q10_rollup_sets", "q11_distinct_customers",
      "q12_outer_anti", "q13_running_revenue", "q14_small_qty_revenue",
      "q1_shipdate_count", "q2_order_priority", "q3_part_supplier",
      "q4_nation_count", "q5_monthly_nation", "q6_pricing_summary",
      "q7_top_unshipped", "q8_semi_join", "q9_region_rollup",
      "region_event_count", "sample_balanced", "sample_stratified",
      "spam_apply", "spam_ensemble", "taxi_region_hourly",
      "taxi_region_hourly_stream", "text_normalize", "token_stats",
      "topk_by_group", "trending_arrivals", "user_sessions",
      "value_pct_approx", "wordcount")
    val missing = r15Roster -- timed
    assert(missing.isEmpty, s"timed entries demoted since r15: $missing")
  }

  test("a stale or typo'd by-name exclusion fails loudly, not as a silent no-op") {
    // the real registry passes (implicitly exercised by the first test);
    // a registry missing an excluded name must throw
    val missingOne = SparkEntry.queries.keys.filterNot(_ == "bm25_retrieval")
    val e = intercept[IllegalArgumentException] {
      BenchFormat.benchedNames(missingOne)
    }
    assert(e.getMessage.contains("bm25_retrieval"))
  }
}
