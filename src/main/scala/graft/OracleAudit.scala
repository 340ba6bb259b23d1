package graft

/** Machine-checkable classification of every registered query's
  * correctness evidence — the registry-wide application of the BPE
  * lesson (round 7): an oracle that RESTATES the implementation's
  * encoding checks cross-engine parity, not semantics. The delimiter
  * bug proved it concretely — the DuckDB oracle replayed the same
  * flawed encoding and agreed; only the generative law against an
  * independently-written reference caught it.
  *
  * Classes:
  *  - [[Independent]]: the oracle SQL states the SEMANTICS declaratively
  *    (a second, independent expression of the spec — TPC-H aggregates,
  *    EXISTS-retrieval, window sessionization, brute-force kernels,
  *    closed-form pixel math, exact-answer contract flags around a
  *    sketch, or a batch-engine oracle for a streaming replay). Parity
  *    and semantics coincide because the SQL does not mirror any
  *    implementation choice that could be wrong in the same way twice.
  *  - [[ParityWithLaw]]: the oracle replays the implementation's
  *    pipeline/encoding (keyed-Lloyd CTEs, BPE merge unrolls, md5
  *    sampling thresholds, recursive-CTE SGD) — parity only — AND a
  *    generative/driver-side law against an independent reference pins
  *    the semantics (the citation names it).
  *  - [[ParityWithRecall]]: the oracle replays the pipeline and the
  *    semantic gate is a measured recall/precision bar against an
  *    exact baseline that is itself Independent-class (ANN vs
  *    knn_brute; banded near-dup vs the all-pairs kernel).
  *
  * There is deliberately NO ParityOnly constructor: the invariant this
  * registry enforces (OracleAuditSpec) is that every query whose oracle
  * replays implementation internals carries a named semantic gate. A
  * new iterative/encoded query cannot register without either an
  * independent oracle or an explicit entry here — the spec fails loudly
  * on the families it recognizes as encoded.
  */
object OracleAudit {

  sealed trait Class
  case object Independent extends Class
  case object ParityWithLaw extends Class
  case object ParityWithRecall extends Class

  /** Explicit classifications with the citation of the semantic gate.
    * Queries not listed default to Independent with the generic
    * rationale above; [[encodedPrefixes]] names the families that must
    * NOT fall through to that default. */
  val classes: Map[String, (Class, String)] = {
    val m = scala.collection.mutable.Map.empty[String, (Class, String)]

    // --- iterative / trained pipelines: parity oracle + generative law
    val bpe = "PropertiesSpec:170 driver-side reference BPE equality " +
      "(the law that caught the delimiter-consumption bug the oracle missed)"
    m += "bpe_merges" -> (ParityWithLaw, bpe)
    m += "bpe_vocab" -> (ParityWithLaw, bpe)
    m += "bpe_encode" -> (ParityWithLaw, bpe +
      "; encode leg: per-doc subword counts equal the reference's final segmentation")
    m += "wordpiece_merges" -> (ParityWithLaw,
      "PropertiesSpec:342 WordPiece law — driver-side reference with the same " +
      "quantized association key on random tie-heavy corpora")

    val ppr = "PageRankSpec:34 dense-reference equality on a literal " +
      "graph; :51 log/normal cross-domain agreement; :69 mass conservation"
    m += "ppr_topk" -> (ParityWithLaw, ppr)
    m += "ppr_topk_log" -> (ParityWithLaw, ppr)
    m += "ppr_topk_text" -> (ParityWithLaw, ppr +
      "; TextGoldenSpec pins the %.5f line against an independent " +
      "String.format golden (the text twin inherits the PPR laws for " +
      "the values)")

    m += "triangle_count" -> (ParityWithLaw,
      "PageRankSpec:88 brute set recompute; :114 adversarial degree-tie " +
      "graphs; PropertiesSpec:250 random-graph brute law")

    val sgd = "SpamSpec:41 single-pass SGD separates a separable corpus; " +
      ":51 1-ROCA% beats chance (reference G9 metric); :20/:29 " +
      "determinism + order-sensitivity pins"
    Seq("spam_train", "spam_train_shuffled", "spam_apply", "spam_ensemble")
      .foreach(q => m += q -> (ParityWithLaw, sgd))
    m += "spam_roca" -> (ParityWithLaw, sgd +
      "; SpamSpec 'spam_roca equals the driver-side tie-averaged AUC' — " +
      "independent rank-sum recompute over the scored corpus, plus the " +
      "beats-chance bar (the metric tail's own law; the score leg " +
      "inherits the SGD laws)")

    // --- connected-components family: md5/minhash/simhash encodings are
    // implementation devices; the laws are driver-side brute recomputes
    val uf = "PropertiesSpec:145 union-find law on random graphs; " +
      "DedupSpec:27 driver-side union-find over the pairs; :46 deep-chain " +
      "convergence"
    m += "dedup_clusters" -> (ParityWithLaw, uf)
    m += "dedup_survivors" -> (ParityWithLaw, uf + "; DedupSpec:257 conservation")
    m += "dedup_best_survivor" -> (ParityWithLaw, "DedupSpec:212 argmax-quality member per cluster")
    m += "dedup_rate_by_source" -> (ParityWithLaw, "DedupSpec:257 conserves documents, agrees with survivors")
    m += "dedup_cluster_profile" -> (ParityWithLaw, "DedupSpec:272 conserves the cluster table, bounds sizes")
    m += "split_leakage_safe" -> (ParityWithLaw, "DedupSpec:232 covers every doc once, never splits a cluster")
    m += "dedup_minhash_lsh" -> (ParityWithLaw, "DedupSpec:17 recovers the brute-force Jaccard near-dup pairs")
    m += "dedup_simhash" -> (ParityWithLaw, "DedupSpec:133 exactly the Hamming<=3 pairs vs brute force")
    m += "dedup_incremental" -> (ParityWithLaw, "DedupSpec:66 equals the cross-side slice of the full self-dedup")
    m += "dedup_spans" -> (ParityWithLaw,
      "DedupSpec:144 hand-built corpus exact spans; :178 every in-span window repeats, spans disjoint+maximal")
    m += "dedup_spans_clean" -> (ParityWithLaw, "DedupSpec:159 cleaned text equals a driver-side cut of the spans")
    m += "decontaminate" -> (ParityWithLaw, "DedupSpec:81 benchmark excluded, flags consistent, broadcast pinned")
    m += "decontaminate_semantic" -> (ParityWithLaw, "DedupSpec:81 discipline + the banded-kernel recall gates (SimilaritySpec:120)")
    m += "dedup_semantic_kmeans" -> (ParityWithLaw,
      "SimilaritySpec SemDeDup law: driver-side brute recompute of the upper-" +
      "triangular within-cell rule from raw vectors + the index's cells; " +
      "PropertiesSpec:287 Lloyd trainer laws pin the clustering itself")

    // --- ANN / banded similarity: parity oracle + recall vs an exact
    // baseline (knn_brute / all-pairs kernels are Independent-class)
    val lloyd = "; PropertiesSpec:287 Lloyd trainer equals an independent " +
      "reference (translation equivariance, tail-order invariance, 1-cell floor-mean)"
    m += "ann_ivf_cosine" -> (ParityWithRecall, "SimilaritySpec:25 recall vs knn_brute" + lloyd)
    m += "ann_pq_cosine" -> (ParityWithRecall, "SimilaritySpec:35 recall vs knn_brute" + lloyd)
    m += "ann_ivfpq_cosine" -> (ParityWithRecall, "SimilaritySpec:48 recall vs knn_brute" + lloyd)
    m += "ann_sq_cosine" -> (ParityWithRecall, "SimilaritySpec:131 near-exact recall vs brute")
    m += "ann_lsh_cosine" -> (ParityWithRecall, "SimilaritySpec:156 recall vs knn_brute")
    m += "dedup_embedding_cosine" -> (ParityWithRecall,
      "SimilaritySpec:120 exact precision, near-total recall vs the all-pairs kernel (dedup_embedding_exact)")
    m += "doc_embedding_neardup" -> (ParityWithRecall,
      "DocEmbeddingSpec:17 subset of the exact kernel with near-total recall (doc_embedding_exact)")
    // the evaluation queries THEMSELVES: their oracles compose a replay
    // leg, so they carry the same law-not-default discipline
    val recallGate =
      "SimilaritySpec:35 registered evaluation equals an independent " +
      "test-side recompute of hits/recall from both searches' result " +
      "sets; the legs carry their own gates (knn_brute Independent, " +
      "each ANN leg's recall law)"
    Seq("ann_recall_ivf", "ann_recall_lsh", "ann_recall_pq", "ann_recall_ivfpq")
      .foreach(q => m += q -> (ParityWithLaw, recallGate))
    m += "minhash_jaccard_err" -> (ParityWithLaw,
      "PropertiesSpec:145 signature pipeline equals an independent " +
      "MessageDigest+BigInteger recompute on random corpora; " +
      "DedupSpec:27 per-row internal consistency (est = agree/k, " +
      "abs_err = |J - est|) plus the mean-error concentration bar for " +
      "k=64; the exact-Jaccard leg is the Independent all-pairs kernel")

    // --- corpus pipeline: md5-threshold / greedy encodings + driver laws
    m += "sample_stratified" -> (ParityWithLaw, "CorpusPipelineSpec:8 deterministic, respects the rate table")
    m += "sample_temperature" -> (ParityWithLaw, "CorpusPipelineSpec:17 flattens the head, keeps the tail whole")
    m += "sample_balanced" -> (ParityWithLaw, "CorpusPipelineSpec:94 exact k per language")
    m += "sample_weighted" -> (ParityWithLaw, "CorpusPipelineSpec:205 driver-side sequential-Poisson brute recompute")
    m += "source_cap" -> (ParityWithLaw, "CorpusPipelineSpec:167 quality-top-K per source via the bounded-PQ operator")
    m += "pack_sequences" -> (ParityWithLaw, "CorpusPipelineSpec:108 driver-side greedy fold per shard")
    m += "corpus_funnel" -> (ParityWithLaw, "CorpusPipelineSpec:123 stage monotonicity")
    m += "doc_chunks" -> (ParityWithLaw, "CorpusPipelineSpec:134 stride grid covers every token exactly")
    m += "quality_deciles" -> (ParityWithLaw, "CorpusPipelineSpec:187 partition with monotone bin boundaries")
    m += "doc_repetition" -> (ParityWithLaw, "CorpusPipelineSpec:39 internal consistency")
    m += "text_normalize" -> (ParityWithLaw, "CorpusPipelineSpec:51 normalization is a fixpoint")
    m += "doc_logprob" -> (ParityWithLaw, "TextQualitySpec:29 driver-side unigram-model recompute")
    m += "doc_logprob_bigram" -> (ParityWithLaw, "TextQualitySpec:59 driver-side interpolated-LM recompute")

    // --- DSv2 synth source: generation replayed by the oracle; laws are
    // the closed-form derivation + brute recomputes + the prune law
    val synth = "SourcesSpec:22 closed-form Lehmer derivation; :250 " +
      "driver-side brute recompute; PropertiesSpec:96 prune-vs-brute law"
    m += "synth_bucket_agg" -> (ParityWithLaw, synth)
    m += "synth_stream_agg" -> (ParityWithLaw, synth + "; SourcesSpec:152 batch parity")

    // --- notable Independent entries where the gate deserves a citation
    m += "user_sessions_stream_chunked" -> (Independent,
      "batch islands SQL independently states the closed-session set a REAL " +
      "multi-batch FileStreamSource drain must reproduce; chunking invariance " +
      "at sf1 measured by StreamScaleProf (PLANS.md round 9)")
    m += "events_anomaly_stream_chunked" -> (Independent,
      "batch rolling-baseline SQL independently states the flags a REAL " +
      "multi-batch drain of the flatMapGroupsWithState ring must reproduce; " +
      "the sentinel flush rides the last chunk file, not a driver addData")
    m += "logsumexp_by_group" -> (Independent,
      "oracle is ln(sum(exp)) from scratch; PropertiesSpec:41-95 monoid laws as belt-and-braces")
    m += "heavy_hitters_cms" -> (Independent,
      "contract-flag oracle: exact heavy hitters recomputed in SQL, sketch gated by containment")
    m += "approx_distinct_users" -> (Independent,
      "contract-flag oracle: exact distinct recomputed in SQL, HLL gated by rsd bound")
    m += "value_pct_approx" -> (Independent,
      "contract-flag oracle: exact percentile aggregate evaluated alongside, rank-band gated")
    m += "image_features" -> (Independent,
      "closed-form pixel oracle that never decodes a PNG vs the real javax.imageio codec")
    m += "image_resize" -> (Independent,
      "closed-form oracle vs decode->resize->re-encode->re-decode round trip")
    m
  }.toMap

  /** Families whose oracles are KNOWN to replay implementation encodings
    * (iterative pipelines, trained models, hash/band devices). Every
    * registered query matching one of these prefixes must be explicitly
    * classified above — falling through to the Independent default would
    * be exactly the parity-only hole the audit exists to close. */
  val encodedPrefixes: Seq[String] = Seq(
    "bpe_", "wordpiece_", "ppr_", "spam_", "ann_", "minhash_",
    "dedup_minhash", "dedup_simhash",
    "dedup_clusters", "dedup_survivors", "dedup_best_survivor",
    "dedup_spans", "dedup_incremental", "dedup_semantic", "sample_",
    "synth_", "triangle_")

  def of(name: String): (Class, String) =
    classes.getOrElse(name,
      (Independent, "oracle restates the semantics declaratively in SQL"))
}
