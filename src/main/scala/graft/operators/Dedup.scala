package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the core LLM-training-data
  * pipeline surface (extension mandate, SURVEY §7 M7): exact dedup,
  * n-gram Jaccard near-dup, MinHash+LSH, and SimHash.
  *
  * Scale design (the point of each variant):
  *  - exact: hash-groupBy on a normalized signature — one shuffle keyed by
  *    a 128-bit digest, the cheapest possible dedup; ~uniform keys, no skew.
  *  - ngram-jaccard: the exact-but-quadratic baseline. The shingle
  *    self-join is the scale hazard (a shingle shared by f docs yields f²
  *    candidate rows), so hot shingles are dropped above a frequency cap —
  *    the standard "stop-shingle" guard that bounds the blow-up; the cap
  *    only removes shingles that carry no discriminating signal.
  *  - minhash-lsh: the 100 TB path. Per-doc signature of K minhashes →
  *    banded into B buckets → candidates are docs sharing a (band, slice)
  *    key → verified with exact Jaccard. Join fan-out is bounded by bucket
  *    occupancy, not corpus size²; everything shuffles on narrow keys.
  *  - simhash: 64-bit fingerprint; near-dup = small Hamming distance.
  *    Banding the 64 bits into 4×16-bit keys finds all pairs within
  *    distance 3 without a cartesian product (pigeonhole: ≤3 differing
  *    bits leave ≥1 of 4 bands identical).
  *
  * Algorithms follow the published formulations: MinHash resemblance
  * sketching (Broder, "On the resemblance and containment of documents",
  * 1997) with the standard LSH banding analysis (Leskovec/Rajaraman/Ullman,
  * Mining of Massive Datasets ch.3), and SimHash random-projection
  * fingerprints (Charikar, "Similarity estimation techniques from rounding
  * algorithms", STOC 2002) with the Hamming-band trick from Manku et al.,
  * "Detecting near-duplicates for web crawling", WWW 2007.
  *
  * MinHash lanes derive from one xxhash64 base through a splitmix64
  * stream (`functions/MinhashKernels.scala` — deterministic, not
  * SQL-portable), but their OUTPUT (exact-Jaccard-verified candidates) is
  * oracle-checked against the exhaustive pair set, since banding recall is
  * complete on this corpus; the ScalaTest additionally gates recall
  * structurally. SimHash is built on an md5-derived 60-bit token hash,
  * bit-identical in DuckDB, so its whole pipeline is oracle-checked.
  */
object Dedup {

  val jaccardThreshold = 0.8
  /** Stop-shingle guard: shingles occurring in more than this many docs
    * are dropped before the brute self-join — a shingle shared by f docs
    * yields f² candidate rows, so the cap bounds the quadratic blow-up.
    * 1000 is the defensible production setting (10⁶ candidate rows per
    * hot shingle, well inside one task); it cannot bind at the oracle
    * scale (sf0.01 has 500 docs, so every f ≤ 500), which keeps the
    * capped plan exactly equal to the uncapped DuckDB oracle there.
    * Dropped volume is surfaced via `df.observe` (metric
    * `stop_shingle_guard`), so truncation at scale is visible, never
    * silent. */
  val maxShingleFreq = 1000
  val minhashK = 64
  val minhashBands = 16 // 16 bands x 4 rows
  val simhashBandBits = 15 // 4 bands over the 60-bit md5-derived fingerprint

  private def toks(spark: SparkSession, dir: String) =
    Tables.documents(spark, dir).select(col("doc_id"), tokenize(col("text")).as("ws"))

  /** Distinct word 3-grams of a token array (positions i,i+1,i+2).
    * Guarded for <3 tokens: `sequence(0, -1)` would count DOWN in Spark. */
  private def shingles3(ws: Column): Column =
    // codegen'd k-gram loop (graft.functions.NgramStrings) — the
    // transform(sequence)+element_at form paid an interpreted lambda +
    // three positional lookups per shingle (r6g; identical strings,
    // hashes unchanged)
    array_distinct(graft.functions.NgramStrings.ngram_strings(ws, 3))

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    toks(spark, dir)
      .select(col("doc_id"), explode(shingles3(col("ws"))).as("sh"))

  /** The dedup family (jaccard → clusters → survivors, and minhash's
    * verify pass) all start from the same (doc_id, shingle) set, so the
    * exploded shingle table is materialized once per (session, dir) via
    * `localCheckpoint` and reused — the cross-stage "reuse a
    * partitioning" play: at corpus scale the shingle explosion is a full
    * scan + flatMap of every document, the single most expensive shared
    * prefix in the family. */
  private val shinglesMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def docShinglesShared(spark: SparkSession, dir: String): DataFrame =
    // synchronized: TrieMap.getOrElseUpdate may evaluate the thunk twice
    // under concurrent first access, which would run the checkpoint job
    // twice; the lock serializes only the first build per key
    shinglesMemo.synchronized {
      shinglesMemo.getOrElseUpdate((spark, dir),
        docShingles(spark, dir).localCheckpoint(true))
    }

  /** Verified Jaccard pair graph, materialized once per (session, dir):
    * `dedup_clusters` and `dedup_survivors` both consume it, and the
    * self-join that produces it is the family's quadratic step — paying
    * it once is the ≥30% family saving the plan audit asked for. */
  private val pairsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def jaccardPairsShared(spark: SparkSession, dir: String): DataFrame =
    pairsMemo.synchronized {
      pairsMemo.getOrElseUpdate((spark, dir),
        ngramJaccardPairs(spark, dir).localCheckpoint(true))
    }

  /** The minhash (band, slice) index — the standing artifact an
    * incremental ingest probes — materialized once per (session, dir)
    * and shared by [[dedupMinhashLsh]] and [[dedupIncremental]]; in
    * production this is the persisted table appended per batch. */
  private val bandsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def signatureBandsShared(spark: SparkSession, dir: String): DataFrame =
    bandsMemo.synchronized {
      bandsMemo.getOrElseUpdate((spark, dir),
        signatureBands(minhashSignature(docShinglesShared(spark, dir)))
          .localCheckpoint(true))
    }

  /** The memos assume the data under `dir` is immutable for the JVM
    * lifetime (true for the driver's static testdata — rewriting a dir
    * within a session would serve stale results). Bench calls this between
    * timed runs so the second run re-pays the family's shared prefix
    * instead of reporting a memo hit as the query's cost. The memoized
    * checkpoints' blocks are released explicitly — clearing the map alone
    * would park them in the MemoryStore until a driver GC lets the
    * ContextCleaner notice the dead RDDs. */
  def clearMemos(): Unit =
    Seq(shinglesMemo, pairsMemo, bandsMemo).foreach { m =>
      m.values.foreach(graft.Tables.releaseCheckpoint)
      m.clear()
    }

  /** Registered queries that consume the shared artifacts above. Bench
    * gates its `dedup_family_build` metric on THIS set, not a `dedup`
    * name prefix — the prefix also matches dedup_exact, dedup_simhash and
    * dedup_embedding_cosine, none of which touch the shingle family, so a
    * filtered bench run selecting only those would time a useless build. */
  val familyMembers: Set[String] = Set("dedup_ngram_jaccard", "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_clusters", "dedup_survivors", "dedup_best_survivor",
    "split_leakage_safe", "decontaminate", "decontaminate_bloom",
    "dedup_incremental", "dedup_cluster_profile", "dedup_rate_by_source",
    "dedup_containment", "dup_ngram_coverage")

  /** Force-materialize the family's shared artifacts (shingle table,
    * verified pair graph, minhash band index). Bench times this as its
    * own `dedup_family_build` metric so the per-query numbers report
    * MARGINAL cost instead of whichever family member happens to run
    * first absorbing the shared build — the production shape is exactly
    * this: build the standing artifacts once, consume them many times. */
  def buildFamilyArtifacts(spark: SparkSession, dir: String): Unit = {
    docShinglesShared(spark, dir)
    // pair graph and minhash band index are INDEPENDENT consumers of the
    // shingle checkpoint (different memo locks, so no contention): built
    // from a 2-thread pool, the band build's map-side work back-fills the
    // pair self-join's reduce tail instead of waiting for it (guide
    // §2.6). Each build still materializes exactly once — the per-memo
    // synchronized getOrElseUpdate is unchanged.
    graft.Tables.runConcurrently("graft-dedup-build", Seq(
      () => { jaccardPairsShared(spark, dir); () },
      () => { signatureBandsShared(spark, dir); () }))
  }

  /** Per-stage wall seconds of a COLD build — the adjudication hook the
    * r7 `dedup_family_build` movement lacked: when the one-number metric
    * moves, this says WHICH stage moved (shingle explode, pair
    * self-join, or minhash banding) without a tree checkout A/B.
    * Clears the family memos first so every stage pays its real cost. */
  def profileBuildStages(spark: SparkSession, dir: String): Seq[(String, Double)] = {
    clearMemos()
    def t(label: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      body
      label -> (System.nanoTime() - t0) / 1e9
    }
    Seq(
      t("shingles") { docShinglesShared(spark, dir) },
      t("jaccard_pairs") { jaccardPairsShared(spark, dir) },
      t("minhash_bands") { signatureBandsShared(spark, dir) })
  }

  /** Entity-level fuzzy dedup by EXACT edit distance ≤ 1 (entity
    * resolution: near-identical customer names — the ID-like strings a
    * crawled corpus's author/source fields look like). Candidate
    * generation is the symmetric-delete neighborhood join
    * (`functions/NormalizeKernels.scala` DeletionVariants — FastSS
    * family): two strings with ed ≤ 1 always share a 1-deletion
    * variant, so the variant equi-join is provably complete, and it
    * stays subquadratic on shared-prefix entities where positional
    * segment/q-gram blocking collapses into one hot bucket (every
    * "customer#..." prefix segment is identical — PassJoin degrades to
    * all-pairs there; a deletion variant keeps the discriminating
    * tail). Exact `levenshtein` verify after candidate dedup, so output
    * equality with the brute oracle proves blocking completeness
    * corpus-wide. Output is the bounded per-entity neighbor profile
    * (one row per entity with ≥1 neighbor), not the pair set — at
    * corpus scale the profile is what survivor selection consumes.
    * Candidate cost: Σ |variant bucket|² — buckets only grow where true
    * near-dup clusters exist, which is the output itself. k generalizes
    * via C(n,k)-deletion neighborhoods; registered at k = 1. */
  def dedupEditDistance(spark: SparkSession, dir: String): DataFrame =
    editDistanceProfile(spark, dir, k = 1)

  /** The k = 2 leg: same variant equi-join plan with the C(n, 2)
    * neighborhood — the radius entity resolution actually operates at
    * (one typo plus one transposition-ish slip survives). Same
    * brute-force oracle discipline as k = 1: the all-pairs DuckDB
    * oracle proves the 2-deletion blocking COMPLETE on the corpus, not
    * just plausible. */
  def dedupEditDistance2(spark: SparkSession, dir: String): DataFrame =
    editDistanceProfile(spark, dir, k = 2)

  /** Deterministic bounded-sample twins (r14, r13 verdict item 1c).
    *
    * The parents' brute all-pairs DuckDB oracles are hours-by-
    * construction at sf1, so until r14 the corpus-wide blocking-
    * completeness proof ran only at the sf0.01 gate. These twins run
    * the IDENTICAL pipeline ([[neighborProfile]], collapse-exact-first
    * and all) on a deterministic residue slice of the id space.
    * Blocking completeness for a pair depends only on the two strings
    * (whether they share a deletion variant), never on the rest of the
    * corpus — so the sampled run's pair set equals the full run's pair
    * set restricted to in-sample endpoints, and brute-vs-blocked
    * equality on the slice is a true completeness check of the SAME
    * blocking at whatever scale the slice came from. The brute oracle
    * stays DuckDB-feasible at 10-30x the graded scale (measured at sf1:
    * k=1 slice 8.9 s / 45,200 pairs, k=2 slice 1.9 s / 165,145 pairs).
    *
    * The k=1 slice takes TWO adjacent residues: on the sf0.01 corpus's
    * all-distinct zero-padded name space, ids one residue class apart
    * (64, 128, ...) differ in at least two digits, so a single-residue
    * slice has no ed-1 pairs to check — adjacent ids (7,8 then 71,72,
    * ...) differ by one substitution and keep the gate non-vacuous at
    * every scale (19 pairs at sf0.01). The k=2 slice is single-residue
    * (ids 64 apart are two substitutions — 47 pairs at sf0.01). */
  val edSampleMod = 64
  val edSampleRems: Seq[Int] = Seq(7, 8)
  val ed2SampleRem = 7

  def dedupEditDistanceSample(spark: SparkSession, dir: String): DataFrame =
    neighborProfile(
      Tables.customer(spark, dir)
        .filter((col("c_custkey") % edSampleMod)
          .isin(edSampleRems.map(_.toLong): _*))
        .select(col("c_custkey").as("id"), lower(col("c_name")).as("s")),
      k = 1)

  def dedupEditDistance2Sample(spark: SparkSession, dir: String): DataFrame =
    neighborProfile(
      Tables.customer(spark, dir)
        .filter(col("c_custkey") % edSampleMod === ed2SampleRem)
        .select(col("c_custkey").as("id"), lower(col("c_name")).as("s")),
      k = 2)

  private def editDistanceProfile(spark: SparkSession, dir: String,
      k: Int): DataFrame =
    neighborProfile(
      Tables.customer(spark, dir)
        .select(col("c_custkey").as("id"), lower(col("c_name")).as("s")), k)

  /** The registered profile, restructured around COLLAPSE-EXACT-FIRST —
    * the production shape for entity resolution on corpora with repeated
    * entity strings. Row-level pair enumeration is quadratic in the copy
    * count per value (the r13 fixture replicates a 15k-name space 10×/30×
    * at sf1/sf3: ~54M/~380M directed true pairs — the row-level pipeline
    * was output-BOUND, i.e. optimal per pair, but the pair multiset
    * itself is the scale problem). This form never materializes it:
    *
    *  1. collapse rows to DISTINCT values with (copies, min id, second
    *     min id) — one grouped aggregate;
    *  2. run the fuzzy variant join on distinct values only (15k rows
    *     regardless of sf here);
    *  3. per value, aggregate neighbor-VALUE stats (Σ copies, min id);
    *  4. expand back to rows with one value-keyed equi-join and derive
    *     each row's profile arithmetically: same-value neighbors are
    *     the other copies (count c−1; min id is min1, or min2 for the
    *     row that IS min1), cross-value neighbors come from step 3.
    *
    * Exactness is unchanged (the brute all-pairs oracle still gates the
    * registered queries) and DedupSpec pins the collapse arithmetic on
    * adversarial duplicate-heavy fixtures the sf0.01 oracle corpus
    * (all-distinct names) cannot reach. */
  private[graft] def neighborProfile(rows: DataFrame, k: Int): DataFrame = {
    // (value, copies, min1, min2): min2 = smallest id among the value's
    // OTHER copies, needed only for the row that holds min1; two grouped
    // aggregates keep it bounded (no collect_list of an unbounded clique)
    val stats1 = rows.groupBy("s")
      .agg(count(lit(1)).as("c"), min("id").as("min1"))
    val stats = rows.join(stats1, "s")
      .groupBy("s", "c", "min1")
      .agg(min(when(col("id") =!= col("min1"), col("id"))).as("min2"))
    // fuzzy neighbors among DISTINCT values (value id = its min1)
    val valPairs = editDistancePairsDirected(
      stats.select(col("min1").as("id"), col("s")), k)
    val nbr = valPairs
      .join(stats.select(col("min1").as("id_b"), col("c").as("c_b")), "id_b")
      .groupBy(col("id_a").as("min1"))
      .agg(sum("c_b").as("nbr_copies"), min("id_b").as("nbr_min"))
    rows.join(stats, "s")
      .join(nbr, Seq("min1"), "left_outer")
      .select(col("id").as("cust_id"),
        (col("c") - 1 + coalesce(col("nbr_copies"), lit(0L))).as("n_neighbors"),
        // least() skips nulls: the same-value leg is min1 (or min2 when
        // this row IS min1 — possibly null for a lone copy), the
        // cross-value leg is nbr_min (null when no fuzzy neighbor)
        least(when(col("id") === col("min1"), col("min2")).otherwise(col("min1")),
          col("nbr_min")).as("min_neighbor"))
      .filter(col("n_neighbors") >= 1)
      .orderBy("cust_id")
  }

  /** The ed ≤ 1 pair kernel over any (id, s) frame — factored out so
    * DedupSpec can drive completeness on adversarial geometries (every
    * edit kind at every position, multibyte codepoints) next to a brute
    * reference. */
  /** ed ≤ k candidate pairs via symmetric-delete blocking with an exact
    * `levenshtein` verify.
    *
    * k = 1 uses the POSITIONAL join (FastSS's refinement, carried by the
    * `DeletionVariantsPos` kernel): a radius-1 pair always either shares
    * a variant from the SAME deletion position (equality, substitution)
    * or has the longer's deletion equal to the shorter ITSELF (indel) —
    * so candidates come from (a) an equi-join on (variant, position) and
    * (b) deletions joined against originals, both bucket-bounded by the
    * per-position alphabet rather than the corpus density. The
    * position-blind join's Σ|bucket|² is superlinear on dense key
    * spaces — measured r13 on TPC-H's consecutive zero-padded customer
    * names: 2.45 s at sf0.1 → 207 s at sf1 (84× at 10× data); the
    * positional split restores ~linear scaling. Completeness stays
    * gated three ways: the brute all-pairs DuckDB oracle corpus-wide,
    * DedupSpec's adversarial geometries, and the generative random-
    * corpus brute-vs-blocked law.
    *
    * k ≥ 2 keeps the position-blind ≤k-deletion neighborhood join
    * (`deletionVariantsUpTo` carries the completeness argument) — the
    * same-position-set trick is NOT generally complete past radius 1
    * (same-length ed-2 pairs can mix an insert and a delete whose
    * positions shift), so the safe plan pays Σ|bucket|²; its cost
    * tracks true-pair density (measured in PLANS.md). */
  private[graft] def editDistancePairs(names: DataFrame, k: Int = 1): DataFrame =
    editDistancePairsDirected(names, k).filter(col("id_a") < col("id_b"))

  /** Both orientations of every verified pair — the form the neighbor
    * profile consumes directly (computing the directed set ONCE instead
    * of unioning two copies of the undirected pipeline halves the
    * candidate work; the pre-r13b plan visibly duplicated the whole
    * subtree). The candidate self-joins yield both orientations for
    * free. Join strategy is pinned by hints: Catalyst's size estimate
    * does not model the ~(len+1)× Generate fan-out, so it elected to
    * BROADCAST the exploded variant frame (2.85M rows at sf1 — a
    * build-side scale-killer); the variant-variant join is forced to
    * sort-merge and only the bounded `names` table broadcasts. */
  private[graft] def editDistancePairsDirected(names: DataFrame, k: Int): DataFrame = {
    // radius-1 candidate generator, shared verbatim by k = 1 and as the
    // ed ≤ 1 leg of the k = 2 decomposition below
    def radius1Candidates: DataFrame = {
      val vp = names.select(col("id"), col("s"),
        explode(graft.functions.NormalizeKernels
          .deletion_variants_pos(col("s"))).as("vp"))
        .select(col("id"), col("s"), col("vp.v").as("v"), col("vp.pos").as("pos"))
      val a = vp.select(col("id").as("id_a"), col("s").as("s_a"),
        col("v"), col("pos"))
      val b = vp.select(col("id").as("id_b"), col("s").as("s_b"),
        col("v"), col("pos"))
      // (a) same-position variants: equality (-1,-1 and every (i,i))
      // and substitutions (delete the substituted position from both)
      val samePos = a.join(b.hint("merge"), Seq("v", "pos"))
      // (b) a deletion of one side equals the OTHER side's original —
      // the insertion/deletion case; one join covers both orientations
      // because deletions of every string meet every original
      val dels = vp.filter(col("pos") >= 0)
        .select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
      val origs = names
        .select(col("id").as("id_b"), col("s").as("s_b"), col("s").as("v"))
      val indel = dels.join(broadcast(origs), "v")
      // (b) is one-directional per row (deleter → original); add the
      // reverse orientation by swapping ROLES of the bounded output,
      // not by re-running the join
      samePos.select("id_a", "id_b", "s_a", "s_b")
        .unionByName(indel.select("id_a", "id_b", "s_a", "s_b"))
        .unionByName(indel.select(col("id_b").as("id_a"),
          col("id_a").as("id_b"), col("s_b").as("s_a"), col("s_a").as("s_b")))
    }
    val candidates =
      if (k == 1) radius1Candidates
      else if (k == 2) {
        // r14 (r13 verdict item 5): the position-blind ≤2-deletion
        // self-join paid Σ|bucket|² on the FULL C(n,2) neighborhood —
        // the dominant (2-deletion × 2-deletion) term has C(L,2) ≈ L²/2
        // variants per string and dense-key buckets to match. Every
        // ed ≤ 2 pair class has a cheaper complete witness, so the one
        // join decomposes into five, none of which enumerates that term
        // position-blind (completeness gated by the brute oracles at
        // sf0.01 + the sf1 sample twin, DedupSpec's adversarial
        // geometries, and the generative brute-vs-blocked law):
        //   ed ≤ 1 (equality, 1 sub, 1 indel)  -> radius1Candidates;
        //   2 subs, same length                -> (v, i, j) POSITIONAL
        //     equi-join on the 2-deletion pair kernel: both sides delete
        //     the same two original positions, so buckets shrink to the
        //     per-position-pair alphabet (the radius-1 positional trick,
        //     carried to the only class that genuinely needs
        //     2-deletions on both sides);
        //   delete@i + insert@j, same length   -> D1 x D1 blind join
        //     (single-deletion buckets only — the r13 k=1 problem term
        //     was this join's k=2 analog, ~L x bigger per side);
        //   1 sub + 1 indel, length diff 1     -> D1 x D2 blind join
        //     (shorter deletes the subbed position; longer deletes the
        //     inserted + subbed positions);
        //   2 inserts, length diff 2           -> D2 x originals
        //     (the longer's 2-deletion IS the shorter; broadcast the
        //     bounded originals, the radius-1 indel shape).
        // Exploded frames keep merge hints (Catalyst's size estimate
        // does not model the Generate fan-out and would broadcast them).
        def explode1(src: DataFrame): DataFrame = src
          .select(col("id"), col("s"),
            explode(graft.functions.NormalizeKernels
              .deletion_variants_pos(col("s"))).as("vp"))
          .select(col("id"), col("s"), col("vp.v").as("v"), col("vp.pos").as("pos"))
          .filter(col("pos") >= 0) // deletions only; originals ride leg 5
        def explode2(src: DataFrame): DataFrame = src
          .select(col("id"), col("s"),
            explode(graft.functions.NormalizeKernels
              .deletion_variants_pos2(col("s"))).as("vp"))
          .select(col("id"), col("s"), col("vp.v").as("v"),
            col("vp.i").as("i"), col("vp.j").as("j"))
        // length gate for the cross-length legs: x12 fires only across a
        // length delta of 1 and x02 only across 2, so each side is
        // semi-joined against the (broadcast-tiny) distinct length set
        // shifted by the delta — a uniform-length corpus (TPC-H names)
        // never even EXPLODES their frames (measured at sf0.1: the
        // ungated legs cost 3.5 s shuffling 2.6M rows to produce zero)
        val lenSet = names.select(length(col("s")).as("len")).distinct()
        def withPartnerLen(delta: Int): DataFrame =
          names.join(broadcast(lenSet),
            length(col("s")) + delta === col("len"), "left_semi")
        val vp2 = explode2(names)
        // ss keeps only candidates differing at BOTH deleted positions:
        // the exactly-two-substitution pairs this leg exists for. A pair
        // differing at one position matches (i, m) for EVERY other m —
        // L−2 redundant witnesses per ed-1 pair — and ed-1 pairs already
        // ride radius1Candidates (measured at sf0.1: the unfiltered leg
        // emits 18.2M occurrences for 8.2M true directed pairs).
        def diffAt(p: Column): Column =
          col("s_a").substr(p + 1, lit(1)) =!= col("s_b").substr(p + 1, lit(1))
        val ss = vp2.select(col("id").as("id_a"), col("s").as("s_a"),
            col("v"), col("i"), col("j"))
          .join(vp2.select(col("id").as("id_b"), col("s").as("s_b"),
            col("v"), col("i"), col("j")).hint("merge"), Seq("v", "i", "j"))
          .filter(diffAt(col("i")) && diffAt(col("j")))
        val d1 = explode1(names)
        val d1a = d1.select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
        val d1b = d1.select(col("id").as("id_b"), col("s").as("s_b"), col("v"))
        val x11 = d1a.join(d1b.hint("merge"), "v")
        val d1Short = explode1(withPartnerLen(+1))
          .select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
        val d2Long = explode2(withPartnerLen(-1))
          .select(col("id").as("id_b"), col("s").as("s_b"), col("v"))
        val x12 = d1Short.join(d2Long.hint("merge"), "v")
        val origs = withPartnerLen(+2)
          .select(col("id").as("id_b"), col("s").as("s_b"), col("s").as("v"))
        val x02 = explode2(withPartnerLen(-2))
          .select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
          .join(broadcast(origs), "v")
        // every leg except x12 is TRUE BY CONSTRUCTION — sharing a
        // same-position(s) deletion variant bounds the distance:
        //   ss  : equal outside positions {i, j}      -> ed <= 2
        //   x11 : delete@i from a = delete@j from b   -> ed <= 2
        //         (delete i, insert j)
        //   x02 : a IS a 2-deletion of b              -> ed = 2
        //   radius1Candidates: ed <= 1 by the k=1 argument
        // so the levenshtein verify runs ONLY on x12 (D1 x D2 admits
        // ed-3: one deletion then two inserts elsewhere). Skipping the
        // redundant DP on the ~20M provably-true occurrences is most of
        // this decomposition's win; over-admission here would surface
        // as EXTRA pairs in the brute oracles and the generative
        // brute-vs-blocked law, both of which gate this path.
        val x12v = x12
          .filter(levenshtein(col("s_a"), col("s_b")) <= 2)
        radius1Candidates
          .unionByName(ss.select("id_a", "id_b", "s_a", "s_b"))
          .unionByName(x11.select("id_a", "id_b", "s_a", "s_b"))
          // x12 and x02 are one-directional (deleter -> other side); add
          // the reverse orientation by swapping roles of the output
          .unionByName(x12v.select("id_a", "id_b", "s_a", "s_b"))
          .unionByName(x12v.select(col("id_b").as("id_a"),
            col("id_a").as("id_b"), col("s_b").as("s_a"), col("s_a").as("s_b")))
          .unionByName(x02.select("id_a", "id_b", "s_a", "s_b"))
          .unionByName(x02.select(col("id_b").as("id_a"),
            col("id_a").as("id_b"), col("s_b").as("s_a"), col("s_a").as("s_b")))
      } else {
        val variants = names.select(col("id"), col("s"),
          explode(graft.functions.NormalizeKernels
            .deletion_variants_up_to(col("s"), k)).as("v"))
        variants.select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
          .join(variants.select(col("id").as("id_b"), col("s").as("s_b"),
            col("v")).hint("merge"), "v")
      }
    val distinctIds = candidates.filter(col("id_a") =!= col("id_b"))
    // verify BEFORE the dedup: the exact levenshtein is a cheap
    // codegen'd map-side filter, so running it per candidate
    // OCCURRENCE (a pair can share several variants) shrinks the
    // dedup exchange to true pairs AND leaves the distinct on two
    // bare longs — a codegen'd HashAggregate instead of the
    // SortAggregate that first(string) payloads force. At k = 2 the
    // decomposition above verified the ONE leg that can over-admit
    // (x12) in place; every other leg is true by construction, so a
    // global DP here would burn ~20M redundant L² evaluations per run.
    val verified =
      if (k == 2) distinctIds
      else distinctIds.filter(levenshtein(col("s_a"), col("s_b")) <= k)
    verified
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact dedup: group by the md5 of whitespace-normalized lowercase
    * text; emit one row per distinct content with representative id and
    * copy count. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    toks(spark, dir)
      .select(col("doc_id"), md5(array_join(col("ws"), " ")).as("sig"))
      .groupBy("sig")
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("rep_doc_id")

  /** Brute-force n-gram Jaccard near-dup pairs (J ≥ threshold),
    * un-ordered — the shared core behind the registered query and the
    * cluster/survivor chain. */
  private def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    jaccardPairsFromShingles(docShinglesShared(spark, dir))

  /** The cap + self-join core over any (doc_id, sh) shingle table —
    * factored out so the binding-cap case is testable on a synthetic
    * corpus (testdata can never push a shingle past [[maxShingleFreq]];
    * ScaleDesignSpec rehearses the cap actually firing and asserts the
    * capped plan agrees with a capped driver-side oracle). */
  /** The stop-shingle cap as a reusable stage (brute self-join and the
    * prefix-filtered variant share it; each caller names its own observe
    * metric because CollectMetrics names must be unique per query). The
    * dropped volume is observed BEFORE the guard filters, so truncation
    * at scale is a first-class metric of every run that crosses the cap;
    * observe forbids distinct aggregates, so the unique-hot-shingle count
    * is an HLL estimate. */
  private[graft] def cappedShingles(sh: DataFrame, metric: String): DataFrame =
    sh.withColumn("f", count(lit(1)).over(Window.partitionBy("sh")))
      .observe(metric,
        sum(when(col("f") > maxShingleFreq, lit(1L)).otherwise(lit(0L)))
          .as("dropped_shingle_rows"),
        approx_count_distinct(when(col("f") > maxShingleFreq, col("sh")))
          .as("dropped_distinct_shingles"))
      .filter(col("f") <= maxShingleFreq)
      .select("doc_id", "sh")

  private[graft] def jaccardPairsFromShingles(sh: DataFrame): DataFrame = {
    val filtered = cappedShingles(sh, "stop_shingle_guard")
    // sizes from the SAME filtered set: a capped shingle must leave both
    // the intersection and the union or Jaccard is biased low
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = filtered.as("a")
      .join(filtered.as("b"), Seq("sh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    // sizes is one row per doc — too big to broadcast at corpus scale, so
    // these stay shuffle joins on the doc-id keys
    inter
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The registered query: the shared pair graph in canonical order. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairsShared(spark, dir).orderBy("doc_a", "doc_b")

  /** [[jaccardThreshold]] as an exact rational (permille) so the prefix
    * and length filters use integer arithmetic: `0.8 * n` in doubles is
    * NOT exact (0.8 rounds up, so 0.8*5 > 4.0 and a ceil would return 5,
    * wrongly shortening the prefix and dropping boundary pairs). The
    * companion test pins that this value IS the threshold. */
  val jaccardThresholdPermille = 800L

  /** Exact set-similarity join by PREFIX FILTERING (the SSJoin/PPJoin
    * family: Chaudhuri et al. ICDE 2006; Xiao et al. WWW 2008; same
    * semantics as [[dedupNgramJaccard]], different candidate generation).
    * The brute kernel joins EVERY shingle occurrence against every other
    * — a hot-but-under-cap shingle shared by f docs contributes f²
    * candidate rows whether or not any pair can pass the threshold. The
    * prefix principle removes that waste WITHOUT losing a single pair:
    * order each doc's shingles by a global canonical key (ascending
    * document frequency, then the shingle string — rarest first) and
    * emit only the first `n - ⌈t·n⌉ + 1` as join keys. If J(a,b) ≥ t
    * then |a∩b| ≥ ⌈t·max(na,nb)⌉ ≥ ⌈t·n_d⌉ for both docs, and two sets
    * whose overlap is ≥ α must collide inside their (n−α+1)-prefixes
    * under ANY shared total order — so the candidate set provably
    * contains every qualifying pair, while hot shingles (high df) land
    * at the END of the order and never become join keys at all. A
    * length filter (1000·min ≥ 800·max, exact in integers) prunes pairs
    * no overlap could qualify, then ONE exact intersection pass over the
    * candidates' full shingle sets scores real Jaccard — false
    * candidates die there, so output == brute output, row for row
    * (DedupSpec pins the equality; the oracle below IS the brute SQL).
    *
    * Scale shape: df is one grouped count over the shingle table; the
    * ordering is a per-doc window (one hash partitioning by doc_id
    * shared by both window functions); the candidate join's key set is
    * the ~(1−t) rarest fraction of each doc's shingles, so join fan-out
    * is governed by RARE-shingle frequencies — the quadratic term the
    * brute kernel pays on every frequency band up to the cap is gone.
    * At t=0.8 the prefix is ~20% of each doc, and candidate volume
    * drops by the square of that on the hot bands. The verify join
    * streams candidate pairs against the doc-keyed shingle table
    * (left-semi on (doc_b, sh)) — work proportional to candidates ×
    * doc size, not corpus². */
  def dedupJaccardPrefix(spark: SparkSession, dir: String): DataFrame =
    prefixJaccardPairs(
      cappedShingles(docShinglesShared(spark, dir), "stop_shingle_guard_pfx"))
      .orderBy("doc_a", "doc_b")

  /** The prefix-filter kernel over any capped (doc_id, sh) table —
    * factored out so DedupSpec can drive it on adversarial boundary
    * geometries (pairs at exactly J = t, where a floating-point prefix
    * length would silently lose completeness) next to the brute kernel. */
  /** The candidate stage alone (prefix-key join + length filter,
    * deduplicated) — exposed so the scale profiler can count candidate
    * volume next to the brute kernel's. */
  private[graft] def prefixCandidates(shc: DataFrame): DataFrame = {
    // df as a WINDOW over the sh partitioning instead of the r9
    // groupBy+join-back (guide §2.4: two operations keyed the same way
    // share one exchange): shc arrives straight out of cappedShingles,
    // whose stop-shingle window already hash-partitioned AND sorted the
    // table by sh — the df window rides that exchange for free, where
    // the join-back form paid a second sh exchange for the aggregate
    // plus a sort-merge join of the full shingle table against it.
    // Value-identical: (doc_id, sh) rows are distinct, so the joined-in
    // groupBy count equals the per-row window count.
    val w = Window.partitionBy("doc_id")
    val ordered = shc
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("pos", row_number().over(w.orderBy(col("df"), col("sh"))))
    // ⌈t·n⌉ = (800n+999) div 1000, computed exactly: 800n+999 is an
    // integer exact in double (n ≤ 2^40), its true quotient is never an
    // integer (800n mod 1000 ∈ {0,200,..,800}, never 1), so floor cannot
    // land on the wrong side of a boundary
    val ceilTn = floor((col("n") * jaccardThresholdPermille + lit(999L)) /
      lit(1000.0)).cast("long")
    // NOT checkpointed (r15 measured-and-rejected): materializing the
    // prefix table looks like it should save the double window stack,
    // but the r14 window form already shares one exchange across both
    // self-join sides, and the A/B (2.68 → 3.92 s sf0.1, same phase)
    // showed the cache write + lost exchange reuse costs more than the
    // replay it avoids.
    val prefix = ordered
      .filter(col("pos") <= col("n") - ceilTn + lit(1L))
      .select(col("doc_id"), col("sh"), col("n"))
    prefix.toDF("doc_a", "sh", "na")
      .join(prefix.toDF("doc_b", "sh", "nb"), "sh")
      .filter(col("doc_a") < col("doc_b"))
      // length filter: J ≥ t ⇒ min(na,nb) ≥ t·max(na,nb), exact in permille
      .filter(least(col("na"), col("nb")) * lit(1000L) >=
        greatest(col("na"), col("nb")) * lit(jaccardThresholdPermille))
      .select("doc_a", "doc_b", "na", "nb")
      .dropDuplicates("doc_a", "doc_b")
  }

  private[graft] def prefixJaccardPairs(shc: DataFrame): DataFrame = {
    val cand = prefixCandidates(shc)
    // exact verify against per-doc shingle ARRAYS (r14). The previous
    // shape streamed every candidate's full shingle list through a
    // (doc_b, sh)-keyed semi-join — at 43k sf0.1 candidates that is a
    // ~1.7M-row intermediate, each row carrying (doc_a, doc_b, na, nb,
    // sh), exchanged once more for the final (doc_a, doc_b) count. Here
    // the shingle table is grouped once per doc (one narrow exchange of
    // what cappedShingles already emits) and each candidate joins its
    // two arrays; |A∩B| comes from the codegen'd `array_intersect` —
    // per-doc shingles are DISTINCT by construction (array_distinct at
    // the shingle source), so the intersect size is exactly the count
    // the semi-join computed, with no per-shingle shuffle rows and no
    // post-join re-aggregation. Work stays proportional to candidates ×
    // doc size (the PPJoin contract), but in-task instead of
    // through two exchanges.
    val docArrays = shc.groupBy("doc_id").agg(collect_list(col("sh")).as("shs"))
    cand
      .join(docArrays.toDF("doc_a", "shs_a"), "doc_a")
      .join(docArrays.toDF("doc_b", "shs_b"), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Containment threshold: inner doc ≥ 90% covered by the outer. */
  val containmentThresholdPermille = 900L

  /** Asymmetric containment near-dup — the case symmetric Jaccard
    * misses: a short document wholly quoted inside a long one scores
    * J = |A|/|B| (tiny when |B| ≫ |A|) but containment
    * C(a→b) = |A∩B|/|A| = 1. Quote-wrapping and boilerplate-framing
    * duplication in web corpora is exactly this shape (the
    * deduplication literature treats containment as the companion
    * measure to resemblance — Broder 1997's two estimands). Emits
    * ORIENTED pairs (inner, outer) with C ≥ 0.9: the unordered
    * intersection kernel over the capped shingle artifact computes i,
    * na, nb once per pair, then both orientations are scored as
    * i/na and i/nb (integer-permille filter, raw single-division
    * double shipped — the registry's exactness discipline). Shares the
    * memoized shingle artifact; the stop-shingle cap bounds the
    * self-join exactly as in the Jaccard kernel, and the prefix-filter
    * play (dedup_jaccard_prefix) extends to containment by prefixing
    * the INNER side only — noted, not needed at fixture scale. */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame = {
    val shc = cappedShingles(docShinglesShared(spark, dir), "stop_shingle_guard_cnt")
    val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shc.toDF("doc_a", "sh")
      .join(shc.toDF("doc_b", "sh"), "sh")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
    val ab = inter.select(col("doc_a").as("doc_inner"), col("doc_b").as("doc_outer"),
      col("i"), col("na").as("n_inner"))
    val ba = inter.select(col("doc_b").as("doc_inner"), col("doc_a").as("doc_outer"),
      col("i"), col("nb").as("n_inner"))
    ab.unionByName(ba)
      .filter(col("i") * lit(1000L) >= col("n_inner") * lit(containmentThresholdPermille))
      .withColumn("containment", col("i").cast("double") / col("n_inner"))
      .select("doc_inner", "doc_outer", "n_inner", "containment")
      .orderBy("doc_inner", "doc_outer")
  }

  /** Corpus duplication profile — the one-glance answer to "how much
    * of this corpus is duplicated text?" before any pair-level work:
    * the shingle table grouped by document frequency into log2 bands,
    * reporting distinct shingles, occurrence volume, and each band's
    * share of total occurrence volume (df ≥ 2 bands ARE the duplicated
    * mass; the df = 1 band is unique text). Two stacked aggregates —
    * shingle → df, then df-band histogram — the key_skew_profile shape
    * over the shared shingle artifact. Share is a single division by a
    * broadcast scalar, 6dp-rounded. */
  def dupNgramCoverage(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShinglesShared(spark, dir)
    val df_ = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val tot = df_.agg(sum(col("df")).as("total_occ"))
    df_.groupBy((length(bin(col("df"))) - 1).cast("long").as("log2_df"))
      .agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("n_occurrences"),
        max(col("df")).as("max_df"))
      .crossJoin(broadcast(tot))
      .withColumn("occ_share",
        round(col("n_occurrences").cast("double") / col("total_occ"), 6))
      .select("log2_df", "n_shingles", "n_occurrences", "max_df", "occ_share")
      .orderBy("log2_df")
  }

  /** MinHash signatures: for each of K hash lanes, the minimum over the
    * doc's shingles of lane i of `seeded_hashes(shingle)`.
    *
    * PRECONDITION (r12 advice): shingles must be non-null. The shingle
    * builders only emit non-null n-grams, but the null SEMANTICS here
    * differ from the pre-r12 form: `xxhash64(lit(i), sh)` hashed a null
    * shingle to a constant per-lane value (nulls PARTICIPATE in the
    * hash), while `element_at(seeded_hashes(sh), i+1)` is null for a
    * null shingle and `min` SKIPS nulls — a null row would silently
    * drop out of the signature instead of contributing a constant. If
    * the shingle source ever changes, filter or assert non-null at the
    * source rather than relying on this aggregate's skip. */
  private def minhashSignature(sh: DataFrame): DataFrame = {
    // one string hash + 64 integer mixes per occurrence (SeededHashes
    // kernel) instead of 64 independent seeded xxhash64 string hashes —
    // the signature pass is a full-corpus scan, and BuildProf measured
    // the old form as expensive as the candidate join itself. Buckets
    // shift with the hash family; outputs stay exact-Jaccard-verified.
    val withLanes = sh.withColumn("hs",
      graft.functions.SeededHashes.seeded_hashes(col("sh"), minhashK))
    val hashCols = (0 until minhashK).map(i =>
      min(element_at(col("hs"), i + 1)).as(s"h$i"))
    withLanes.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
  }

  /** (band, slice) bucket keys from a K-wide minhash signature — shared
    * by the full self-dedup and the incremental batch-vs-corpus dedup. */
  private def signatureBands(sig: DataFrame): DataFrame = {
    val rowsPerBand = minhashK / minhashBands
    sig.select(
      col("doc_id"),
      posexplode(array((0 until minhashBands).map(b =>
        struct((0 until rowsPerBand).map(r =>
          col(s"h${b * rowsPerBand + r}").as(s"r$r")): _*)): _*)))
      .toDF("doc_id", "band", "slice")
  }

  /** MinHash+LSH near-dup pairs: band the K-wide signature, bucket-join on
    * (band, slice), verify candidates with exact Jaccard. */
  /** Mersenne-prime modulus for the estimator's universal-hash
    * permutation family; coefficients are seeded driver-side (the
    * [[graft.operators.Similarity]] hyperplane precedent) and
    * interpolate into the oracle as the SAME literals. */
  val mhMod = 2147483647L
  private[graft] val (mhA, mhB) = {
    val rng = new scala.util.Random(4242)
    ((0 until minhashK).map(_ => rng.nextInt(Int.MaxValue - 2).toLong + 1),
      (0 until minhashK).map(_ => rng.nextInt(Int.MaxValue).toLong))
  }

  /** Sketch-accuracy evaluation — MinHash ESTIMATED Jaccard vs the
    * exact value, per near-dup pair: the [[graft.operators.Similarity]]
    * `ann_recall_ivf` pattern applied to the dedup family. The
    * estimator rebuilt here uses one md5 base hash (the cross-engine
    * hash) fed through a seeded universal-hash permutation family
    * instead of the production path's xxhash64 — deliberately, because
    * that makes the WHOLE estimate replayable in DuckDB, turning
    * "minhash agreement estimates Jaccard" from a cited property into
    * a hash-gated measurement. k = [[minhashK]] (64), so
    * the expected |err| at the planted-dup J≈0.98 is ~0.017 — the
    * numbers a deployment reads when sizing bands×rows.
    *
    * Pair set = the family's exact pair graph (capped shingles);
    * signatures come from the UNCAPPED set — identical on any corpus
    * where the stop-shingle cap never fires (this one; the cap exists
    * for hot-key skew, not semantics). Scale shape: one corpus-pass
    * signature aggregate + a join against the bounded pair graph. */
  /** The estimator's signature build over any (doc_id, sh) set — ONE
    * md5 per shingle, then [[minhashK]] integer permutations. The first
    * cut hashed md5(i || sh) per permutation and measured 13.2 s at
    * sf0.1 (64 digests per shingle row); the universal-hash family
    * costs a multiply-add-mod each and reads 0.9 s, with the same
    * cross-engine exactness (all arithmetic below 2^62, replayed
    * verbatim in SQL). Exposed for the PropertiesSpec law: signatures
    * equal a driver-side MessageDigest recompute on random corpora. */
  private[graft] def minhashEstSignatures(sh: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.md5Int
    val hashed = sh.withColumn("h", md5Int(col("sh"), 15) % mhMod)
    val sigCols = (0 until minhashK).map(i =>
      min((lit(mhA(i)) * col("h") + lit(mhB(i))) % mhMod).as(s"h$i"))
    hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  def minhashJaccardErr(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashEstSignatures(docShinglesShared(spark, dir))
    val sa = sig.select(col("doc_id").as("doc_a") +:
      (0 until minhashK).map(i => col(s"h$i").as(s"a$i")): _*)
    val sb = sig.select(col("doc_id").as("doc_b") +:
      (0 until minhashK).map(i => col(s"h$i").as(s"b$i")): _*)
    val agree = (0 until minhashK).map(i =>
      when(col(s"a$i") === col(s"b$i"), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    jaccardPairsShared(spark, dir)
      .join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("agree", agree)
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("agree"),
        (col("agree").cast("double") / minhashK).as("jaccard_est"),
        abs(col("jaccard") - col("agree").cast("double") / minhashK)
          .as("abs_err"))
      .orderBy("doc_a", "doc_b")
  }

  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // one materialized shingle table feeds BOTH the signature build and
    // the exact-Jaccard verification below — previously two full
    // tokenize+explode passes over the corpus
    val sh = docShinglesShared(spark, dir)
    val bands = signatureBandsShared(spark, dir)
    // per-query LAZY localCheckpoint (r15): the candidate pairs are
    // consumed twice below (the verify join AND the array-build prune) —
    // without the lineage barrier each consumer would replay the band
    // self-join. The r14 EAGER checkpoint paid a separate driver-
    // synchronized job before the query proper ran; lazy keeps the
    // single-evaluation guarantee (the RDD's partitions cache on first
    // compute and both consumers read the same blocks) while the whole
    // query schedules as one job — the fixed cost that made this entry
    // 0.54 → 0.78 s at sf0.1 (driver-measured) is gone.
    val candidates = bands.as("a")
      .join(bands.as("b"), Seq("band", "slice"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint(false)
    // verify candidates with exact Jaccard against per-doc shingle ARRAYS
    // (r14, the prefixJaccardPairs idiom): the per-shingle semi-join shape
    // streamed every candidate's full shingle list through a (doc_b, sh)
    // exchange and re-aggregated by pair. Grouping the shingle table once
    // per doc and intersecting arrays in-task computes the identical
    // count — per-doc shingles are DISTINCT by construction
    // (array_distinct at the shingle source) — with no per-shingle shuffle
    // rows and no post-join aggregation. A candidate pair with an empty
    // intersection scores jaccard = 0 < t and is filtered exactly as the
    // inner shingle join dropped it. The array build is semi-join PRUNED
    // to docs that appear in some candidate pair (guide §3.2): LSH
    // candidates cover a small fraction of a mostly-unique corpus, and
    // collect_list over the full table would push every shingle byte
    // through the doc_id exchange for arrays the inner joins below never
    // read. Pruning first keeps the heavy exchange proportional to the
    // candidate set.
    val candDocs = candidates.select(col("doc_a").as("doc_id"))
      .union(candidates.select(col("doc_b").as("doc_id"))).distinct()
    // the pruned array table is ALSO consumed twice (one join per pair
    // side) — the r14 plan computed the whole prune + collect_list
    // subtree once per side, i.e. the full shingle table crossed its
    // doc_id exchange TWICE per query (the captured r14 after-plan shows
    // both copies). A lazy checkpoint materializes it once; the verify
    // joins then probe candidate-proportional cached blocks.
    val docArrays = sh.join(candDocs, Seq("doc_id"), "left_semi")
      .groupBy("doc_id")
      .agg(collect_list(col("sh")).as("shs"), count(lit(1)).as("n"))
      .localCheckpoint(false)
    candidates
      .join(docArrays.toDF("doc_a", "shs_a", "na"), "doc_a")
      .join(docArrays.toDF("doc_b", "shs_b", "nb"), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Cross-engine 60-bit token hash: the leading 15 hex chars of md5,
    * parsed as an integer. md5 is bit-identical in Spark and DuckDB, and
    * 60 bits stays clear of BIGINT sign-bit overflow in both engines —
    * which makes every simhash computation integer-exact and therefore
    * SQL-oracle-able (the reason this replaces the earlier xxhash64).
    * The Spark side reads the same 60 bits off the raw digest inside
    * [[graft.functions.Simhash60]]; the DuckDB oracle keeps the hex
    * form via [[graft.functions.TextFunctions.md5IntSql]]. */
  val simhashBits = 60

  /** SimHash fingerprints: sign-sum of the 60 bit positions of
    * md5-60(token) weighted by term frequency. All-integer arithmetic —
    * no float tie risk anywhere in the pipeline.
    *
    * ZERO shuffles (r14; was one): a SimHash fingerprint is a pure
    * per-document function, so the whole computation — one md5 per
    * token occurrence (summing ±1 per occurrence equals summing ±tf
    * per type), 60 sign counters, the final bit assembly — runs inside
    * the scan projection as one codegen'd kernel
    * ([[graft.functions.Simhash60]]). The earlier aggregate form
    * exploded every occurrence and carried 60 conditional-sum states
    * over a doc_id exchange; at 100 TB neither the occurrence explosion
    * nor the exchange needs to exist. The `size > 0` filter mirrors the
    * aggregate form exactly: a zero-token document produced no exploded
    * rows and therefore no fingerprint row. Integer-exact — the kernel
    * reads the top 60 bits straight off the raw md5 digest, pinned
    * equal to `conv(substring(md5(w),1,15),16,10)` generatively
    * (PropertiesSpec) and corpus-wide by the DuckDB oracle. */
  def simhashFingerprint(spark: SparkSession, dir: String): DataFrame =
    toks(spark, dir)
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"),
        graft.functions.Simhash60.simhash60(col("ws")).as("simhash"))

  /** SimHash near-dup pairs via 15-bit banding (4 bands over 60 bits —
    * pigeonhole-complete for Hamming distance ≤ 3), verified by exact
    * popcount distance. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    // bands derived from the constants so a retune cannot leave bits
    // uncovered; completeness for Hamming ≤ 3 needs ≥ 4 bands
    val nBands = simhashBits / simhashBandBits
    require(nBands * simhashBandBits == simhashBits && nBands >= 4,
      s"banding must tile all $simhashBits bits with ≥ 4 bands")
    // materialize the fingerprint once (r14): the band self-join below
    // replays BOTH its input branches, and the broadcast side replays the
    // whole subtree too — so without a lineage barrier the md5-per-token
    // Simhash60 kernel ran once per branch AND once more inside each
    // branch's join-key null filter (isnotnull(key) derives from simhash):
    // up to 4 kernel passes over the corpus for one fingerprint table.
    // localCheckpoint (the PageRank/shingle-memo idiom, computed fresh
    // per run) pins it to exactly one pass; the fingerprint table is
    // 16 bytes/doc, distributed. The fingerprint build itself is
    // shuffle-free (no orderBy — the old range exchange served nothing;
    // the registered query orders its own output).
    val fp = simhashFingerprint(spark, dir).localCheckpoint()
    val bands = fp.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until nBands).map(b =>
        shiftright(col("simhash"), b * simhashBandBits)
          .bitwiseAND((1L << simhashBandBits) - 1)): _*)))
      .toDF("doc_id", "simhash", "band", "key")
    bands.as("a").join(bands.as("b"), Seq("band", "key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("fa"), col("b.simhash").as("fb"))
      .distinct()
      // cast: Spark bit_count is INT, DuckDB's is TINYINT — BIGINT on
      // both sides keeps the oracle schema compare exact
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Near-dup CLUSTERS: connected components over the Jaccard pair graph
    * — the production dedup shape (pairs → groups → keep one
    * representative). Emits every clustered doc with its component
    * representative. */
  val ccIterations = 10

  /** Distributed connected components by min-label propagation WITH
    * pointer doubling (the hash-to-min family — Rastogi et al., "Finding
    * connected components in MapReduce", ICDE 2013): each round every
    * node (1) adopts the minimum label in its neighborhood, then
    * (2) jumps to its label's label. The jump is what makes the round
    * count O(log diameter) instead of O(diameter) — [[ccIterations]]
    * rounds cover components of diameter ≈ 2^[[ccIterations]], so a
    * chain-shaped near-dup component (the adversarial case for plain
    * propagation) converges instead of silently truncating.
    *
    * Convergence is REQUIRED, loudly: if the cap is ever hit while a
    * round still changed labels, this throws rather than returning
    * partially-propagated clusters — wrong clusters at corpus scale
    * would silently drop the wrong documents downstream. */
  private[graft] def connectedComponents(pairs: DataFrame,
      maxRounds: Int = ccIterations): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.toDF("a", "b")
      .unionByName(pairs.toDF("b", "a").select("a", "b"))
      .toDF("node", "peer")
      .cache()
    // Loop width from the GRAPH, not the session default (r15; the PPR
    // loopWidthFor play, guide §2): each round runs ~6 exchanges over
    // (node, label) longs, and a near-dup pair graph is output-sized —
    // hundreds of rows at fixture scale — so 32 fixed partitions mean
    // rounds of ~200 empty-task launches (dedup_survivors' 0.70 8-core
    // ratio: 32 cores pay pure orchestration). ~1 MB of label rows per
    // partition, floor 4, capped; width grows linearly with the pair
    // graph at corpus scale. The width comes from an EXACT count of the
    // (materialized, checkpoint-cached) pair artifact — the Catalyst
    // size statistic of a checkpointed LogicalRDD is a join-shape
    // overestimate that clamped straight to the cap when tried.
    // Results are width-independent: every per-round operator is an
    // integer min/least — no FP summation order anywhere in the loop.
    val spark = pairs.sparkSession
    val ccWidth = (pairs.count() * 32L / (1L << 20)).min(4096).max(4).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", ccWidth)
    try {
      var labels = edges.select(col("node")).distinct()
        .withColumn("label", col("node"))
        .localCheckpoint(true)
      var converged = false
      var iter = 0
      while (!converged && iter < maxRounds) {
        // (1) neighborhood min — one shuffle keyed by node
        val stepped = edges
          .join(labels.toDF("peer", "peerLabel"), "peer")
          .groupBy("node").agg(min("peerLabel").as("nbrMin"))
          .join(labels, "node")
          .select(col("node"), least(col("label"), col("nbrMin")).as("l1"))
        // (2) pointer jump: l2 = label(l1). Every label value is a node id
        // of the same component, so the lookup join always hits; the left
        // join + coalesce is belt-and-braces against an empty lookup.
        // carry the changed-flag inside the checkpointed round so the
        // convergence probe only scans checkpointed partitions
        val next = stepped
          .join(stepped.toDF("jumpKey", "l2"), col("l1") === col("jumpKey"), "left")
          .select(col("node"), coalesce(col("l2"), col("l1")).as("label"))
          .join(labels.toDF("node", "prev"), "node")
          .select(col("node"), col("label"),
            (col("label") < col("prev")).as("changed"))
          .localCheckpoint(true)
        converged = next.filter(col("changed")).isEmpty
        labels = next.select("node", "label")
        iter += 1
      }
      require(converged,
        s"connected components did not converge in $maxRounds pointer-doubling " +
          s"rounds (component diameter > ~2^$maxRounds) — refusing to return " +
          "partially-propagated clusters")
      labels
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      edges.unpersist()
    }
  }

  /** Dedup telemetry: log2 histogram of near-dup cluster sizes — the
    * number every dedup run reads before trusting its survivors (a fat
    * tail means a boilerplate template or a broken shingle threshold).
    * Every cluster has size >= 2 by construction — singletons never
    * enter the pair graph. Same exact-integer
    * bucket arithmetic as key_skew_profile (`length(bin(n))-1`), over
    * the memoized cluster artifact — marginal cost is one ≤|clusters|
    * aggregation. */
  def dedupClusterProfile(spark: SparkSession, dir: String): DataFrame =
    dedupClusters(spark, dir)
      .groupBy("cluster_rep").agg(count(lit(1)).as("n"))
      .groupBy((length(bin(col("n"))) - 1).cast("long").as("log2_bucket"))
      .agg(count(lit(1)).as("n_clusters"), max(col("n")).as("max_size"),
        sum(col("n")).as("n_docs"))
      .orderBy("log2_bucket")

  /** Per-source duplicate-rate scoreboard — the curation metric that
    * decides which feeds are worth re-crawling: for each document
    * source, how many docs sit in near-dup clusters and how many a
    * survivor pass would drop (cluster members that are not the
    * representative). One left join of documents against the memoized
    * cluster artifact + a grouped conditional aggregate; dup_rate is
    * one exact-integer division rounded at 6dp on both engines. */
  def dedupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
    val clusters = dedupClusters(spark, dir).select("doc_id", "cluster_rep")
    docs.join(clusters, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(col("cluster_rep")).as("n_clustered"),
        sum(when(col("cluster_rep").isNotNull &&
            col("cluster_rep") =!= col("doc_id"), 1L).otherwise(0L))
          .as("n_dropped"))
      .withColumn("dup_rate", round(col("n_dropped") / col("n_docs"), 6))
      .orderBy("source")
  }

  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    // the verified pair graph is the memoized artifact shared with
    // dedup_survivors — the quadratic shingle self-join runs once per
    // (session, dir), not once per downstream query
    val pairs = jaccardPairsShared(spark, dir).select("doc_a", "doc_b")
    connectedComponents(pairs)
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("label")))
      .select(col("node").as("doc_id"), col("label").as("cluster_rep"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  /** The consumable end of the pipeline: the deduplicated corpus. Every
    * doc survives except non-representative members of a near-dup
    * cluster. Anti-join against the cluster table — at scale this is the
    * one pass that actually shrinks the dataset. */
  def dedupSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val dropped = dedupClusters(spark, dir)
      .filter(col("doc_id") =!= col("cluster_rep"))
      .select("doc_id")
    Tables.documents(spark, dir)
      .join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Quality-aware survivor selection — production near-dup pipelines
    * keep the BEST duplicate, not the first (a boilerplate-wrapped copy
    * of a clean article should lose to the clean one): per cluster, the
    * member with the highest [[TextQuality.docQuality]] score becomes
    * the kept representative, ties broken by lowest doc_id. Consumes
    * the same memoized pair graph as [[dedupClusters]]; the marginal
    * plan is one doc_id equi-join against the map-only quality scan
    * plus a per-cluster row_number window — the bounded-PQ top-k shape
    * with k = 1, over a cluster table that is small relative to the
    * corpus (only docs with ≥ 1 near-dup pair appear in it). */
  def dedupBestSurvivor(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextQuality.docQuality(spark, dir).select("doc_id", "quality")
    val w = Window.partitionBy("cluster_rep").orderBy(desc("quality"), col("doc_id"))
    dedupClusters(spark, dir)
      .join(quality, "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("cluster_rep"), col("doc_id").as("best_doc"),
        col("quality").as("best_quality"), col("cluster_size"))
      .orderBy("cluster_rep")
  }

  /** Leakage-safe train/val/test split — the eval-hygiene step AFTER
    * near-dup clustering: a document's split is decided by the md5
    * bucket of its CLUSTER representative (unclustered docs are their
    * own group), so near-duplicates can never straddle a split boundary
    * and leak held-out content into training — splitting on the raw
    * doc_id hash would put two 0.9-Jaccard copies of the same article
    * on opposite sides of the train/test fence. Deterministic and
    * engine-portable (the md5-bucket discipline of sample_stratified).
    *
    * Scale shape: the cluster table holds only docs with ≥ 1 near-dup
    * pair — a small fraction of the corpus — so the doc_id equi-join is
    * cheap (and broadcastable when the cluster table is small); the
    * bucket + split assignment is a map-only hash over the join
    * output. */
  val splitTrainPermille = 900
  val splitValPermille = 950

  def splitLeakageSafe(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(dedupClusters(spark, dir).select("doc_id", "cluster_rep"),
        Seq("doc_id"), "left")
      .withColumn("group_rep", coalesce(col("cluster_rep"), col("doc_id")))
      .withColumn("bucket",
        pmod(md5Int(col("group_rep").cast("string"), 15), lit(1000L)))
      .withColumn("split",
        when(col("bucket") < splitTrainPermille, lit("train"))
          .when(col("bucket") < splitValPermille, lit("val"))
          .otherwise(lit("test")))
      .select("doc_id", "group_rep", "bucket", "split")
      .orderBy("doc_id")

  /** Benchmark decontamination — the training-data hygiene pass that
    * flags corpus documents overlapping a held-out evaluation set
    * (n-gram collision, the standard contamination test: see e.g. the
    * GPT-3 appendix C / Dodge et al. 2021 C4 audit methodology — both
    * public): any corpus doc sharing word-3-grams with a benchmark doc
    * gets its overlap counted; docs whose shingle set is ≥
    * [[contamThreshold]] covered by benchmark shingles are flagged for
    * removal.
    *
    * The benchmark here is a deterministic held-out slice (doc_id ≡
    * [[benchRem]] mod [[benchMod]] — stands in for a real eval suite).
    * Scale shape: a benchmark suite is FIXED SIZE (thousands of docs,
    * millions of shingles) regardless of corpus size, so its distinct
    * shingle set is explicitly `broadcast()` — the corpus side streams
    * map-only through the hash join, and the only shuffle is the per-doc
    * overlap count. No corpus×corpus product anywhere, unlike the dedup
    * self-joins. */
  val benchMod = 50
  val benchRem = 7
  val contamThreshold = 0.5

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShinglesShared(spark, dir)
    val benchSh = sh.filter(col("doc_id") % benchMod === benchRem)
      .select("sh").distinct()
    val corpus = sh.filter(col("doc_id") % benchMod =!= benchRem)
    val sizes = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val overlap = corpus.join(broadcast(benchSh), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    // single int/int division ships raw (bit-identical cross-engine);
    // the flag threshold applies to that same raw value on both sides
    overlap.join(sizes, "doc_id")
      .withColumn("contam_ratio",
        col("n_overlap").cast("double") / col("n_shingles"))
      .withColumn("flagged", col("contam_ratio") >= contamThreshold)
      .select("doc_id", "n_overlap", "n_shingles", "contam_ratio", "flagged")
      .orderBy("doc_id")
  }

  /** Bloom-filter sizing for [[decontaminateBloom]]: 2^22 bits (512 KiB
    * broadcast) and k=5 probes. Production rule: m ≈ 10–15 bits per
    * expected benchmark shingle (FP ≈ 0.5–1%); at a 10^9-shingle eval
    * suite that is a ~1.5 GB bitset versus a ≥30 GB broadcast of the
    * exact shingle strings — the 20× that makes the broadcast fit at
    * all. FP rate degrades only verify VOLUME, never output. */
  val bloomBits = 1 << 22
  val bloomK = 5

  /** Benchmark decontamination with a BLOOM-PRUNED probe — the same
    * output as [[decontaminate]], row for row (the oracle is the exact
    * SQL verbatim), restructured for the regime where the benchmark
    * suite's shingle set is too large to broadcast as strings:
    *  1. BUILD: the benchmark shingles' k probe positions (codegen'd
    *     xxhash64 column expressions) aggregate into one fixed-size
    *     bitset via the OR-monoid [[graft.functions.BloomFilter]] —
    *     map-side partial bitsets, one ~m/8-byte row out.
    *  2. PRUNE: the corpus shingle stream crossJoins the single bitset
    *     row (broadcast by construction) and keeps only might-contain
    *     hits — map-only, no shuffle, no false negatives (builder and
    *     prober evaluate the SAME position expressions).
    *  3. VERIFY: only the surviving rows (true overlaps + the ~0.5% FP
    *     band) equi-join the exact benchmark shingle set — now a
    *     SHUFFLE join on a tiny fraction of the corpus, so the exact
    *     set never needs to be broadcast — and the per-doc overlap
    *     count/ratio/flag proceed exactly as [[decontaminate]].
    * False positives die in step 3 (they match no exact row), so the
    * result is bit-identical to the exact pipeline at every scale. */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BloomFilter
    val sh = docShinglesShared(spark, dir)
    val isBench = col("doc_id") % benchMod === benchRem
    val benchSh = sh.filter(isBench).select("sh").distinct()
    val corpus = sh.filter(!isBench)
    // 1. build: explode each benchmark shingle into its k positions, OR
    // them into one bitset row
    val bloomAgg = udaf(new BloomFilter.BitsetAgg(bloomBits))
    val positions = benchSh.select(explode(array(
      (0 until bloomK).map(i =>
        BloomFilter.position(col("sh"), i, bloomBits.toLong)): _*)).as("pos"))
    val bloom = positions.agg(bloomAgg(col("pos")).as("bloom"))
    // 2. prune: map-only might-contain over the corpus shingle stream
    val hits = corpus.crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bloom"), col("sh"), bloomK, bloomBits.toLong))
      .select("doc_id", "sh")
    // 3. verify + count: the decontaminate tail, with the exact set on
    // the SHUFFLE side (deliberately no broadcast hint — the point)
    val sizes = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val overlap = hits.join(benchSh, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    overlap.join(sizes, "doc_id")
      .withColumn("contam_ratio",
        col("n_overlap").cast("double") / col("n_shingles"))
      .withColumn("flagged", col("contam_ratio") >= contamThreshold)
      .select("doc_id", "n_overlap", "n_shingles", "contam_ratio", "flagged")
      .orderBy("doc_id")
  }

  /** Incremental dedup — the daily-ingest shape: near-dups of a NEW
    * batch against the EXISTING corpus only (new×old; new×new intra-batch
    * dups are the self-dedup's job). The batch here is the deterministic
    * slice doc_id ≡ [[incrementalRem]] mod [[incrementalMod]] — a
    * stand-in for "today's crawl".
    *
    * Scale shape — the reason this exists as its own operator: a full
    * re-dedup of corpus+batch costs (N+B)² work; the incremental form
    * costs B×occupancy. The corpus-side minhash signatures are a
    * PERSISTED artifact in production (built once, appended per batch —
    * here they come from the same memoized signature build), so each
    * ingest only computes signatures for B new docs, bucket-joins them
    * against the standing band index, and exact-verifies the candidates.
    * Nothing rescans the old corpus text except the verification join on
    * the candidates' own shingles. */
  val incrementalMod = 4
  val incrementalRem = 3

  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShinglesShared(spark, dir)
    val bands = signatureBandsShared(spark, dir)
    val isNew = col("doc_id") % incrementalMod === incrementalRem
    // LAZY localCheckpoint for the same two-consumer reason (and the same
    // r15 one-job rationale) as dedupMinhashLsh
    val candidates = bands.filter(isNew).toDF("doc_new", "band", "slice")
      .join(bands.filter(!isNew).toDF("doc_old", "band", "slice"),
        Seq("band", "slice"))
      .select("doc_new", "doc_old").distinct()
      .localCheckpoint(false)
    // per-doc-array verify with candidate-doc semi-join pruning, same
    // idiom (and equivalence argument) as dedupMinhashLsh (r14); pruning
    // matters MOST here — the new-slice candidate set touches only
    // ~1/incrementalMod of the corpus plus its band matches
    val candDocs = candidates.select(col("doc_new").as("doc_id"))
      .union(candidates.select(col("doc_old").as("doc_id"))).distinct()
    // built once behind a lazy checkpoint (r15) — see dedupMinhashLsh:
    // each verify-join side otherwise replays the prune + collect_list
    val docArrays = sh.join(candDocs, Seq("doc_id"), "left_semi")
      .groupBy("doc_id")
      .agg(collect_list(col("sh")).as("shs"), count(lit(1)).as("n"))
      .localCheckpoint(false)
    candidates
      .join(docArrays.toDF("doc_new", "shs_a", "na"), "doc_new")
      .join(docArrays.toDF("doc_old", "shs_b", "nb"), "doc_old")
      .withColumn("inter",
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("doc_new", "doc_old", "jaccard")
      .orderBy("doc_new", "doc_old")
  }

  /** Exact-substring SPAN dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"): instead of dropping
    * whole near-duplicate documents, find the duplicated text RANGES —
    * runs of ≥ [[spanK]] consecutive tokens that occur more than once
    * anywhere in the corpus — so a pipeline can cut the spans and keep
    * the unique remainder. The suffix-array construction of the paper
    * is replaced by the shuffle-friendly k-gram equivalent: every
    * length-k token window whose gram occurs ≥ 2× globally marks its
    * [start, start+k) interval duplicated, and overlapping marks merge
    * into maximal spans — exactly the substrings of length ≥ k that
    * repeat, positions included.
    *
    * Scale shape: grams shuffle as 60-bit md5 LONGS, not strings (the
    * hash is computed identically in DuckDB, so even a collision —
    * p ≈ n²/2⁶⁰ — cannot break engine parity); the duplicated-gram
    * filter is a COUNT WINDOW over g, not an aggregate + semi-join —
    * one shuffle computes the occurrence count AND keeps the rows, and
    * the gram explode evaluates exactly once (the agg+join form both
    * re-evaluates the explode for the probe side and shuffles it a
    * second time); the interval merge is the classic gaps-and-islands
    * double window over (doc_id ORDER BY start) — one more shuffle,
    * already clustered for both window passes and the final group.
    * Caveat at scale: a pathologically hot gram (shared boilerplate)
    * skews its g-partition; the standard salt-count-recombine play
    * applies if a corpus ever exhibits it (count ≥ 2 needs only a
    * per-salt partial + max, not exact totals). */
  val spanK = 8

  def dedupSpans(spark: SparkSession, dir: String): DataFrame = {
    val k = spanK
    val occ = toks(spark, dir)
      .filter(size(col("ws")) >= k)
      // codegen'd k-gram loop; position i in the array IS the window
      // start, exactly as the transform(sequence) form indexed it (r6g)
      .select(col("doc_id"),
        posexplode(graft.functions.NgramStrings.ngram_strings(col("ws"), k))
          .as(Seq("s", "gram")))
      .select(col("doc_id"), col("s"), md5Int(col("gram"), 15).as("g"))
    val d = occ
      .withColumn("c", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("c") >= 2)
      .select(col("doc_id"), col("s"), (col("s") + k).as("e"))
    val w = Window.partitionBy("doc_id").orderBy("s")
    d.withColumn("prev_max",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island",
        sum(when(col("prev_max").isNull || col("s") > col("prev_max"), 1)
          .otherwise(0)).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("s").as("span_start"), max("e").as("span_end"))
      .select("doc_id", "span_start", "span_end")
      .orderBy("doc_id", "span_start")
  }

  /** The span consumer: MATERIALIZE the span-cleaned corpus — every
    * token inside a duplicated range is cut and the survivors re-join
    * in position order (aggressive remove-all policy: simple,
    * deterministic, and the conservative direction for training data —
    * documented alternative keep-first needs a global occurrence order
    * and buys back little). Output is one row per AFFECTED doc with the
    * removed-token count and the cleaned text. The span join carries a
    * doc_id equality conjunct (range predicate rides along), and spans
    * per doc are few, so the anti-join fans out per-span, not
    * per-corpus. */
  def dedupSpansClean(spark: SparkSession, dir: String): DataFrame = {
    val spans = dedupSpans(spark, dir)
    val t = toks(spark, dir)
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w"))).as("t")
    val kept = t.join(spans.as("s"),
      col("t.doc_id") === col("s.doc_id") &&
        col("t.pos") >= col("s.span_start") && col("t.pos") < col("s.span_end"),
      "left_anti")
    spans.groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start")).as("n_removed"))
      .join(kept, Seq("doc_id"), "left")
      .groupBy(col("doc_id"), col("n_removed"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          e => e.getField("w")), " ").as("clean_text"))
      .select("doc_id", "n_removed", "clean_text")
      .orderBy("doc_id")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_spans" -> (dedupSpans _),
    "dedup_spans_clean" -> (dedupSpansClean _),
    "decontaminate" -> (decontaminate _),
    "decontaminate_bloom" -> (decontaminateBloom _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_cluster_profile" -> (dedupClusterProfile _),
    "dedup_rate_by_source" -> (dedupRateBySource _),
    "dedup_survivors" -> (dedupSurvivors _),
    "dedup_best_survivor" -> (dedupBestSurvivor _),
    "split_leakage_safe" -> (splitLeakageSafe _),
    "dedup_exact" -> (dedupExact _),
    "dedup_edit_distance" -> (dedupEditDistance _),
    "dedup_edit_distance2" -> (dedupEditDistance2 _),
    "dedup_edit_distance_sample" -> (dedupEditDistanceSample _),
    "dedup_edit_distance2_sample" -> (dedupEditDistance2Sample _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_jaccard_prefix" -> (dedupJaccardPrefix _),
    "dedup_containment" -> (dedupContainment _),
    "dup_ngram_coverage" -> (dupNgramCoverage _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "minhash_jaccard_err" -> (minhashJaccardErr _),
    "dedup_simhash" -> (dedupSimhash _))

  private val shingleSql =
    s"""toks AS (
         SELECT doc_id,
                ${graft.functions.TextFunctions.tokenizeSql} AS ws
         FROM documents),
       sh AS (
         SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS sh
         FROM toks, unnest(range(1, len(ws) - 1)) AS u(i)
         WHERE len(ws) >= 3)"""

  /** Oracle mirror of the stop-shingle guard: the capped (doc, shingle)
    * set. The Spark plan and the oracle apply the SAME cap, so they agree
    * at every scale — including one where the cap actually binds — rather
    * than only where every shingle frequency is under the cap. */
  private val cappedShingleSql =
    s"""shc AS (
         SELECT s.doc_id, s.sh FROM sh s
         JOIN (SELECT sh FROM sh GROUP BY sh
               HAVING count(*) <= $maxShingleFreq) ok USING (sh))"""

  /** The near-dup cluster CTE chain (capped shingles → verified Jaccard
    * pairs → recursive min-label reachability → per-doc component),
    * ending at `comp(doc_id, cluster_rep)`. Needs `WITH RECURSIVE`.
    * Shared by the four cluster-consuming oracles (clusters, survivors,
    * best-survivor, leakage-safe split). */
  private val clusterCteSql =
    s"""$shingleSql,
        $cappedShingleSql,
        sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT doc_a, doc_b FROM inter
          JOIN sz x ON doc_a = x.doc_id
          JOIN sz y ON doc_b = y.doc_id
          WHERE i::DOUBLE / (x.n + y.n - i) >= $jaccardThreshold),
        edges AS (
          SELECT doc_a AS node, doc_b AS peer FROM pairs
          UNION ALL
          SELECT doc_b, doc_a FROM pairs),
        reach(node, rep) AS (
          SELECT node, node FROM (SELECT DISTINCT node FROM edges)
          UNION
          SELECT e.peer, r.rep FROM reach r JOIN edges e ON e.node = r.node),
        comp AS (
          SELECT node AS doc_id, min(rep) AS cluster_rep FROM reach GROUP BY node)"""

  /** The dedup_spans CTE chain (k-gram → duplicated set → gaps-and-
    * islands merge), shared with the span-removal oracle. Gram hashes
    * are the identical md5-60-bit longs both engines compute, so they
    * agree even on a (vanishingly unlikely) collision. */
  private val spanCteSql =
    s"""toks AS (
          SELECT doc_id,
                 ${graft.functions.TextFunctions.tokenizeSql} AS ws
          FROM documents),
        occ AS (
          SELECT doc_id, i AS s,
                 ${md5IntSql(s"array_to_string(ws[i + 1:i + $spanK], ' ')", 15)} AS g
          FROM toks, unnest(range(len(ws) - $spanK + 1)) AS u(i)
          WHERE len(ws) >= $spanK),
        dup AS (SELECT g FROM occ GROUP BY g HAVING count(*) >= 2),
        d AS (SELECT doc_id, s, s + $spanK AS e
              FROM occ WHERE g IN (SELECT g FROM dup)),
        m AS (SELECT doc_id, s, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
              FROM d),
        isl AS (SELECT doc_id, s, e,
                       sum(CASE WHEN prev_max IS NULL OR s > prev_max
                                THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY s) AS island
                FROM m),
        spans AS (
          SELECT doc_id, min(s) AS span_start, max(e) AS span_end
          FROM isl GROUP BY doc_id, island)"""

  val oracleSql: Map[String, String] = Map(
    "dedup_spans" ->
      s"""WITH $spanCteSql
          SELECT doc_id, span_start, span_end FROM spans
          ORDER BY doc_id, span_start""",
    // span REMOVAL: every token whose position falls inside any span is
    // cut; survivors re-join in position order
    "dedup_spans_clean" ->
      s"""WITH $spanCteSql,
          tok AS (
            SELECT doc_id, i AS pos, ws[i + 1] AS w
            FROM toks, unnest(range(len(ws))) AS u(i)),
          kept AS (
            SELECT t.doc_id, t.pos, t.w FROM tok t
            WHERE NOT EXISTS (
              SELECT 1 FROM spans s
              WHERE s.doc_id = t.doc_id
                AND t.pos >= s.span_start AND t.pos < s.span_end)),
          nrem AS (
            SELECT doc_id, sum(span_end - span_start)::BIGINT AS n_removed
            FROM spans GROUP BY doc_id)
          SELECT n.doc_id, n.n_removed,
                 coalesce(string_agg(k.w, ' ' ORDER BY k.pos), '') AS clean_text
          FROM nrem n LEFT JOIN kept k ON k.doc_id = n.doc_id
          GROUP BY n.doc_id, n.n_removed
          ORDER BY n.doc_id""",
    "decontaminate" ->
      s"""WITH $shingleSql,
          bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % $benchMod = $benchRem),
          corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id % $benchMod <> $benchRem),
          sz AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
          ov AS (SELECT doc_id, count(*) AS n_overlap
                 FROM corpus JOIN bsh USING (sh) GROUP BY doc_id)
          SELECT o.doc_id, n_overlap, n_shingles,
                 n_overlap::DOUBLE / n_shingles AS contam_ratio,
                 n_overlap::DOUBLE / n_shingles >= $contamThreshold AS flagged
          FROM ov o JOIN sz USING (doc_id)
          ORDER BY doc_id""",
    // deliberately the EXACT pipeline's SQL verbatim: the bloom prune is
    // lossless by construction (no false negatives; false positives die
    // in the exact verify join), so the oracle states the semantics with
    // zero bloom logic restated — a fully independent gate
    "decontaminate_bloom" ->
      s"""WITH $shingleSql,
          bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % $benchMod = $benchRem),
          corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id % $benchMod <> $benchRem),
          sz AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
          ov AS (SELECT doc_id, count(*) AS n_overlap
                 FROM corpus JOIN bsh USING (sh) GROUP BY doc_id)
          SELECT o.doc_id, n_overlap, n_shingles,
                 n_overlap::DOUBLE / n_shingles AS contam_ratio,
                 n_overlap::DOUBLE / n_shingles >= $contamThreshold AS flagged
          FROM ov o JOIN sz USING (doc_id)
          ORDER BY doc_id""",
    // Same banding-recall-completeness argument as dedup_minhash_lsh
    // (below): the oracle is the exhaustive cross-side pair set, which
    // the banded candidates recover exactly on this corpus. Uncapped
    // shingles on both sides, like the minhash path.
    "dedup_incremental" ->
      s"""WITH $shingleSql,
          sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_new, b.doc_id AS doc_old, count(*) AS i
            FROM sh a JOIN sh b ON a.sh = b.sh
            WHERE a.doc_id % $incrementalMod = $incrementalRem
              AND b.doc_id % $incrementalMod <> $incrementalRem
            GROUP BY 1, 2)
          SELECT doc_new, doc_old, i::DOUBLE / (x.n + y.n - i) AS jaccard
          FROM inter
          JOIN sz x ON doc_new = x.doc_id
          JOIN sz y ON doc_old = y.doc_id
          WHERE i::DOUBLE / (x.n + y.n - i) >= $jaccardThreshold
          ORDER BY doc_new, doc_old""",
    // The LSH output is DEFINED as "candidate pairs verified by exact
    // Jaccard ≥ τ", so the exhaustive-pairs oracle matches exactly iff
    // banding recall is complete on this corpus. It is, by a wide margin:
    // a true τ=0.8 pair escapes all 16 bands with p = (1−0.8⁴)¹⁶ ≈ 2e-4,
    // and the planted near-dups sit at J ≈ 0.98 (p ≈ 2e-18); the
    // hash-compare at sf0.01 and the sf0.1 sweep both confirm equality.
    // Uncapped shingles on both sides (the minhash path does not apply
    // the stop-shingle guard — banding already bounds its fan-out).
    "dedup_minhash_lsh" ->
      s"""WITH $shingleSql,
          sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT doc_a, doc_b, i::DOUBLE / (x.n + y.n - i) AS jaccard
          FROM inter
          JOIN sz x ON doc_a = x.doc_id
          JOIN sz y ON doc_b = y.doc_id
          WHERE i::DOUBLE / (x.n + y.n - i) >= $jaccardThreshold
          ORDER BY doc_a, doc_b""",
    // the estimator replayed end-to-end: md5-permutation signatures
    // (min per permutation over the UNCAPPED shingle set), agreement
    // counted against the exact capped pair graph — every value
    // hash-gated, including the abs error itself
    "minhash_jaccard_err" ->
      s"""WITH $shingleSql,
          $cappedShingleSql,
          sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          pairs AS (
            SELECT doc_a, doc_b, i::DOUBLE / (x.n + y.n - i) AS jaccard
            FROM inter
            JOIN sz x ON doc_a = x.doc_id
            JOIN sz y ON doc_b = y.doc_id
            WHERE i::DOUBLE / (x.n + y.n - i) >= $jaccardThreshold),
          perms(i, a, b) AS (VALUES
            ${(0 until minhashK).map(i => s"($i, ${mhA(i)}, ${mhB(i)})")
              .mkString(",\n            ")}),
          hh AS (
            SELECT doc_id,
                   ${graft.functions.TextFunctions.md5IntSql("sh", 15)}
                     % $mhMod AS h
            FROM sh),
          sig AS (
            SELECT doc_id, i, min((a * h + b) % $mhMod) AS h
            FROM hh, perms
            GROUP BY doc_id, i),
          ag AS (
            SELECT p.doc_a, p.doc_b, p.jaccard,
                   sum(CASE WHEN x.h = y.h THEN 1 ELSE 0 END)::BIGINT AS agree
            FROM pairs p
            JOIN sig x ON x.doc_id = p.doc_a
            JOIN sig y ON y.doc_id = p.doc_b AND y.i = x.i
            GROUP BY 1, 2, 3)
          SELECT doc_a, doc_b, jaccard, agree,
                 agree::DOUBLE / $minhashK AS jaccard_est,
                 abs(jaccard - agree::DOUBLE / $minhashK) AS abs_err
          FROM ag ORDER BY doc_a, doc_b""",
    // Full simhash pipeline in SQL: md5-60 token hashes → tf-weighted
    // per-bit sign sums → fingerprint → exhaustive Hamming ≤ 3 pairs.
    // The Spark side bands instead of brute-forcing, but 15-bit×4 banding
    // is pigeonhole-COMPLETE for distance ≤ 3, so the outputs are equal
    // by construction (DedupSpec asserts banded == brute on the same
    // fingerprints); all-integer arithmetic — no float tie risk.
    "dedup_simhash" ->
      s"""WITH toks AS (
           SELECT doc_id,
                  ${graft.functions.TextFunctions.tokenizeSql} AS ws
           FROM documents),
         tf AS (
           SELECT doc_id, w, count(*) AS tf
           FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
           GROUP BY doc_id, w),
         th AS (
           SELECT doc_id, tf,
                  ${graft.functions.TextFunctions.md5IntSql("w", 15)} AS h
           FROM tf),
         bits AS (
           SELECT doc_id, b,
                  sum(CASE WHEN (h >> b) & 1 = 1 THEN tf ELSE -tf END) AS s
           FROM th, unnest(range(0, $simhashBits)) AS u(b)
           GROUP BY doc_id, b),
         fp AS (
           SELECT doc_id,
                  sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
           FROM bits GROUP BY doc_id)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         ORDER BY doc_a, doc_b""",
    // BRUTE-FORCE oracle on purpose: the query's symmetric-delete
    // blocking is an optimization claim, so the oracle enumerates all
    // length-compatible pairs — hash equality proves the blocking
    // complete on the corpus, not just plausible
    "dedup_edit_distance" ->
      """WITH c AS (SELECT c_custkey AS id, lower(c_name) AS s FROM customer),
         p AS (SELECT a.id AS id_a, b.id AS id_b FROM c a JOIN c b
               ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= 1
               AND levenshtein(a.s, b.s) <= 1),
         e AS (SELECT id_a AS cust_id, id_b AS neighbor FROM p
               UNION ALL SELECT id_b, id_a FROM p)
         SELECT cust_id, count(*) AS n_neighbors, min(neighbor) AS min_neighbor
         FROM e GROUP BY cust_id ORDER BY cust_id""",
    // the bounded-sample twin (r14): the same brute oracle on the
    // deterministic two-residue slice — feasible in DuckDB at 10-30x
    // the graded scale, where the corpus-wide form above is
    // hours-by-construction. Completeness on the slice is completeness
    // of the SAME blocking (per-pair structural; see the Scala twin's
    // doc for the argument).
    "dedup_edit_distance_sample" ->
      s"""WITH c AS (SELECT c_custkey AS id, lower(c_name) AS s FROM customer
                     WHERE c_custkey % $edSampleMod IN (${edSampleRems.mkString(", ")})),
         p AS (SELECT a.id AS id_a, b.id AS id_b FROM c a JOIN c b
               ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= 1
               AND levenshtein(a.s, b.s) <= 1),
         e AS (SELECT id_a AS cust_id, id_b AS neighbor FROM p
               UNION ALL SELECT id_b, id_a FROM p)
         SELECT cust_id, count(*) AS n_neighbors, min(neighbor) AS min_neighbor
         FROM e GROUP BY cust_id ORDER BY cust_id""",
    // same brute-force discipline at radius 2: all length-compatible
    // pairs, so hash equality proves the C(n,2)-deletion blocking
    // complete corpus-wide
    "dedup_edit_distance2" ->
      """WITH c AS (SELECT c_custkey AS id, lower(c_name) AS s FROM customer),
         p AS (SELECT a.id AS id_a, b.id AS id_b FROM c a JOIN c b
               ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= 2
               AND levenshtein(a.s, b.s) <= 2),
         e AS (SELECT id_a AS cust_id, id_b AS neighbor FROM p
               UNION ALL SELECT id_b, id_a FROM p)
         SELECT cust_id, count(*) AS n_neighbors, min(neighbor) AS min_neighbor
         FROM e GROUP BY cust_id ORDER BY cust_id""",
    // radius-2 bounded-sample twin (r14) — single residue (ids one
    // class apart already differ in two digits, so ed-2 pairs exist)
    "dedup_edit_distance2_sample" ->
      s"""WITH c AS (SELECT c_custkey AS id, lower(c_name) AS s FROM customer
                     WHERE c_custkey % $edSampleMod = $ed2SampleRem),
         p AS (SELECT a.id AS id_a, b.id AS id_b FROM c a JOIN c b
               ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= 2
               AND levenshtein(a.s, b.s) <= 2),
         e AS (SELECT id_a AS cust_id, id_b AS neighbor FROM p
               UNION ALL SELECT id_b, id_a FROM p)
         SELECT cust_id, count(*) AS n_neighbors, min(neighbor) AS min_neighbor
         FROM e GROUP BY cust_id ORDER BY cust_id""",
    "dedup_exact" ->
      s"""WITH toks AS (
           SELECT doc_id,
                  ${graft.functions.TextFunctions.tokenizeSql} AS ws
           FROM documents)
         SELECT md5(array_to_string(ws, ' ')) AS sig,
                min(doc_id) AS rep_doc_id, count(*) AS n_copies
         FROM toks GROUP BY sig ORDER BY rep_doc_id""",
    "dedup_ngram_jaccard" ->
      s"""WITH $shingleSql,
          $cappedShingleSql,
          sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT doc_a, doc_b, i::DOUBLE / (x.n + y.n - i) AS jaccard
          FROM inter
          JOIN sz x ON doc_a = x.doc_id
          JOIN sz y ON doc_b = y.doc_id
          WHERE i::DOUBLE / (x.n + y.n - i) >= $jaccardThreshold
          ORDER BY doc_a, doc_b""",
    // deliberately the brute-force SQL VERBATIM: prefix filtering is an
    // exact algorithm, so the oracle states the SEMANTICS (all-pairs
    // Jaccard) while the implementation earns its keep on candidate
    // volume — a fully independent gate, no prefix logic restated
    "dedup_jaccard_prefix" ->
      s"""WITH $shingleSql,
          $cappedShingleSql,
          sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT doc_a, doc_b, i::DOUBLE / (x.n + y.n - i) AS jaccard
          FROM inter
          JOIN sz x ON doc_a = x.doc_id
          JOIN sz y ON doc_b = y.doc_id
          WHERE i::DOUBLE / (x.n + y.n - i) >= $jaccardThreshold
          ORDER BY doc_a, doc_b""",
    "dedup_containment" ->
      s"""WITH $shingleSql,
          $cappedShingleSql,
          sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          j AS (
            SELECT doc_a, doc_b, i, x.n AS na, y.n AS nb
            FROM inter JOIN sz x ON doc_a = x.doc_id
                       JOIN sz y ON doc_b = y.doc_id),
          oriented AS (
            SELECT doc_a AS doc_inner, doc_b AS doc_outer, i, na AS n_inner FROM j
            UNION ALL
            SELECT doc_b, doc_a, i, nb FROM j)
          SELECT doc_inner, doc_outer, n_inner,
                 i::DOUBLE / n_inner AS containment
          FROM oriented
          WHERE i * 1000 >= n_inner * $containmentThresholdPermille
          ORDER BY doc_inner, doc_outer""",
    "dup_ngram_coverage" ->
      s"""WITH $shingleSql,
          d AS (SELECT sh AS s, count(*) AS df FROM sh GROUP BY sh),
          tot AS (SELECT sum(df) AS total_occ FROM d)
          SELECT cast(length(bin(df)) - 1 AS BIGINT) AS log2_df,
                 count(*) AS n_shingles, sum(df)::BIGINT AS n_occurrences,
                 max(df) AS max_df,
                 round(sum(df)::DOUBLE / total_occ, 6) AS occ_share
          FROM d, tot GROUP BY 1, total_occ ORDER BY 1""",
    "dedup_clusters" ->
      s"""WITH RECURSIVE $clusterCteSql
          SELECT doc_id, cluster_rep,
                 count(*) OVER (PARTITION BY cluster_rep) AS cluster_size
          FROM comp ORDER BY doc_id""",
    "dedup_rate_by_source" ->
      s"""WITH RECURSIVE $clusterCteSql,
          j AS (
            SELECT d.source, d.doc_id, c.cluster_rep
            FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
          SELECT source, count(*) AS n_docs,
                 count(cluster_rep) AS n_clustered,
                 cast(coalesce(sum(CASE WHEN cluster_rep IS NOT NULL
                                         AND cluster_rep <> doc_id
                                        THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_dropped,
                 round(coalesce(sum(CASE WHEN cluster_rep IS NOT NULL
                                          AND cluster_rep <> doc_id
                                         THEN 1 ELSE 0 END), 0)
                       / count(*), 6) AS dup_rate
          FROM j GROUP BY source ORDER BY source""",
    "dedup_cluster_profile" ->
      s"""WITH RECURSIVE $clusterCteSql,
          sizes AS (SELECT cluster_rep, count(*) AS n FROM comp GROUP BY 1)
          SELECT cast(length(bin(n)) - 1 AS BIGINT) AS log2_bucket,
                 count(*) AS n_clusters, max(n) AS max_size,
                 cast(sum(n) AS BIGINT) AS n_docs
          FROM sizes GROUP BY 1 ORDER BY 1""",
    "dedup_survivors" ->
      s"""WITH RECURSIVE $clusterCteSql,
          dropped AS (
            SELECT doc_id FROM comp WHERE doc_id <> cluster_rep)
          SELECT d.doc_id, d.n_chars
          FROM documents d
          WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
          ORDER BY d.doc_id""",
    // cluster chain + the proven doc_quality formula + a k=1 window;
    // ties on the 6dp-rounded quality break to the lowest doc_id on
    // both engines
    "dedup_best_survivor" ->
      s"""WITH RECURSIVE $clusterCteSql,
          csz AS (
            SELECT doc_id, cluster_rep,
                   count(*) OVER (PARTITION BY cluster_rep) AS cluster_size
            FROM comp),
          q AS (
            SELECT doc_id,
                   round(least(n_chars::DOUBLE / 400.0, 1.0) * 0.4 +
                         (len(list_distinct(ws))::DOUBLE / len(ws)) * 0.4 +
                         (${TextQuality.stopCountSql}::DOUBLE / len(ws)) * 0.2, 6)
                     AS quality
            FROM (SELECT doc_id, n_chars,
                         ${graft.functions.TextFunctions.tokenizeSql} AS ws
                  FROM documents) tq),
          r AS (
            SELECT c.cluster_rep, c.doc_id, q.quality, c.cluster_size,
                   row_number() OVER (PARTITION BY c.cluster_rep
                     ORDER BY q.quality DESC, c.doc_id) AS rk
            FROM csz c JOIN q USING (doc_id))
          SELECT cluster_rep, doc_id AS best_doc, quality AS best_quality,
                 cluster_size
          FROM r WHERE rk = 1 ORDER BY cluster_rep""",
    "split_leakage_safe" ->
      s"""WITH RECURSIVE $clusterCteSql,
          g AS (
            SELECT d.doc_id, coalesce(c.cluster_rep, d.doc_id) AS group_rep
            FROM documents d LEFT JOIN comp c USING (doc_id)),
          b AS (
            SELECT doc_id, group_rep,
                   (${md5IntSql("(group_rep)::VARCHAR", 15)} % 1000) AS bucket
            FROM g)
          SELECT doc_id, group_rep, bucket,
                 CASE WHEN bucket < $splitTrainPermille THEN 'train'
                      WHEN bucket < $splitValPermille THEN 'val'
                      ELSE 'test' END AS split
          FROM b ORDER BY doc_id""")
}
