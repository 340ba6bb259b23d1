package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`vec_id, embedding:
  * array<float>, label`) — extension mandate, SURVEY §7 M7.
  *
  *  - `knn_brute_cosine`: exact top-k by cosine for a bounded query set.
  *    The query side is broadcast (it is small by construction); the
  *    corpus side streams — one scan, no shuffle until the per-query
  *    top-k window. This is the correctness baseline.
  *  - `ann_lsh_cosine`: the scale path — random-hyperplane LSH. Each
  *    vector gets T bucket keys (sign-bit strings of H hyperplane dot
  *    products per table); candidates share a (table, bucket) key, then
  *    exact cosine + top-k on candidates only. Probe cost is bucket
  *    occupancy, not corpus size; at 100 TB the bucket join replaces the
  *    full cross product, trading recall (tunable via T×H) for a
  *    shuffle keyed on narrow bucket ids.
  *
  * All dot products run on doubles via `zip_with`+`aggregate` Column
  * expressions (codegen'd, no UDF). Cosines are rounded to 6dp on both
  * engines; ordering ties broken by neighbor id.
  *
  * The hyperplanes are generated driver-side from a fixed seed and
  * broadcast as literals — deterministic across runs and executors.
  */
object Similarity {

  val knnK = 5
  /** Query set: vec_id < 10 (bounded slice of the corpus). */
  val nQueries = 10
  /** Tuned for weakly-correlated neighbors (testdata top-5 cosine ≈ 0.32,
    * θ≈71°): collision p≈0.6 per plane ⇒ H=5,T=10 gives ≈0.57 expected
    * recall at ≈27% candidate ratio. More clustered corpora (the usual
    * production case) support much larger H with better pruning. */
  val lshTables = 10
  val lshHyperplanes = 5
  val lshSeed = 42
  val dim = 64

  private[graft] def emb(spark: SparkSession, dir: String) =
    // array-level Cast (codegen'd, float->double exact) — the
    // transform(x.cast) HOF evaluated 64 interpreted lambdas per row
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Codegen'd fused loop (graft.functions.DotProduct) — same ascending
    * IEEE sequence as the zip_with/aggregate HOF form it replaced (r6g),
    * so hashes are unchanged; the HOF form evaluated through interpreted
    * lambdas in the LSH banding projection. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  /** Native codegen'd expression (graft.functions.CosineSimilarity) — the
    * zip_with/aggregate form evaluates through interpreted lambdas. Same
    * IEEE sequence, so oracle hashes are unchanged. */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine_similarity(a, b)

  /** Exact brute-force cosine top-k for the query slice. */
  def knnBruteCosine(spark: SparkSession, dir: String): DataFrame = {
    val vecs = emb(spark, dir)
    // limit(nQueries) is a no-op on the unique-id filter's result, but it
    // surfaces the bound as plan-provable maxRows: the cross join's small
    // side is broadcast-bounded by construction, not by data luck
    // (audited registry-wide in ScaleDesignSpec)
    val queries = vecs.filter(col("vec_id") < nQueries)
      .limit(nQueries)
      .toDF("query_id", "qv")
    val scored = vecs.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
      .filter(col("rank") <= knnK)
      .orderBy("query_id", "rank")
  }

  /** Coarse candidates kept per query for the exact rescore — int8
    * quantization error is ~0.4% relative, so 4k of coarse depth buys
    * effectively-exact top-k (SimilaritySpec pins equality with the
    * brute-force ranking on testdata). */
  val sqRescoreDepth = 4 * knnK

  /** Scalar-quantized (int8) two-stage ANN — the memory-scale path for
    * brute-force search. Stage 1 quantizes every vector to
    * `array<tinyint>` with a per-vector scale (127/max|x|): 4× smaller
    * than float32, so at 100 TB the resident working set for the scan —
    * and the broadcast of the query block — shrink 4× while staying
    * SIMD-friendly integer math. Stage 2 scores the corpus against the
    * broadcast quantized queries (the knn_brute scan shape, on narrower
    * arrays) and keeps the top [[sqRescoreDepth]] per query; stage 3
    * re-scores ONLY those candidates on the full float vectors and
    * re-ranks to top-k.
    *
    * A deliberate oracle property: integer dot products are EXACT in
    * doubles (|q|≤127, d=64 ⇒ sums ≪ 2^53), so the coarse scores —
    * unlike float sums — are bit-identical in any engine and the whole
    * two-stage pipeline replays verbatim in DuckDB; the coarse ranking
    * needs no rounding at all. Quantization itself is determinism-safe:
    * floor(x·scale + 0.5) on doubles, identical IEEE ops both sides. */
  def annSqCosine(spark: SparkSession, dir: String): DataFrame = {
    val vecs = emb(spark, dir)
    val maxAbs = aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val quantized = vecs
      .withColumn("sc", lit(127.0) / greatest(maxAbs, lit(1e-30)))
      .withColumn("q",
        transform(col("v"), x => floor(x * col("sc") + lit(0.5)).cast("tinyint")))
    // array-level cast (codegen'd) then the fused dot loop: tinyint →
    // double is exact, and the per-element arithmetic sequence is the
    // same as the zip_with cast-then-multiply form it replaced (r6g)
    def idot(a: Column, b: Column): Column =
      graft.functions.DotProduct.dot_product(
        a.cast("array<double>"), b.cast("array<double>"))
    val corpus = quantized.select(col("vec_id"), col("q"))
    val queries = quantized.filter(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    val coarse = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (idot(col("qq"), col("q")) /
          (sqrt(idot(col("qq"), col("qq"))) * sqrt(idot(col("q"), col("q")))))
          .as("acos"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("acos"), col("neighbor_id"))))
      .filter(col("crank") <= sqRescoreDepth)
      .select(col("query_id"), col("neighbor_id"))
    // rescore on floats: candidates ≪ corpus, so the id-equi-join back to
    // the float vectors touches only the candidate slice
    val qFloats = vecs.filter(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    coarse
      .join(vecs.select(col("vec_id"), col("v")), col("neighbor_id") === col("vec_id"))
      .join(broadcast(qFloats), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
      .filter(col("rank") <= knnK)
      .orderBy("query_id", "rank")
  }

  /** Deterministic seeded gaussians: tables × planesPerTable × d.
    * Generation order is the nested fill order, so the same (seed,
    * shape) always reproduces the same planes — both here and as the
    * oracle's literal VALUES rows. */
  private[operators] def gaussianPlanes(tables: Int, planesPerTable: Int,
      d: Int, seed: Int): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(tables, planesPerTable, d)(rng.nextGaussian())
  }

  /** Deterministic hyperplanes: lshTables × lshHyperplanes × dim gaussians. */
  private[operators] def hyperplanes(): Array[Array[Array[Double]]] =
    gaussianPlanes(lshTables, lshHyperplanes, dim, lshSeed)

  /** Bucket keys per vector: one string of sign bits per table. */
  private def withBucketsOf(vecs: DataFrame,
      planes: Array[Array[Array[Double]]]): DataFrame = {
    val bucketCols = planes.zipWithIndex.map { case (table, t) =>
      val bits = table.map { plane =>
        val planeCol = array(plane.map(lit): _*)
        when(dot(col("v"), planeCol) >= 0, lit("1")).otherwise(lit("0"))
      }
      struct(lit(t).as("table"), concat(bits.toSeq: _*).as("bucket"))
    }
    vecs.select(col("vec_id"), col("v"),
      explode(array(bucketCols.toSeq: _*)).as("tb"))
      .select(col("vec_id"), col("v"),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  private def withBuckets(vecs: DataFrame): DataFrame =
    withBucketsOf(vecs, hyperplanes())

  /** ANN top-k via random-hyperplane LSH, exact-rescored on candidates. */
  def annLshCosine(spark: SparkSession, dir: String): DataFrame = {
    val vecs = emb(spark, dir)
    val buckets = withBuckets(vecs)
    val queryBuckets = buckets.filter(col("vec_id") < nQueries)
      .toDF("query_id", "qv", "table", "bucket")
    val candidates = buckets.join(queryBuckets, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id").as("neighbor_id"), col("v"))
      .dropDuplicates("query_id", "neighbor_id")
    candidates
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
      .filter(col("rank") <= knnK)
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine ≥ τ).
    *
    * Exact all-pairs — executed as blocked A×Bᵀ tiles: vectors are
    * normalized once, hashed into B blocks of ~[[pairsVecsPerBlock]]
    * vectors, and every block-pair tile (B(B+1)/2 of them) runs a tight
    * primitive-array dot loop inside one task. Nothing is collected to
    * the driver; block rows move through ordinary shuffle joins, so the
    * kernel distributes across however many executors the tiles need.
    * The naive `zip_with`+`aggregate` self-join form is ~100× slower:
    * higher-order array functions don't enter whole-stage codegen, so
    * each of the n²/2 pairs pays interpreted per-element overhead.
    * Exact all-pairs is inherently O(n²) WORK — at corpora where even
    * perfectly-distributed n² is infeasible, the LSH buckets above (or
    * the IVF cells) become the candidate generator and this kernel's
    * rescoring tail runs per bucket. */
  val nearDupCosine = 0.4

  /** Target vectors per block for the tile kernel: one tile = a
    * ~(2048)²·d fused-multiply loop, a few hundred ms of CPU — big
    * enough to amortize task overhead, small enough that two blocks of
    * vectors (~2·2048·d·8 bytes) sit comfortably in task memory. */
  val pairsVecsPerBlock = 2048L

  /** Shared exact all-pairs tile kernel over any (id, vector) dataset —
    * used by both the `embeddings`-table near-dup and the text-derived
    * document-embedding near-dup. Output is identical to a naive
    * all-pairs scan: same normalize-then-dot IEEE sequence, canonical
    * (vec_a < vec_b) orientation. */
  /** Size guard for the exact kernel: beyond this many vectors the
    * quadratic work is indefensible and callers must use the banded
    * default ([[lshBandedPairs]]). */
  val maxExactVectors = 1L << 17

  /** The tight primitive-array tile sweep shared by the exact all-pairs
    * kernel and the banded default's per-bucket rescore: every (ida <
    * idb) pair across two blocks of NORMALIZED vectors whose raw dot
    * clears a conservative τ − 1e-6 prefilter (the exact threshold is
    * applied downstream to the ROUNDED cosine, by the same round() both
    * engines use, so boundary pairs agree bit-for-bit). `sameBlock`
    * skips j ≤ i — ids are sorted within a block. */
  private def tileSweep(ia: Array[(Long, Array[Double])],
      ib: Array[(Long, Array[Double])], sameBlock: Boolean,
      thr: Double): Iterator[(Long, Long, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var i = 0
    while (i < ia.length) {
      val ida = ia(i)._1
      val a = ia(i)._2
      // same-block tile: j starts past i (ids sorted → ida < idb);
      // cross-block tile: full sweep, pair canonicalized below
      var j = if (sameBlock) i + 1 else 0
      while (j < ib.length) {
        val idb = ib(j)._1
        val b = ib(j)._2
        var s = 0.0
        var k = 0
        while (k < a.length) { s += a(k) * b(k); k += 1 }
        if (s >= thr - 1e-6) {
          if (ida < idb) out += ((ida, idb, s)) else out += ((idb, ida, s))
        }
        j += 1
      }
      i += 1
    }
    out.iterator
  }

  private[graft] def cosinePairsKernel(spark: SparkSession,
      vecs: org.apache.spark.sql.Dataset[(Long, Seq[Double])],
      threshold: Double): DataFrame = {
    val sp = spark
    import sp.implicits._
    // normalize once and materialize: the block table feeds BOTH sides of
    // the tile join, so without truncation the upstream vector
    // construction (and its shuffles) would run twice
    val normed = vecs.map { case (id, v) =>
      val n = math.sqrt(v.iterator.map(x => x * x).sum)
      (id, v.iterator.map(_ / n).toArray)
    }.localCheckpoint(true)
    val total = normed.count()
    if (total > maxExactVectors)
      // typed so Verify records the refusal as an _ENVELOPE marker and
      // the at-scale sweep resolves it via the bounded-sample twin
      // (graft.ScaleEnvelopeExceeded scaladoc has the full contract)
      throw new graft.ScaleEnvelopeExceeded(
        s"exact all-pairs kernel is O(n²) — $total vectors exceeds " +
          s"maxExactVectors=$maxExactVectors; use the LSH-banded default")
    // floor of 8 blocks keeps small corpora parallel; above that, blocks
    // scale with n so each tile stays a bounded unit of work
    val nBlocks = math.max(8L, (total + pairsVecsPerBlock - 1) / pairsVecsPerBlock)
    val blocks = normed
      .groupByKey { case (id, _) => id % nBlocks }
      .mapGroups((blk, it) => (blk, it.toArray.sortBy(_._1)))
      .localCheckpoint(true) // feeds both tile sides
    val bdf = blocks.toDF("blk", "items")
    // tile index (ba ≤ bb): pure ints, tiny; block payloads replicate to
    // their tiles through equi-joins (shuffle-friendly — no giant
    // broadcast of the whole corpus)
    val tileIdx = spark.range(nBlocks).toDF("ba")
      .join(spark.range(nBlocks).toDF("bb"), col("ba") <= col("bb"))
    val tiles = tileIdx
      .join(bdf.select(col("blk").as("ba"), col("items").as("ia")), "ba")
      .join(bdf.select(col("blk").as("bb"), col("items").as("ib")), "bb")
      .select(col("ba"), col("ia"), col("bb"), col("ib"))
      .as[(Long, Array[(Long, Array[Double])], Long, Array[(Long, Array[Double])])]
    // kernel prefilter is conservative (τ − 1e-6); the exact threshold is
    // applied to the ROUNDED cosine by the same round() both engines use,
    // and both engines compute the identical normalize-then-dot IEEE
    // sequence, so boundary pairs agree bit-for-bit
    val thr = threshold
    tiles.flatMap { case (ba, ia, bb, ib) => tileSweep(ia, ib, ba == bb, thr) }
      .toDF("vec_a", "vec_b", "raw")
      .select(col("vec_a"), col("vec_b"), round(col("raw"), 6).as("cosine"))
      .filter(col("cosine") >= thr)
      .orderBy("vec_a", "vec_b")
  }

  /** LSH-banded near-dup pair generator — the DEFAULT plan for
    * embedding-cosine dedup (the all-pairs kernel is the size-guarded
    * correctness baseline). Candidates are pairs sharing any
    * (table, bucket) sign-bit key; each candidate is exact-rescored with
    * the codegen'd cosine and the threshold applies to the ROUNDED value,
    * so precision is exact and the only approximation is banding recall
    * (tunable via tables × bits; parameters below are sized so the
    * weakest true pair on the measured corpus geometry survives with
    * ≥ 98% probability).
    *
    * Scale shape (r5: candidates batch through the tile sweep instead of
    * the r4 per-pair join rescore): the corpus never cross-joins — the
    * only joins are equi-joins keyed on (table, bucket) (+ the broadcast
    * occupancy table, bounded by tables × 2^bits), hot buckets split
    * into bounded block-pair tiles so no single bucket can become a
    * straggler task, duplicate candidates from multiple tables cost
    * re-swept dots (CPU) rather than a pre-join distinct shuffle, and
    * the distinct runs on the thresholded survivors only. Candidate
    * selectivity is a property of the DATA: at production thresholds
    * (τ ≥ 0.9 on clustered corpora) banding prunes hard; this testdata
    * is near-isotropic at τ = 0.4, the worst regime for any cosine LSH,
    * and the plan shape is still the one that scales — see PLANS.md. */
  /** Test instrumentation (meaningful in local mode only — a same-JVM
    * LongAdder): input rows swept by the banding flatMap, across every
    * invocation since the last reset. SimilaritySpec resets it and
    * asserts exactly ONE banding pass per corpus vector (the r5 pipeline
    * lazily evaluated the pass twice: occupancy, then blocks). */
  private[graft] val bandedRowsSwept = new java.util.concurrent.atomic.LongAdder

  /** The banded pipeline, LAZY — the returned frame still shows the
    * bucket-keyed joins (SimilaritySpec asserts the physical shape
    * here); second element releases the intermediate checkpoints once
    * the result is materialized. */
  private[graft] def lshBandedPairsLazy(vecs: DataFrame,
      planes: Array[Array[Array[Double]]], threshold: Double)
      : (DataFrame, () => Unit) = {
    val sp = vecs.sparkSession
    import sp.implicits._
    // ONE banding pass (r6; r5 ran the normalize+band flatMap lazily
    // twice — occupancy, then blocks): normalization materializes once
    // as an id-keyed payload table `nv`, the banding flatMap emits
    // NARROW (table, bucket, vec_id) keys exactly once into its own
    // checkpoint, occupancy reads those keys, and the payload rejoins
    // them by vec_id — a linear equi-join (n payload rows against
    // n·tables short key rows), never per candidate pair (r4's
    // per-pair rescore joins were the slow shape; one id-keyed
    // pre-group join is not). The narrow key checkpoint also replaces
    // r5's rejected alternative — an eager n·tables PAYLOAD checkpoint
    // of the banded output — at tables× less storage.
    //
    // Normalization keeps the exact kernel's IEEE sequence (squares
    // summed left-to-right, then each component / sqrt), so the rescore
    // below stays a bare dot product — the identical arithmetic the
    // `_exact` baselines pin, and a pair sitting exactly on the rounded
    // threshold boundary can never pass one path and fail the other
    // (banded ⊆ exact holds structurally). Sign bits come from plain
    // left-to-right dot loops — the same order as the oracle's
    // list_dot_product (and as the zip_with/aggregate Column form this
    // replaces: r4's probe showed tables × bits higher-order expressions
    // in one projection cost seconds of codegen compile + interpreted
    // evaluation per derived plan, dwarfing the actual flops). Banding
    // the NORMALIZED vector flips no sign bit: dot(v/‖v‖, plane) has the
    // sign of dot(v, plane) for any ‖v‖ > 0.
    val pl = planes
    // LAZY checkpoints on nv/keys (r15): both still materialize exactly
    // once (cached on first compute; the banding-pass counter law in
    // SimilaritySpec still holds), but the pipeline schedules as THREE
    // driver jobs instead of five — the occupancy collect computes-and-
    // caches nv+keys in one job, blocks materializes eagerly (see its
    // comment for why lazy is UNSAFE there), and the survivor
    // materialization runs tiles+sweep. Lazy fusion is safe here
    // because every consumer of nv/keys after the collect runs in a
    // LATER job and reads the cache (the same one-job rationale as the
    // r15 dedup LSH verify).
    val nv = vecs.as[(Long, Seq[Double])].map { case (id, raw) =>
      val n = math.sqrt(raw.iterator.map(x => x * x).sum)
      (id, raw.iterator.map(_ / n).toArray)
    }.toDF("vec_id", "v").localCheckpoint(false)
    val keys = nv.as[(Long, Seq[Double])].flatMap { case (id, nvs) =>
      bandedRowsSwept.increment()
      val v = nvs.toArray
      pl.iterator.zipWithIndex.map { case (table, t) =>
        val bits = new java.lang.StringBuilder(table.length)
        var p = 0
        while (p < table.length) {
          val plane = table(p)
          var s = 0.0
          var k = 0
          while (k < v.length) { s += v(k) * plane(k); k += 1 }
          bits.append(if (s >= 0) '1' else '0')
          p += 1
        }
        (t, bits.toString, id)
      }
    }.toDF("table", "bucket", "vec_id").localCheckpoint(false)
    // Bucket occupancy → per-bucket block count: a hot bucket splits into
    // ceil(occ / pairsVecsPerBlock) blocks and rescores as block-pair
    // tiles (the exact kernel's discipline), so one skewed bucket
    // parallelizes across tasks instead of becoming the straggler. The
    // occupancy table is bounded by tables × 2^bits — config constants —
    // so collecting it to the driver and shipping the block counts in the
    // task closure is legitimate at any corpus size (the same bounded-
    // collect discipline as the IVF quantizer sample).
    val nblk: Map[(Int, String), Long] = keys
      .groupBy("table", "bucket").agg(count(lit(1)).as("occ"))
      .as[(Int, String, Long)].collect()
      .map { case (t, b, occ) =>
        (t, b) -> ((occ + pairsVecsPerBlock - 1) / pairsVecsPerBlock) }
      .toMap
    val blocks = keys.join(nv, "vec_id")
      .select(col("table"), col("bucket"), col("vec_id"), col("v"))
      .as[(Int, String, Long, Seq[Double])]
      .groupByKey { case (t, b, id, _) => (t, b, id % nblk((t, b))) }
      .mapGroups { (key, it) =>
        (key._1, key._2, key._3,
          it.map { case (_, _, id, v) => (id, v.toArray) }.toArray.sortBy(_._1))
      }
      .toDF("table", "bucket", "blk", "items")
      // EAGER, unlike nv/keys (r15): blocks feeds BOTH tile-join sides,
      // and leaving it lazy made the survivor job recompute the heavy
      // groupByKey/mapGroups subtree per side at scale (sf3 A/B:
      // 13.0 s eager vs 22.1 s lazy on dedup_embedding_cosine) — the
      // cache races of two same-job consumer stages do not reliably
      // dedupe the build. One driver barrier here is cheap; the
      // nv/keys fusion above keeps the 5->2->3 job win.
      .localCheckpoint(true)
    // tile join stays KEYED on (table, bucket) — an equi-join whose
    // fan-out is the per-bucket block count, never a corpus cross product
    val tiles = blocks
      .select(col("table"), col("bucket"), col("blk").as("ba"), col("items").as("ia"))
      .join(blocks.select(col("table"), col("bucket"), col("blk").as("bb"),
        col("items").as("ib")), Seq("table", "bucket"))
      .filter(col("ba") <= col("bb"))
      .select(col("ba"), col("ia"), col("bb"), col("ib"))
      .as[(Long, Array[(Long, Array[Double])], Long, Array[(Long, Array[Double])])]
    val thr = threshold
    val survivors = tiles
      .flatMap { case (ba, ia, bb, ib) => tileSweep(ia, ib, ba == bb, thr) }
      .toDF("vec_a", "vec_b", "raw")
      .select(col("vec_a"), col("vec_b"), round(col("raw"), 6).as("cosine"))
      .filter(col("cosine") >= thr)
      // a pair colliding in several tables is swept once per table; every
      // copy carries the identical IEEE dot, so dedup on the pair alone
      // is deterministic — and it runs on the thresholded SURVIVORS, not
      // the candidate stream (duplicate candidates cost re-swept CPU,
      // not a pre-join distinct shuffle of the whole candidate set)
      .dropDuplicates("vec_a", "vec_b")
    (survivors, () => {
      Tables.releaseCheckpoint(nv)
      Tables.releaseCheckpoint(keys)
      Tables.releaseCheckpoint(blocks)
    })
  }

  /** LSH-banded near-dup pairs, materialized: runs the lazy pipeline,
    * checkpoints the (small) survivor set, then deterministically
    * releases the big intermediate checkpoints — each bench/verify
    * invocation holds on to survivor-sized blocks only. */
  private[operators] def lshBandedPairs(vecs: DataFrame,
      planes: Array[Array[Array[Double]]], threshold: Double): DataFrame = {
    val (survivors, release) = lshBandedPairsLazy(vecs, planes, threshold)
    val out = survivors.localCheckpoint(true)
    release()
    out.orderBy("vec_a", "vec_b")
  }

  /** Near-dup banding for the `embeddings` table: τ = 0.4 sits at 66°,
    * barely above the isotropic background (worst true pair 0.401,
    * background p99 0.289 at sf0.01) — 4-bit bands keep per-pair recall
    * ≈ 0.98 at the threshold; 24 tables is the price of that recall in
    * this geometry. */
  val ndTables = 24
  val ndBits = 4
  val ndSeed = 101
  private[graft] lazy val ndPlanesEmb = gaussianPlanes(ndTables, ndBits, dim, ndSeed)

  def dedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame =
    lshBandedPairs(emb(spark, dir), ndPlanesEmb, nearDupCosine)

  /** The exact all-pairs baseline, registered as its own query (`_exact`)
    * and size-guarded in the kernel — at corpus scale the banded default
    * above is the only defensible plan. */
  def dedupEmbeddingExact(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    cosinePairsKernel(spark, emb(spark, dir).as[(Long, Seq[Double])], nearDupCosine)
  }

  /** Deterministic bounded-sample twin of the all-pairs baseline (r14,
    * r13 verdict item 1c): the parent's brute DuckDB oracle is
    * hours-by-construction at sf1 (150k² list-dot pairs), so the exact
    * tile-sweep kernel's arithmetic + threshold contract was only
    * oracle-checked at sf0.01. The twin runs the SAME kernel on the
    * vec_id ≡ [[embSampleRem]] (mod [[embSampleMod]]) slice — cosine of
    * a pair depends on nothing but the two vectors, so the slice result
    * IS the full result restricted to in-sample endpoints — against a
    * brute oracle that stays feasible at scale (sf1: 1,250 vectors,
    * 340 surviving pairs; the residue is chosen so even the 500-vector
    * sf0.01 corpus keeps one true pair in-slice — non-vacuous at the
    * gate). */
  val embSampleMod = 16L
  val embSampleRem = 14L

  def dedupEmbeddingExactSample(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    cosinePairsKernel(spark,
      emb(spark, dir).filter(col("vec_id") % embSampleMod === embSampleRem)
        .as[(Long, Seq[Double])],
      nearDupCosine)
  }

  /** Semantic decontamination — the embedding-space complement of the
    * n-gram [[Dedup.decontaminate]]: corpus vectors whose cosine to ANY
    * held-out benchmark vector clears the near-dup threshold are flagged
    * for removal, with their best-matching benchmark vector attached.
    * Paraphrased eval contamination shares no word-3-gram and sails
    * through the n-gram screen; this pass catches it (the published
    * complement: e.g. the embedding-similarity contamination audits in
    * public LLM eval-hygiene work). The benchmark slice mirrors the
    * n-gram pass's deterministic held-out convention
    * (vec_id ≡ [[Dedup.benchRem]] mod [[Dedup.benchMod]]).
    *
    * Scale shape: consumes the banded near-dup pair generator VERBATIM —
    * equi-keyed (table, bucket) joins, no corpus×benchmark cross product
    * (the brute broadcast form would need the benchmark bounded; the
    * banded form needs nothing) — then filters to cross-side pairs and
    * takes a per-corpus-vector argmax: one window over the thresholded
    * SURVIVORS, which are tiny by construction. The cost is exactly the
    * timed dedup_embedding_cosine pipeline. */
  def decontaminateSemantic(spark: SparkSession, dir: String): DataFrame = {
    val isBench = (c: Column) => c % Dedup.benchMod === Dedup.benchRem
    dedupEmbeddingCosine(spark, dir)
      .filter(isBench(col("vec_a")) =!= isBench(col("vec_b")))
      .select(
        when(isBench(col("vec_a")), col("vec_b")).otherwise(col("vec_a")).as("vec_id"),
        when(isBench(col("vec_a")), col("vec_a")).otherwise(col("vec_b")).as("bench_id"),
        col("cosine"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("cosine"), col("bench_id"))))
      .filter(col("rk") === 1)
      .select("vec_id", "bench_id", "cosine")
      .orderBy("vec_id")
  }

  /** IVF (inverted-file) ANN — the other scale path next to LSH (coarse
    * quantization as in Jégou/Douze/Schmid, "Product quantization for
    * nearest neighbor search", TPAMI 2011 — without the PQ residual
    * codes; cells store full vectors here):
    *  1. train a coarse quantizer (Lloyd's k-means) driver-side on a
    *     bounded SAMPLE of the corpus (standard IVF practice: the
    *     quantizer sees thousands of vectors even when the corpus has
    *     billions);
    *  2. assign every vector to its nearest centroid — distributed,
    *     one scan with the centroid table broadcast;
    *  3. a query probes only the nProbe nearest cells; candidates are
    *     exact-rescored. Probe cost scales with cell occupancy (~n/k per
    *     cell), not corpus size.
    * Deterministic AND integer-exact: training + assignment run on a
    * milli-unit integer grid — vectors quantized as floor(x·1000),
    * Lloyd's updates as integer sums (exact in ANY aggregation order)
    * with floor-divided integer centroids, argmin on integer distances
    * (tie → lowest cell). Every comparison the quantizer makes is
    * integer arithmetic, so the whole train→assign→probe pipeline is
    * bit-reproducible in any engine; only the final candidate RESCORE
    * touches floating point, under the same round-6 cosine discipline as
    * knn/lsh. This is what makes ann_ivf_cosine exact-oracle-checkable
    * (the earlier form averaged raw doubles in driver order — not
    * SQL-replicable). The grid costs ~0.1% relative distance error on
    * unit-scale embeddings — irrelevant to a COARSE quantizer whose only
    * job is bucketing (recall gate in SimilaritySpec is unchanged). */
  val ivfCells = 16
  val ivfProbes = 4
  val ivfSampleSize = 256
  val ivfIters = 5
  val milliScale = 1000.0

  private def l2SqLong(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var j = 0
    while (j < a.length) { val d = a(j) - b(j); s += d * d; j += 1 }
    s
  }

  /** Integer-exact Lloyd's over milli-quantized vectors. Empty cells
    * keep their previous centroid. floorDiv(Σ, n) == floor(Σ::DOUBLE/n)
    * for |Σ| ≪ 2^53: when n ∤ Σ the true quotient sits ≥ 1/n — far more
    * than one ulp — from the nearest integer, so the DuckDB mirror's
    * double-division floor lands on the same value. */
  private[graft] def trainQuantizer(sample: Array[Array[Long]],
      cells: Int = ivfCells, iters: Int = ivfIters): Array[Array[Long]] = {
    var centroids = sample.take(cells).map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(cells)(new Array[Long](sample.head.length))
      val counts = new Array[Long](cells)
      sample.foreach { v =>
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < centroids.length) {
          val d = l2SqLong(v, centroids(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        val s = sums(best)
        var j = 0
        while (j < v.length) { s(j) += v(j); j += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(x => Math.floorDiv(x, counts(c)))
      }.toArray
    }
    centroids
  }

  /** Milli-grid quantization — the same IEEE multiply + floor on both
    * engines (DuckDB mirror: `floor(x * 1000)::BIGINT`). */
  private def quantize(v: Column): Column =
    transform(v, x => floor(x * milliScale))

  /** Top-`n` nearest coarse cells of an integer vector `vq` as pure
    * Column expressions (no ScalaUDF in the plan): the centroid table
    * rides in as a literal array<array<long>> ([[ivfCells]]×[[dim]]
    * longs — tiny), per-cell squared L2 via zip_with+aggregate in pure
    * integer arithmetic, argmin/top-n via array_sort on (distance,
    * cell) structs. Struct sort tie-breaks by cell ascending, matching
    * the trainer's first-minimal-index rule. */
  private def nearestCellsExpr(centLit: Column, vq: Column, n: Int): Column = {
    val scored = transform(sequence(lit(0), lit(ivfCells - 1)), c =>
      struct(
        aggregate(zip_with(vq, element_at(centLit, c + 1),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, d) => acc + d).as("d"),
        c.as("cell")))
    transform(slice(array_sort(scored), 1, n), s => s("cell"))
  }

  def annIvfCosine(spark: SparkSession, dir: String): DataFrame = {
    val vecs = emb(spark, dir)
    // The coarse quantizer AND the corpus cell assignment come from the
    // SHARED IVFADC artifacts (r8 advice: the old inline trainQuantizer
    // call made this query's subsumption by ann_ivfpq_cosine's timed
    // slot nominal — the centroids were value-identical but the
    // train+assign work was re-paid here instead of being priced in
    // ann_family_build). Same sample, same trainer, same first-minimum
    // argmin, so the centroids and cells are bit-identical to the
    // inline form and the DuckDB oracle replay is unchanged.
    val art = ivfpqArtifactsShared(spark, dir)
    val centLit = typedlit(art.coarse)
    def nearestCells(vq: Column, n: Int): Column =
      nearestCellsExpr(centLit, vq, n)
    val withQ = vecs.withColumn("vq", quantize(col("v")))
    // corpus side: the index's stored (vec_id, cell) joined back to the
    // raw vectors — the marginal probe reads the index, never re-encodes
    val assigned = vecs
      .join(art.encoded.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("cell"))
    val queryCells = withQ.filter(col("vec_id") < nQueries)
      .withColumn("cell", explode(nearestCells(col("vq"), ivfProbes)))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"))
    queryCells.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
      .filter(col("rank") <= knnK)
      .orderBy("query_id", "rank")
  }

  /** Recall@k of the IVF index against the brute-force ground truth —
    * ANN quality measured as a first-class, oracle-checked query
    * instead of a test-side note. Per query: how many of the true
    * top-[[knnK]] neighbors the probed-cell search returned. This is
    * the evaluation every production ANN deployment runs when tuning
    * probes/cells; expressing it IN the engine means the tuning loop is
    * one more DataFrame, not an external script.
    *
    * Scale shape: both legs are the already-bounded query-set searches
    * (brute is the oracle-anchor shape over [[nQueries]] broadcast
    * queries — never the corpus×corpus product); the evaluation itself
    * joins two k×nQueries tables — metadata scale. Exactness: hit
    * counting is integer; recall is one int/int division. */
  private def annRecallOf(spark: SparkSession, dir: String,
      approxDf: DataFrame): DataFrame = {
    val truth = knnBruteCosine(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = approxDf
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / col("k"))
      .orderBy("query_id")
  }

  def annRecallIvf(spark: SparkSession, dir: String): DataFrame =
    annRecallOf(spark, dir, annIvfCosine(spark, dir))

  /** The rest of the recall MATRIX: the same evaluation over every ANN
    * variant, so probes/tables/codebook tradeoffs read off one table of
    * per-query recalls instead of anecdotes. Each composes its leg's
    * own replay oracle, like [[annRecallIvf]]. */
  def annRecallLsh(spark: SparkSession, dir: String): DataFrame =
    annRecallOf(spark, dir, annLshCosine(spark, dir))
  def annRecallPq(spark: SparkSession, dir: String): DataFrame =
    annRecallOf(spark, dir, annPqCosine(spark, dir))
  def annRecallIvfPq(spark: SparkSession, dir: String): DataFrame =
    annRecallOf(spark, dir, annIvfPqCosine(spark, dir))

  /** PQ (product quantization) ANN — the codes half of Jégou/Douze/
    * Schmid TPAMI 2011 that [[annIvfCosine]] deliberately left out: the
    * 64-dim space splits into [[pqM]] subspaces of [[pqSub]] dims, each
    * with its own [[pqK]]-centroid codebook (integer-exact Lloyd's on
    * the milli grid, the IVF trainer per subspace), and every vector
    * compresses to pqM codes — 8 nibbles where the raw vector is 256
    * bytes, the memory ratio that lets a billion-vector index live in
    * RAM. Queries rank candidates by ASYMMETRIC distance (ADC): the raw
    * query subvector against each candidate's reconstructed centroid,
    * Σ_m L2(q_m, cb[m][code_m]) — all integer arithmetic, so the coarse
    * candidate set is bit-reproducible and the oracle replays the whole
    * train→encode→ADC pipeline exactly (ONE keyed k-means replay with
    * the subspace as a grouping key — 5 CTE stages, not 8×5). The float
    * cosine rescore over the top-[[sqRescoreDepth]] candidates is the
    * same tail as [[annSqCosine]].
    *
    * Scale shape: encoding is a map-only scan against a broadcast
    * literal codebook (pqM·pqK·pqSub = 1,024 longs); ADC scoring
    * touches pqM additions per candidate instead of `dim` multiplies;
    * at 100 TB the codes table is ~1/64 the vectors' bytes, and the
    * rescore joins back to floats only for candidates. This query's ADC
    * still scans ALL codes per (bounded) query set — the exhaustive-ADC
    * baseline of the paper; [[annIvfPqCosine]] is the composed IVFADC
    * that routes ADC through probed cells only. */
  val pqM = 8
  val pqSub = dim / pqM
  val pqK = 16
  val pqIters = 5

  /** The corpus's milli-quantized bounded training sample, sorted by
    * vec_id (the seed order every trainer and oracle replays). */
  private def milliSample(spark: SparkSession, dir: String): Array[Array[Long]] = {
    val sp = spark
    import sp.implicits._
    emb(spark, dir).filter(col("vec_id") < ivfSampleSize)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map(_._2.map(x => math.floor(x * milliScale).toLong).toArray)
  }

  /** Per-subspace integer argmin codes over a literal codebook (tie →
    * lowest code, matching the trainer's first-minimal rule), from the
    * column `src` holding the vector to encode. */
  private def pqCodesExpr(cbLit: Column, src: Column): Column =
    transform(sequence(lit(0), lit(pqM - 1)), m => {
      val scored = transform(sequence(lit(0), lit(pqK - 1)), k =>
        struct(
          pqL2(pqSubSlice(src, m),
            element_at(element_at(cbLit, m + 1), k + 1)).as("d"),
          k.as("k")))
      element_at(array_sort(scored), 1)("k")
    })

  private def pqSubSlice(vq: Column, m: Column): Column =
    slice(vq, m * pqSub + 1, lit(pqSub))
  private def pqL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** The standing ANN codes INDEX — trained codebooks + the encoded
    * codes table, the artifacts a production vector store builds once
    * and probes many times. Memoized per (session, dir) exactly like
    * the dedup family's shingle table (static-data assumption); Bench
    * times the build as its own `ann_family_build` metric and
    * [[clearMemos]] between runs, so the search queries report MARGINAL
    * (probe-time) cost — at 100 TB re-encoding the corpus per query is
    * precisely what an index exists to avoid. */
  private[graft] final case class PqArtifacts(
      codebooks: Seq[Seq[Seq[Long]]], encoded: DataFrame)
  private[graft] final case class IvfPqArtifacts(
      coarse: Seq[Seq[Long]], codebooks: Seq[Seq[Seq[Long]]], encoded: DataFrame)

  private val pqMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), PqArtifacts]
  private val ivfpqMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), IvfPqArtifacts]

  private[graft] def pqArtifactsShared(spark: SparkSession, dir: String): PqArtifacts =
    pqMemo.synchronized {
      pqMemo.getOrElseUpdate((spark, dir), {
        val sample = milliSample(spark, dir)
        val codebooks: Seq[Seq[Seq[Long]]] = (0 until pqM).map { m =>
          trainQuantizer(sample.map(_.slice(m * pqSub, (m + 1) * pqSub)),
            pqK, pqIters).map(_.toSeq).toSeq
        }
        // fused codegen'd kernel (graft.functions.PqKernels): the HOF
        // encode evaluated ~1k interpreted lambdas per row and dominated
        // the family build; bit-identical integer arithmetic, so the
        // oracle replay is unchanged
        val encoded = emb(spark, dir)
          .select(col("vec_id"),
            graft.functions.PqKernels.pq_encode(col("v"), codebooks).as("codes"))
          .localCheckpoint(true)
        PqArtifacts(codebooks, encoded)
      })
    }

  private[graft] def ivfpqArtifactsShared(spark: SparkSession, dir: String): IvfPqArtifacts =
    ivfpqMemo.synchronized {
      ivfpqMemo.getOrElseUpdate((spark, dir), {
        val sample = milliSample(spark, dir)
        val coarseCents = trainQuantizer(sample)
        def nearestIdx(v: Array[Long]): Int = {
          var best = 0
          var bestD = Long.MaxValue
          var c = 0
          while (c < coarseCents.length) {
            val d = l2SqLong(v, coarseCents(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          best
        }
        val residualSample = sample.map { v =>
          val cc = coarseCents(nearestIdx(v))
          Array.tabulate(v.length)(i => v(i) - cc(i))
        }
        val codebooks: Seq[Seq[Seq[Long]]] = (0 until pqM).map { m =>
          trainQuantizer(residualSample.map(_.slice(m * pqSub, (m + 1) * pqSub)),
            pqK, pqIters).map(_.toSeq).toSeq
        }
        // one fused codegen'd pass per row: quantize → cell argmin →
        // residual → 8 code argmins (see PqKernels' exactness contract)
        val coarseSeq = coarseCents.map(_.toSeq).toSeq
        val enc = graft.functions.PqKernels.ivfpq_encode(col("v"), coarseSeq, codebooks)
        val encoded = emb(spark, dir)
          .select(col("vec_id"),
            enc.getField("cell").as("cell"), enc.getField("codes").as("codes"))
          .localCheckpoint(true)
        IvfPqArtifacts(coarseSeq, codebooks, encoded)
      })
    }

  /** Registered queries that probe the shared codes index — Bench gates
    * its `ann_family_build` metric on THIS set (see [[Dedup.familyMembers]]
    * for the naming rationale). */
  val annFamilyMembers: Set[String] =
    Set("ann_pq_cosine", "ann_ivfpq_cosine", "dedup_semantic_kmeans")

  /** Force-build the codes index (both the raw-subvector PQ codebooks
    * and the IVF+residual IVFADC artifacts). */
  def buildFamilyArtifacts(spark: SparkSession, dir: String): Unit = {
    pqArtifactsShared(spark, dir)
    ivfpqArtifactsShared(spark, dir)
  }

  /** See [[Dedup.clearMemos]] — static-data assumption; Bench clears
    * between timed runs, releasing the checkpointed blocks. */
  def clearMemos(): Unit = {
    pqMemo.synchronized {
      pqMemo.values.foreach(a => graft.Tables.releaseCheckpoint(a.encoded))
      pqMemo.clear()
    }
    ivfpqMemo.synchronized {
      ivfpqMemo.values.foreach(a => graft.Tables.releaseCheckpoint(a.encoded))
      ivfpqMemo.clear()
    }
  }

  def annPqCosine(spark: SparkSession, dir: String): DataFrame = {
    val vecs = emb(spark, dir)
    val art = pqArtifactsShared(spark, dir)

    val encoded = art.encoded
    val queries = vecs.filter(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"),
        quantize(col("v")).as("qvq"))
    // fused codegen'd ADC (PqKernels) — the HOF form evaluated 64
    // interpreted lambdas per candidate row on the hot scoring path
    val adc = graft.functions.PqKernels.pq_adc(
      col("qvq"), col("codes"), art.codebooks)
    val coarse = encoded.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adc.as("adist"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(asc("adist"), col("neighbor_id"))))
      .filter(col("crank") <= sqRescoreDepth)
      .select("query_id", "neighbor_id")
    val qFloats = vecs.filter(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    coarse
      .join(vecs.select(col("vec_id"), col("v")),
        col("neighbor_id") === col("vec_id"))
      .join(broadcast(qFloats), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
      .filter(col("rank") <= knnK)
      .orderBy("query_id", "rank")
  }

  /** IVF+PQ composed — the actual IVFADC design of Jégou/Douze/Schmid
    * TPAMI 2011 §IV (the "non-exhaustive search" their paper is FOR),
    * closing the gap [[annPqCosine]] documents: its ADC stage scans
    * every code row per query, while here the coarse quantizer routes
    * each query to [[ivfProbes]] of [[ivfCells]] cells and ADC touches
    * ONLY the probed cells' codes — per-query work is |probed cells|
    * (~probes/cells of the corpus), not |corpus|. Codes are trained and
    * computed on RESIDUALS (vq − coarse centroid), per the paper: the
    * residual distribution has far less variance than the raw vectors,
    * so the same [[pqK]]-entry codebooks quantize it better.
    *
    * Pipeline, all integer-exact until the float rescore tail:
    *  1. coarse quantizer: [[trainQuantizer]] on the milli-grid sample
    *     (identical to [[annIvfCosine]]);
    *  2. residual codebooks: per subspace m, [[trainQuantizer]] over
    *     the SAMPLE's residuals (driver-side nearest-cell assignment
    *     uses the same strict-< / lowest-index rule the Column
    *     expression and the oracle's (distance, cell) sort implement);
    *  3. encode: one map-only scan assigns every vector its cell and
    *     its pqM residual codes against broadcast literal tables
    *     (centroids 16×64 longs + codebooks 8×16×8 longs);
    *  4. probe: each query explodes to its [[ivfProbes]] nearest cells,
    *     carrying the residual w.r.t. THAT cell's centroid (IVFADC's
    *     per-cell query residual);
    *  5. ADC within probed cells: the cell equi-join bounds candidates,
    *     asymmetric distance is Σ_m L2(qres_m, cb[m][code_m]) — a
    *     vector lives in exactly one cell, so each (query, neighbor)
    *     pair meets at most once and needs no dedup;
    *  6. float cosine rescore of the top-[[sqRescoreDepth]], same tail
    *     as [[annSqCosine]]/[[annPqCosine]].
    *
    * Scale shape: this is the 100 TB search path — the codes table is
    * ~1/64 the vectors' bytes AND each query reads ~probes/cells of it;
    * at a billion vectors both the memory and the scan bound come from
    * this composition, neither half alone. The oracle replays the whole
    * train→residual→encode→probe→ADC pipeline (coarse keyed-Lloyd +
    * keyed-Lloyd per subspace + cell-filtered ADC) in DuckDB; recall vs
    * [[knnBruteCosine]] is gated in SimilaritySpec alongside IVF/PQ. */
  def annIvfPqCosine(spark: SparkSession, dir: String): DataFrame = {
    val vecs = emb(spark, dir)
    val art = ivfpqArtifactsShared(spark, dir)
    val centLit = typedlit(art.coarse)

    def residual(vq: Column, cell: Column): Column =
      zip_with(vq, element_at(centLit, cell + 1), (x, y) => x - y)

    val encoded = art.encoded
    // query side stays Column-HOF: nQueries rows, never corpus-scale
    val withQ = vecs.withColumn("vq", quantize(col("v")))
    val queryCells = withQ.filter(col("vec_id") < nQueries).limit(nQueries)
      .withColumn("cell", explode(nearestCellsExpr(centLit, col("vq"), ivfProbes)))
      .select(col("vec_id").as("query_id"), col("cell"),
        residual(col("vq"), col("cell")).as("qres"))
    // fused codegen'd ADC over the probed cells' candidate rows
    val adc = graft.functions.PqKernels.pq_adc(
      col("qres"), col("codes"), art.codebooks)
    val coarse = encoded.join(broadcast(queryCells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adc.as("adist"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(asc("adist"), col("neighbor_id"))))
      .filter(col("crank") <= sqRescoreDepth)
      .select("query_id", "neighbor_id")
    val qFloats = vecs.filter(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    coarse
      .join(vecs.select(col("vec_id"), col("v")),
        col("neighbor_id") === col("vec_id"))
      .join(broadcast(qFloats), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
      .filter(col("rank") <= knnK)
      .orderBy("query_id", "rank")
  }

  /** Metadata-FILTERED vector search ("hybrid search"): each query's
    * top-k nearest neighbors restricted to vectors sharing its `label`
    * — the retrieval-with-predicate pattern every production vector
    * store needs (pre-filtered search; e.g. same-language or
    * same-collection constraints in a RAG pipeline). The crucial scale
    * move: the metadata predicate becomes an EQUI-JOIN KEY, not a
    * post-filter — candidates are generated only within the query's
    * label slice (|corpus|/|labels| of the data per query) instead of
    * scoring everything and discarding. With the bounded query slice
    * the label join rides a broadcast; with many queries the same plan
    * shuffle-co-locates both sides on label and each slice searches
    * independently — either way the conjunct is what bounds the work.
    * Scoring and ranking reuse [[knnBruteCosine]]'s codegen'd cosine +
    * bounded-PQ rank shape. */
  /** SemDeDup — cluster-routed semantic deduplication (Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): k-means-cluster the embedding space,
    * then compare pairs ONLY within a cluster and flag every vector
    * whose cosine to a lower-id cluster-mate clears the near-dup
    * threshold — the published upper-triangular max-similarity rule, so
    * flagging needs no sequential kept-chain and states cleanly in SQL.
    *
    * Scale shape: the coarse assignment comes from the SHARED IVFADC
    * index (one memoized build, priced by the bench's ann_family_build
    * metric — the r8 shared-artifact discipline), and the pair stage is
    * an EQUI-join on the cell id, embarrassingly parallel across cells
    * with per-cell quadratic work bounded by cluster size. That bound is
    * the operator's deployment knob: at 100 TB the cell count scales
    * with the corpus (SemDeDup used 50k clusters for LAION) so cluster
    * size — not corpus size — caps the pairwise term, and a skewed cell
    * is an AQE skew-join split, not a plan change. The all-pairs
    * alternative is quadratic in the CORPUS; the banded-LSH near-dup
    * family trades recall for no training — this is the trained-index
    * point on that spectrum, the one production semantic-dedup uses.
    *
    * Output: every corpus vector with its cell, its max cosine to any
    * lower-id cluster-mate (null for the cell's first member), and the
    * dup flag at [[nearDupCosine]] — downstream survivor selection is
    * `filter(!is_dup)`. Deviation from the paper: it keeps the member
    * closest-to-centroid per duplicate group; the lower-id rule here is
    * the same one-survivor-per-group guarantee with a deterministic,
    * SQL-stateable order (documented, reference-free choice). The
    * oracle replays the keyed-Lloyd trainer + assignment
    * ([[coarseAssignCtesSql]], parity) and the semantics are pinned by a
    * driver-side brute recompute law in SimilaritySpec. */
  def dedupSemanticKmeans(spark: SparkSession, dir: String): DataFrame = {
    val art = ivfpqArtifactsShared(spark, dir)
    val assigned = emb(spark, dir)
      .join(art.encoded.select(col("vec_id"), col("cell")), Seq("vec_id"))
    val prior = assigned.select(col("cell"), col("vec_id").as("a_id"), col("v").as("av"))
      .join(assigned.select(col("cell"), col("vec_id").as("b_id"), col("v").as("bv")),
        Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .select(col("b_id").as("vec_id"),
        round(cosine(col("av"), col("bv")), 6).as("cos"))
      .groupBy("vec_id").agg(max("cos").as("max_prior_cosine"))
    assigned.select(col("vec_id"), col("cell"))
      .join(prior, Seq("vec_id"), "left")
      .withColumn("is_dup",
        coalesce(col("max_prior_cosine") >= nearDupCosine, lit(false)))
      .select("vec_id", "cell", "is_dup", "max_prior_cosine")
      .orderBy("vec_id")
  }

  def knnFilteredCosine(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"), col("label"))
    val queries = vecs.filter(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("label"))
    vecs.join(broadcast(queries), "label")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("label"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
      .filter(col("rank") <= knnK)
      .orderBy("query_id", "rank")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_filtered_cosine" -> (knnFilteredCosine _),
    "knn_brute_cosine" -> (knnBruteCosine _),
    "ann_sq_cosine" -> (annSqCosine _),
    "ann_lsh_cosine" -> (annLshCosine _),
    "ann_ivf_cosine" -> (annIvfCosine _),
    "ann_recall_ivf" -> (annRecallIvf _),
    "ann_recall_lsh" -> (annRecallLsh _),
    "ann_recall_pq" -> (annRecallPq _),
    "ann_recall_ivfpq" -> (annRecallIvfPq _),
    "ann_pq_cosine" -> (annPqCosine _),
    "ann_ivfpq_cosine" -> (annIvfPqCosine _),
    "dedup_embedding_cosine" -> (dedupEmbeddingCosine _),
    "dedup_embedding_exact" -> (dedupEmbeddingExact _),
    "dedup_embedding_exact_sample" -> (dedupEmbeddingExactSample _),
    "decontaminate_semantic" -> (decontaminateSemantic _),
    "dedup_semantic_kmeans" -> (dedupSemanticKmeans _))

  /** A plane set as SQL literal rows — data-INDEPENDENT (seeded
    * driver-side), so the oracle can carry them verbatim and replicate
    * the whole LSH pipeline: bucket bits → candidate join → exact
    * rescore. Double literals use Java's shortest round-trip decimal
    * form, which DuckDB parses back to the identical bits. */
  private[operators] def planesSql(planes: Array[Array[Array[Double]]]): String =
    planes.zipWithIndex.flatMap { case (table, t) =>
      table.zipWithIndex.map { case (plane, p) =>
        plane.mkString(s"($t, $p, [", ", ", "]::DOUBLE[])")
      }
    }.mkString(",\n            ")

  private def planeValuesSql: String = planesSql(hyperplanes())

  /** CTE chain for the banded near-dup default, ending at
    * `bandedpairs(ia, ib, cosine)` — the thresholded survivor pairs.
    * Replays the ENTIRE pipeline — the normalize-then-dot sequence the
    * tile sweep uses (identical to the `_exact` kernels', so banded ⊆
    * exact holds bit-for-bit on boundary pairs), sign-bit bucketing of
    * the NORMALIZED vectors against the literal planes, the bucket
    * candidate join, threshold on the ROUNDED cosine — so Spark and
    * DuckDB agree exactly regardless of banding recall. Shared by the
    * pair oracles and the semantic-decontamination oracle. */
  private[operators] def bandedPairsCteSql(vecCte: String, idCol: String,
      planes: Array[Array[Array[Double]]], threshold: Double): String =
    s"""$vecCte,
        nv AS (
          SELECT $idCol AS id,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
          FROM v),
        planes(t, p, pl) AS (VALUES
          ${planesSql(planes)}),
        b AS (
          SELECT id, t,
                 string_agg(CASE WHEN list_dot_product(v, pl) >= 0
                            THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
          FROM nv CROSS JOIN planes
          GROUP BY id, t),
        cand AS (
          SELECT DISTINCT x.id AS ia, y.id AS ib
          FROM b x JOIN b y USING (t, bucket)
          WHERE x.id < y.id),
        scored AS (
          SELECT ia, ib,
                 round(list_dot_product(p.v, q.v), 6) AS cosine
          FROM cand
          JOIN nv p ON ia = p.id
          JOIN nv q ON ib = q.id),
        bandedpairs AS (
          SELECT ia, ib, cosine FROM scored WHERE cosine >= $threshold)"""

  /** The pair-set oracle over [[bandedPairsCteSql]]. */
  private[operators] def bandedPairsOracleSql(vecCte: String, idCol: String,
      planes: Array[Array[Array[Double]]], threshold: Double,
      outA: String, outB: String): String =
    s"""WITH ${bandedPairsCteSql(vecCte, idCol, planes, threshold)}
        SELECT ia AS $outA, ib AS $outB, cosine FROM bandedpairs
        ORDER BY $outA, $outB"""

  /** ann_ivf_cosine oracle: replays the ENTIRE integer-exact pipeline —
    * milli-grid quantization, [[ivfIters]] unrolled Lloyd iterations
    * (integer distance argmin, integer cell sums, floor-divided
    * centroids), full-corpus assignment, query probing — in DuckDB SQL,
    * then rescores candidates with the same round-6 cosine as knn/lsh.
    * Integer sums are exact in any aggregation order, so no part of the
    * quantizer depends on engine evaluation order. */
  private def ivfDistSql(a: String, b: String): String =
    s"list_sum(list_transform(range($dim), d -> ($a[d+1]-$b[d+1])*($a[d+1]-$b[d+1])))::BIGINT"

  private def pqDistSql(a: String, b: String): String =
    s"list_sum(list_transform(range($pqSub), d -> ($a[d+1]-$b[d+1])*($a[d+1]-$b[d+1])))::BIGINT"

  /** PQ oracle: ONE keyed Lloyd's replay (subspace `m` as a grouping
    * key — per-m independence makes 8 codebooks train in 5 shared CTE
    * stages), then encode-all, ADC scoring against reconstructed
    * centroids, coarse rank, float rescore. MATERIALIZED throughout
    * (the BPE lesson: plain CTE chains inline exponentially). */
  private def pqOracleSql: String = {
    val iters = (1 to pqIters).map { i =>
      s"""assign$i AS MATERIALIZED (
            SELECT m, vec_id, sq, k FROM (
              SELECT s.m, s.vec_id, s.sq, c.k,
                     row_number() OVER (PARTITION BY s.m, s.vec_id
                       ORDER BY ${pqDistSql("s.sq", "c.c")}, c.k) AS rn
              FROM sub s JOIN cent${i - 1} c ON s.m = c.m)
            WHERE rn = 1),
          cent$i AS MATERIALIZED (
            SELECT p.m, p.k, coalesce(n.c, p.c) AS c
            FROM cent${i - 1} p
            LEFT JOIN (
              SELECT m, k, list(cd ORDER BY d) AS c
              FROM (SELECT m, k, d,
                           floor(sum(sq[d+1])::DOUBLE / count(*))::BIGINT AS cd
                    FROM assign$i, unnest(range($pqSub)) AS u(d)
                    GROUP BY m, k, d)
              GROUP BY m, k) n
            ON p.m = n.m AND p.k = n.k)"""
    }.mkString(",\n          ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          w AS (SELECT vec_id, v,
                       list_transform(v, x -> floor(x * 1000)::BIGINT) AS vq
                FROM v),
          subsAll AS MATERIALIZED (
            SELECT mm.m, w.vec_id,
                   list_slice(w.vq, mm.m * $pqSub + 1, mm.m * $pqSub + $pqSub) AS sq
            FROM w, range(0, $pqM) mm(m)),
          sub AS MATERIALIZED (
            SELECT m, vec_id, sq FROM subsAll WHERE vec_id < $ivfSampleSize),
          cent0 AS MATERIALIZED (
            SELECT m, (row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1)::INT AS k,
                   sq AS c
            FROM sub
            QUALIFY row_number() OVER (PARTITION BY m ORDER BY vec_id) <= $pqK),
          $iters,
          enc AS MATERIALIZED (
            SELECT m, vec_id, k AS code, c FROM (
              SELECT s.m, s.vec_id, c.k, c.c,
                     row_number() OVER (PARTITION BY s.m, s.vec_id
                       ORDER BY ${pqDistSql("s.sq", "c.c")}, c.k) AS rn
              FROM subsAll s JOIN cent$pqIters c ON s.m = c.m)
            WHERE rn = 1),
          qsubs AS (
            SELECT m, vec_id AS query_id, sq AS qsq
            FROM subsAll WHERE vec_id < $nQueries),
          adc AS MATERIALIZED (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   sum(${pqDistSql("q.qsq", "e.c")})::BIGINT AS adist
            FROM qsubs q JOIN enc e ON q.m = e.m
            WHERE e.vec_id <> q.query_id
            GROUP BY 1, 2),
          coarse AS (
            SELECT query_id, neighbor_id FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY adist, neighbor_id) AS crank
              FROM adc)
            WHERE crank <= $sqRescoreDepth),
          scored AS (
            SELECT query_id, neighbor_id,
                   round(list_dot_product(q.v, n.v) /
                         (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 6)
                     AS cosine
            FROM coarse
            JOIN v q ON query_id = q.vec_id
            JOIN v n ON neighbor_id = n.vec_id),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, neighbor_id, cosine, rank
          FROM ranked WHERE rank <= $knnK
          ORDER BY query_id, rank"""
  }

  /** IVFADC oracle: the coarse trainer of [[ivfOracleSql]] (CTEs
    * renamed ccent/cassign), full-corpus assignment WITH residuals,
    * the keyed-Lloyd of [[pqOracleSql]] retrained on residual slices,
    * then ADC joined on (m, CELL) — the cell filter is what this query
    * adds over ann_pq_cosine, and the oracle replays it literally.
    * MATERIALIZED throughout (plain CTE chains inline exponentially). */
  private def ivfpqOracleSql: String = {
    val citers = (1 to ivfIters).map { i =>
      s"""cassign$i AS MATERIALIZED (
            SELECT vec_id, cell, vq FROM (
              SELECT s.vec_id, c.cell, s.vq,
                     row_number() OVER (PARTITION BY s.vec_id
                       ORDER BY ${ivfDistSql("s.vq", "c.c")}, c.cell) AS rn
              FROM samp s CROSS JOIN ccent${i - 1} c)
            WHERE rn = 1),
          ccent$i AS MATERIALIZED (
            SELECT p.cell, coalesce(n.c, p.c) AS c
            FROM ccent${i - 1} p
            LEFT JOIN (
              SELECT cell, list(cd ORDER BY d) AS c
              FROM (SELECT cell, d,
                           floor(sum(vq[d+1])::DOUBLE / count(*))::BIGINT AS cd
                    FROM cassign$i, unnest(range($dim)) AS u(d)
                    GROUP BY cell, d)
              GROUP BY cell) n
            ON p.cell = n.cell)"""
    }.mkString(",\n          ")
    val piters = (1 to pqIters).map { i =>
      s"""passign$i AS MATERIALIZED (
            SELECT m, vec_id, sq, k FROM (
              SELECT s.m, s.vec_id, s.sq, c.k,
                     row_number() OVER (PARTITION BY s.m, s.vec_id
                       ORDER BY ${pqDistSql("s.sq", "c.c")}, c.k) AS rn
              FROM sub s JOIN pcent${i - 1} c ON s.m = c.m)
            WHERE rn = 1),
          pcent$i AS MATERIALIZED (
            SELECT p.m, p.k, coalesce(n.c, p.c) AS c
            FROM pcent${i - 1} p
            LEFT JOIN (
              SELECT m, k, list(cd ORDER BY d) AS c
              FROM (SELECT m, k, d,
                           floor(sum(sq[d+1])::DOUBLE / count(*))::BIGINT AS cd
                    FROM passign$i, unnest(range($pqSub)) AS u(d)
                    GROUP BY m, k, d)
              GROUP BY m, k) n
            ON p.m = n.m AND p.k = n.k)"""
    }.mkString(",\n          ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          w AS (SELECT vec_id, v,
                       list_transform(v, x -> floor(x * 1000)::BIGINT) AS vq
                FROM v),
          samp AS (SELECT vec_id, vq FROM w WHERE vec_id < $ivfSampleSize),
          ccent0 AS (
            SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cell, vq AS c
            FROM samp ORDER BY vec_id LIMIT $ivfCells),
          $citers,
          assigned AS MATERIALIZED (
            SELECT vec_id, v, cell,
                   list_transform(range($dim), d -> vq[d+1] - c[d+1]) AS r
            FROM (
              SELECT w.vec_id, w.v, w.vq, c.cell, c.c,
                     row_number() OVER (PARTITION BY w.vec_id
                       ORDER BY ${ivfDistSql("w.vq", "c.c")}, c.cell) AS rn
              FROM w CROSS JOIN ccent$ivfIters c)
            WHERE rn = 1),
          subsAll AS MATERIALIZED (
            SELECT mm.m, a.vec_id, a.cell,
                   list_slice(a.r, mm.m * $pqSub + 1, mm.m * $pqSub + $pqSub) AS sq
            FROM assigned a, range(0, $pqM) mm(m)),
          sub AS MATERIALIZED (
            SELECT m, vec_id, sq FROM subsAll WHERE vec_id < $ivfSampleSize),
          pcent0 AS MATERIALIZED (
            SELECT m, (row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1)::INT AS k,
                   sq AS c
            FROM sub
            QUALIFY row_number() OVER (PARTITION BY m ORDER BY vec_id) <= $pqK),
          $piters,
          enc AS MATERIALIZED (
            SELECT m, vec_id, cell, c FROM (
              SELECT s.m, s.vec_id, s.cell, c.c,
                     row_number() OVER (PARTITION BY s.m, s.vec_id
                       ORDER BY ${pqDistSql("s.sq", "c.c")}, c.k) AS rn
              FROM subsAll s JOIN pcent$pqIters c ON s.m = c.m)
            WHERE rn = 1),
          qcells AS MATERIALIZED (
            SELECT query_id, cell, qr FROM (
              SELECT w.vec_id AS query_id, c.cell,
                     list_transform(range($dim), d -> w.vq[d+1] - c.c[d+1]) AS qr,
                     row_number() OVER (PARTITION BY w.vec_id
                       ORDER BY ${ivfDistSql("w.vq", "c.c")}, c.cell) AS rn
              FROM w CROSS JOIN ccent$ivfIters c
              WHERE w.vec_id < $nQueries)
            WHERE rn <= $ivfProbes),
          qsubs AS (
            SELECT mm.m, q.query_id, q.cell,
                   list_slice(q.qr, mm.m * $pqSub + 1, mm.m * $pqSub + $pqSub) AS qsq
            FROM qcells q, range(0, $pqM) mm(m)),
          adc AS MATERIALIZED (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   sum(${pqDistSql("q.qsq", "e.c")})::BIGINT AS adist
            FROM qsubs q JOIN enc e ON q.m = e.m AND q.cell = e.cell
            WHERE e.vec_id <> q.query_id
            GROUP BY 1, 2),
          coarse AS (
            SELECT query_id, neighbor_id FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY adist, neighbor_id) AS crank
              FROM adc)
            WHERE crank <= $sqRescoreDepth),
          scored AS (
            SELECT query_id, neighbor_id,
                   round(list_dot_product(q.v, n.v) /
                         (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 6)
                     AS cosine
            FROM coarse
            JOIN v q ON query_id = q.vec_id
            JOIN v n ON neighbor_id = n.vec_id),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, neighbor_id, cosine, rank
          FROM ranked WHERE rank <= $knnK
          ORDER BY query_id, rank"""
  }

  /** WITH-body prefix replaying the integer-exact coarse k-means trainer
    * and assigning EVERY corpus vector to its nearest cell — ends at the
    * `assigned(vec_id, v, cell)` CTE. Shared by [[ivfOracleSql]] and the
    * SemDeDup oracle, so the two replays cannot drift apart. */
  private def coarseAssignCtesSql: String = {
    val iters = (1 to ivfIters).map { i =>
      s"""assign$i AS (
            SELECT vec_id, cell, vq FROM (
              SELECT s.vec_id, c.cell, s.vq,
                     row_number() OVER (PARTITION BY s.vec_id
                       ORDER BY ${ivfDistSql("s.vq", "c.c")}, c.cell) AS rn
              FROM samp s CROSS JOIN cent${i - 1} c)
            WHERE rn = 1),
          cent$i AS (
            SELECT p.cell, coalesce(n.c, p.c) AS c
            FROM cent${i - 1} p
            LEFT JOIN (
              SELECT cell, list(cd ORDER BY d) AS c
              FROM (SELECT cell, d,
                           floor(sum(vq[d+1])::DOUBLE / count(*))::BIGINT AS cd
                    FROM assign$i, unnest(range($dim)) AS u(d)
                    GROUP BY cell, d)
              GROUP BY cell) n
            ON p.cell = n.cell)"""
    }.mkString(",\n          ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          w AS (SELECT vec_id, v,
                       list_transform(v, x -> floor(x * 1000)::BIGINT) AS vq
                FROM v),
          samp AS (SELECT vec_id, vq FROM w WHERE vec_id < $ivfSampleSize),
          cent0 AS (
            SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cell, vq AS c
            FROM samp ORDER BY vec_id LIMIT $ivfCells),
          $iters,
          assigned AS (
            SELECT vec_id, v, cell FROM (
              SELECT w.vec_id, w.v, c.cell,
                     row_number() OVER (PARTITION BY w.vec_id
                       ORDER BY ${ivfDistSql("w.vq", "c.c")}, c.cell) AS rn
              FROM w CROSS JOIN cent$ivfIters c)
            WHERE rn = 1)"""
  }

  private def ivfOracleSql: String = {
    s"""$coarseAssignCtesSql,
          qcells AS (
            SELECT vec_id AS query_id, v AS qv, cell FROM (
              SELECT w.vec_id, w.v, c.cell,
                     row_number() OVER (PARTITION BY w.vec_id
                       ORDER BY ${ivfDistSql("w.vq", "c.c")}, c.cell) AS rn
              FROM w CROSS JOIN cent$ivfIters c
              WHERE w.vec_id < $nQueries)
            WHERE rn <= $ivfProbes),
          cand AS (
            SELECT DISTINCT query_id, a.vec_id AS neighbor_id
            FROM qcells q JOIN assigned a USING (cell)
            WHERE a.vec_id <> q.query_id),
          scored AS (
            SELECT query_id, neighbor_id,
                   round(list_dot_product(q.v, n.v) /
                         (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 6)
                     AS cosine
            FROM cand
            JOIN v q ON query_id = q.vec_id
            JOIN v n ON neighbor_id = n.vec_id),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, neighbor_id, cosine, rank
          FROM ranked WHERE rank <= $knnK
          ORDER BY query_id, rank"""
  }

  /** knn/lsh oracles: same cosine in DuckDB on DOUBLE lists, same
    * tie-break; lsh additionally replays the sign-bit bucketing against
    * the literal hyperplanes; ivf replays the integer-exact quantizer
    * (see [[ivfOracleSql]]). */
  /** The brute-force oracle — shared: it is knn_brute_cosine's oracle
    * AND the ground-truth leg inside ann_recall_ivf's. */
  private def bruteOracleSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < $nQueries),
          scored AS (
            SELECT query_id, vec_id AS neighbor_id,
                   round(list_dot_product(qv, v) /
                         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)
                     AS cosine
            FROM v CROSS JOIN q WHERE vec_id <> query_id),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, neighbor_id, cosine, rank
          FROM ranked WHERE rank <= $knnK
          ORDER BY query_id, rank"""

  /** LSH leg shared by its own oracle entry and the recall matrix. */
  private def lshOracleSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          planes(t, p, pl) AS (VALUES
            $planeValuesSql),
          b AS (
            SELECT vec_id, t,
                   string_agg(CASE WHEN list_dot_product(v, pl) >= 0
                              THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
            FROM v CROSS JOIN planes
            GROUP BY vec_id, t),
          qb AS (SELECT vec_id AS query_id, t, bucket FROM b
                 WHERE vec_id < $nQueries),
          cand AS (
            SELECT DISTINCT query_id, b.vec_id AS neighbor_id
            FROM b JOIN qb USING (t, bucket)
            WHERE b.vec_id <> qb.query_id),
          scored AS (
            SELECT query_id, neighbor_id,
                   round(list_dot_product(q.v, n.v) /
                         (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 6)
                     AS cosine
            FROM cand
            JOIN v q ON query_id = q.vec_id
            JOIN v n ON neighbor_id = n.vec_id),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, neighbor_id, cosine, rank
          FROM ranked WHERE rank <= $knnK
          ORDER BY query_id, rank"""

  /** Recall@k against the brute ground truth with the given ANN leg's
    * FULL oracle composed as a subquery — the evaluation can never
    * drift from what it evaluates. */
  private def recallOracleSql(legSql: String): String =
    s"""SELECT b.query_id,
                 count(*)::BIGINT AS k,
                 sum(CASE WHEN i.neighbor_id IS NOT NULL
                     THEN 1 ELSE 0 END)::BIGINT AS n_hits,
                 (sum(CASE WHEN i.neighbor_id IS NOT NULL
                      THEN 1 ELSE 0 END)::DOUBLE / count(*)) AS recall
          FROM ($bruteOracleSql) b
          LEFT JOIN ($legSql) i
            ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
          GROUP BY b.query_id ORDER BY b.query_id"""

  val oracleSql: Map[String, String] = Map(
    // SemDeDup: replay the keyed-Lloyd trainer + full-corpus assignment
    // (the shared coarseAssignCtesSql — parity), then state the upper-
    // triangular max-similarity rule declaratively: per vector, the max
    // rounded cosine to any LOWER-id cluster-mate, flagged at the
    // near-dup threshold
    "dedup_semantic_kmeans" ->
      s"""$coarseAssignCtesSql,
          pr AS (
            SELECT b.vec_id AS vec_id,
                   round(list_dot_product(a.v, b.v) /
                         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
                     AS cos
            FROM assigned a JOIN assigned b USING (cell)
            WHERE a.vec_id < b.vec_id),
          mx AS (SELECT vec_id, max(cos) AS max_prior_cosine FROM pr GROUP BY 1)
          SELECT a.vec_id, a.cell,
                 coalesce(m.max_prior_cosine >= $nearDupCosine, FALSE) AS is_dup,
                 m.max_prior_cosine
          FROM assigned a LEFT JOIN mx m USING (vec_id)
          ORDER BY a.vec_id""",
    "ann_ivf_cosine" -> ivfOracleSql,
    "ann_pq_cosine" -> pqOracleSql,
    "ann_ivfpq_cosine" -> ivfpqOracleSql,
    "ann_lsh_cosine" -> lshOracleSql,

    // replays the two-stage pipeline verbatim: quantize (same IEEE
    // floor(x·sc + 0.5)), coarse rank on EXACT integer dot products
    // (unrounded — int sums are bit-identical across engines), exact
    // float rescore with the usual 6dp rounding
    "ann_sq_cosine" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          z AS (
            SELECT vec_id, v,
                   127.0 / greatest(list_max(list_transform(v, x -> abs(x))), 1e-30)
                     AS sc
            FROM v),
          qz AS (
            SELECT vec_id, v, list_transform(v, x -> floor(x * sc + 0.5)) AS q
            FROM z),
          qry AS (SELECT vec_id AS query_id, q AS qq, v AS qv FROM qz
                  WHERE vec_id < $nQueries),
          coarse AS (
            SELECT query_id, c.vec_id AS neighbor_id, c.v AS nv,
                   list_dot_product(qq, c.q) /
                     (sqrt(list_dot_product(qq, qq)) * sqrt(list_dot_product(c.q, c.q)))
                     AS acos
            FROM qz c CROSS JOIN qry WHERE c.vec_id <> query_id),
          cand AS (
            SELECT query_id, neighbor_id, nv,
                   row_number() OVER (
                     PARTITION BY query_id ORDER BY acos DESC, neighbor_id) AS crank
            FROM coarse),
          resc AS (
            SELECT query_id, neighbor_id,
                   round(list_dot_product(qv, nv) /
                         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6)
                     AS cosine
            FROM cand JOIN qry USING (query_id)
            WHERE crank <= $sqRescoreDepth),
          ranked AS (
            SELECT query_id, neighbor_id, cosine, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM resc)
          SELECT query_id, neighbor_id, cosine, rank
          FROM ranked WHERE rank <= $knnK
          ORDER BY query_id, rank""",
    "knn_brute_cosine" -> bruteOracleSql,
    // the recall MATRIX: one evaluation shape over every ANN variant,
    // each composing its leg's full replay oracle
    "ann_recall_ivf" -> recallOracleSql(ivfOracleSql),
    "ann_recall_lsh" -> recallOracleSql(lshOracleSql),
    "ann_recall_pq" -> recallOracleSql(pqOracleSql),
    "ann_recall_ivfpq" -> recallOracleSql(ivfpqOracleSql),
    // same scoring arithmetic as knn_brute_cosine; the label predicate
    // appears as the USING join key exactly like the Spark plan
    "knn_filtered_cosine" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
          q AS (SELECT vec_id AS query_id, v AS qv, label FROM v
                WHERE vec_id < $nQueries),
          scored AS (
            SELECT query_id, label, c.vec_id AS neighbor_id,
                   round(list_dot_product(qv, c.v) /
                         (sqrt(list_dot_product(qv, qv)) *
                          sqrt(list_dot_product(c.v, c.v))), 6)
                     AS cosine
            FROM v c JOIN q USING (label) WHERE c.vec_id <> query_id),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, label, neighbor_id, cosine, rank
          FROM ranked WHERE rank <= $knnK
          ORDER BY query_id, rank""",
    "dedup_embedding_cosine" -> bandedPairsOracleSql(
      "v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
      "vec_id", ndPlanesEmb, nearDupCosine, "vec_a", "vec_b"),
    // same banded pair replay as dedup_embedding_cosine, restricted to
    // pairs straddling the held-out benchmark slice; argmax per corpus
    // vector (ties on the rounded cosine break to the lowest bench id —
    // the identical row_number on both engines)
    "decontaminate_semantic" ->
      s"""WITH ${bandedPairsCteSql(
             "v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
             "vec_id", ndPlanesEmb, nearDupCosine)},
          cross_side AS (
            SELECT CASE WHEN ia % ${Dedup.benchMod} = ${Dedup.benchRem}
                        THEN ib ELSE ia END AS vec_id,
                   CASE WHEN ia % ${Dedup.benchMod} = ${Dedup.benchRem}
                        THEN ia ELSE ib END AS bench_id,
                   cosine
            FROM bandedpairs
            WHERE (ia % ${Dedup.benchMod} = ${Dedup.benchRem})
                  <> (ib % ${Dedup.benchMod} = ${Dedup.benchRem})),
          r AS (
            SELECT vec_id, bench_id, cosine,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY cosine DESC, bench_id) AS rk
            FROM cross_side)
          SELECT vec_id, bench_id, cosine FROM r WHERE rk = 1
          ORDER BY vec_id""",
    // bounded-sample twin (r14): the identical brute SQL on the residue
    // slice — DuckDB-feasible at 10-30x the graded scale where the
    // corpus-wide form below is hours-by-construction
    "dedup_embedding_exact_sample" ->
      s"""WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
                       WHERE vec_id % $embSampleMod = $embSampleRem),
          v AS (
            SELECT vec_id,
                   list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS v
            FROM raw),
          scored AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.v, b.v), 6) AS cosine
            FROM v a JOIN v b ON a.vec_id < b.vec_id)
          SELECT vec_a, vec_b, cosine FROM scored
          WHERE cosine >= $nearDupCosine
          ORDER BY vec_a, vec_b""",
    "dedup_embedding_exact" ->
      s"""WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
          v AS (
            SELECT vec_id,
                   list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS v
            FROM raw),
          scored AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.v, b.v), 6) AS cosine
            FROM v a JOIN v b ON a.vec_id < b.vec_id)
          SELECT vec_a, vec_b, cosine FROM scored
          WHERE cosine >= $nearDupCosine
          ORDER BY vec_a, vec_b""")
}
