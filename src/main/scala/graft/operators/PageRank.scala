package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's a4 surface: multi-source personalized PageRank
  * (`RunPersonalizedPageRankBasic.java`) and per-source top-k extraction
  * (`ExtractTopPersonalizedPageRankNodes.java`).
  *
  * Reference mechanics → Spark mapping (SURVEY G1–G5):
  *  - mass distribution (`:105-148`) → explode the adjacency join:
  *    ranks ⋈ edges, contribution = rank/outdeg, `groupBy(dst).sum`.
  *  - log-space `sumLogProbs` (`:595-607`) → plain double sums. The
  *    reference needs log-space because Writable floats underflow on big
  *    graphs; doubles with mass ≥ alpha·(1−alpha)^k keep 10 iterations far
  *    from underflow. Documented deviation; numerics verified in ScalaTest
  *    against a dense driver-side reference implementation.
  *  - dangling mass + teleport (`:308-361,525-539`): the driver collects
  *    one scalar per source per iteration (exactly the reference's
  *    side-file feedback, §3.3) and folds it into the source's teleport:
  *    r'(v) = (1−α)·(Σ contribs + D·[v=s]) + α·[v=s].
  *  - iteration (`:439-444`) → a driver `for` loop over DataFrames with
  *    a lazy `localCheckpoint` per iteration to truncate lineage — without
  *    it the plan doubles every iteration and the optimizer, not the
  *    cluster, becomes the bottleneck.
  *
  * The graph: bipartite part↔supplier edges from lineitem (part p ↔ node
  * P+s for supplier s), both directions, deduplicated. At 100 TB the
  * edge build is one distinct over a projected scan; each iteration is
  * one shuffle keyed by node id — AQE handles degree skew (salt hot nodes
  * if a power-law graph makes one reducer hot).
  */
object PageRank {

  val alpha = 0.15
  val iterations = 10
  val sources: Seq[Long] = Seq(0L, 1L)
  val topK = 20

  /** part↔supplier edges from lineitem; supplier s becomes node maxPart+1+s.
    * Returned RAW (duplicated observations included): [[weightedGraph]]
    * deduplicates behind its single src-keyed exchange, so a distinct
    * here would only add a second (src, dst)-keyed shuffle. */
  def graphEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
    val offset = Tables.part(spark, dir).agg(max("p_partkey")).collect()(0).getLong(0) + 1L
    val fwd = li.select(col("l_partkey").as("src"), (col("l_suppkey") + offset).as("dst"))
    fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** The shared graph build both registered PPR variants consume:
    * adjacency-with-outdegree (cached, pre-partitioned `nPart`-wide on
    * the per-iteration join key `src` — one up-front repartition removes
    * an adjacency-side exchange from all 10 iterations; at cluster scale
    * this is what bucketing the edge table achieves persistently), the
    * outdegree table, the static dangling-node flag, and the loop's
    * partition width. Memoized per (session, dir) exactly like the dedup
    * family, so the second variant pays zero prefix cost; Bench times
    * the build as its own `ppr_family_build` metric and calls
    * [[clearMemos]] between timed runs. Assumes the data under `dir` is
    * immutable for the JVM lifetime (true for the driver's static
    * testdata). */
  private[graft] case class GraphArtifacts(adjW: DataFrame, outdeg: DataFrame,
      hasDangling: Boolean, nPart: Int)

  private val graphMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), GraphArtifacts]

  private[graft] def graphShared(spark: SparkSession, dir: String): GraphArtifacts =
    graphMemo.synchronized {
      graphMemo.getOrElseUpdate((spark, dir), weightedGraph(graphEdges(spark, dir)))
    }

  /** Estimated adjacency bytes per iteration-join partition (Catalyst
    * plan-statistic bytes, ~4 B per edge on this projection — roughly
    * 256k edges per partition). The loop's shuffle width derives from
    * the GRAPH, not the session's global shuffle.partitions: a 1M-edge
    * graph under the bench's 32-partition default spent more wall clock
    * on task/stage orchestration than on rank math (measured sf0.1:
    * 6.8 s → 4.5 s per variant at 8 partitions), while a 100× graph gets
    * a proportionally wider loop instead of 32 overloaded partitions.
    * The statistic is free (no count job); the floor of 8 keeps small
    * graphs parallel and the cap bounds a wild overestimate. */
  val adjBytesPerPartition = 1L << 20
  val maxLoopPartitions = 4096

  /** Loop width for an estimated adjacency byte size — floor 8, linear
    * in the estimate, capped. Pure so ScaleDesignSpec can pin the
    * contract. */
  private[graft] def loopWidthFor(estBytes: BigInt): Int =
    // SPARK_GRAFT_PPR_WIDTH: A/B override (the r7 width sweep that
    // isolated the bypass-merge shuffle-writer cliff — see PLANS.md)
    sys.env.get("SPARK_GRAFT_PPR_WIDTH").map(_.toInt).getOrElse(
      (estBytes / adjBytesPerPartition).min(maxLoopPartitions).max(8).toInt)

  /** (adjacency-with-outdegree, outdegree, hasDangling): the adjacency
    * rows CARRY the source's outdegree, so each of the 10 iterations
    * joins ranks to ONE pre-partitioned cached table instead of
    * ranks⋈outdeg⋈adj — a third of the per-iteration stages gone. The
    * contribution stays the same IEEE division rank/outdeg (the
    * outdegree rides as a column; no reciprocal pre-computation, which
    * would change the rounding).
    *
    * The iteration join inherits adjW's explicit partition count (Spark
    * shuffles the ranks side to MATCH a pre-partitioned build side), so
    * sizing adjW's repartition sizes the whole loop. hasDangling — a
    * static graph property both variants' loops branch on — is computed
    * once here rather than per query execution. */
  private def weightedGraph(edges: DataFrame): GraphArtifacts = {
    val nPart = loopWidthFor(edges.queryExecution.optimizedPlan.stats.sizeInBytes)
    // ONE exchange builds the whole family (r6; previously the edge
    // distinct, the outdegree grouping, and a final repartition each
    // shuffled): hashing by src satisfies the (src, dst) dedup's
    // clustering (subset rule), the outdegree grouping, and the
    // adjacency join's distribution, so everything downstream runs
    // co-located behind the single src-keyed shuffle (ReuseExchange
    // collapses its two consumers within one materializing job). The
    // adjacency is cached sorted-within-partitions on src so each
    // iteration's sort-merge join reads the cached run order instead of
    // re-sorting ~all edges 10 times.
    val e = edges.repartition(nPart, col("src")).dropDuplicates(Seq("src", "dst"))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).cache()
    val adjW = e.join(outdeg, "src").sortWithinPartitions("src").cache()
    // rank can only ever sit on a source or an edge target, so if every
    // such node has out-edges the graph produces no dangling mass and the
    // per-iteration left_anti branch is skipped entirely
    val srcDf = adjW.sparkSession.createDataFrame(sources.map(Tuple1(_))).toDF("source")
    val hasDangling = !adjW.select(col("dst").as("node"))
      .union(srcDf.select(col("source").as("node")))
      .join(outdeg, col("node") === col("src"), "left_anti")
      .isEmpty
    GraphArtifacts(adjW, outdeg, hasDangling, nPart)
  }

  def clearMemos(): Unit = graphMemo.synchronized {
    graphMemo.values.foreach { g => g.adjW.unpersist(); g.outdeg.unpersist() }
    graphMemo.clear()
  }

  /** The registered queries that consume the shared graph build. */
  val familyMembers: Set[String] = Set("ppr_topk", "ppr_topk_log")

  /** Force-materialize the shared graph artifacts (Bench's
    * `ppr_family_build` metric — the same build-once/consume-many shape
    * as `dedup_family_build`). */
  def buildFamilyArtifacts(spark: SparkSession, dir: String): Unit = {
    val g = graphShared(spark, dir)
    g.adjW.count(); g.outdeg.count() // force the cached blocks to materialize
  }

  /** Personalized PageRank ranks for all sources: (source, node, rank).
    * Takes caller-supplied edges (spec entry point; duplicates are
    * deduplicated by the graph build) — caches them for the loop's
    * lifetime only; the registered queries go through the (session, dir)
    * memo instead. */
  def personalizedPageRank(spark: SparkSession, dir: String, edges: DataFrame): DataFrame = {
    val g = weightedGraph(edges)
    try personalizedPageRankLoop(spark, g)._1
    finally { g.adjW.unpersist(); g.outdeg.unpersist() } // don't leak cached blocks across queries
  }

  /** Lazy local checkpoint that KEEPS the frame's hash partitioning.
    * Under AQE, `Dataset.localCheckpoint` records
    * `UnknownPartitioning` on the resulting LogicalRDD (the adaptive
    * plan's partitioning isn't final at plan-capture time — measured on
    * Spark 4.1, eager or lazy), which re-inserts an ENSURE_REQUIREMENTS
    * exchange on the ranks side of every iteration's join. Planning the
    * checkpointed query with AQE off preserves
    * `hashpartitioning(node, nPart)` — and costs nothing here: every
    * exchange in the iteration is an explicit REPARTITION_BY_NUM that
    * AQE would not touch anyway. Only PLANNING happens inside the
    * conf window (localCheckpoint builds the physical plan eagerly even
    * for a lazy checkpoint); downstream queries plan under the session
    * default and still see the preserved partitioning. ScaleDesignSpec
    * pins the whole mechanism. */
  private[graft] def checkpointKeepingPartitioning(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.localCheckpoint(false)
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** Per-iteration artifact naming — the reference's exact shape: its
    * driver writes every iteration to `basePath + "/iter" +
    * formatter.format(i)` with `new DecimalFormat("0000")`
    * (`RunPersonalizedPageRankBasic.java:365,472`), and later phases
    * (including the top-k extractor) read the artifacts back BY NAME —
    * the zero-padding is load-bearing for lexicographic listing.
    * [[pprIterTrace]] uses it; TextGoldenSpec pins it against an actual
    * `DecimalFormat("0000")`. */
  def iterLabel(i: Int): String = "iter" + f"$i%04d"

  /** Debug/replay hook: run the normal-space PPR loop writing each
    * iteration's ranks to `outDir/iter0001 … iterNNNN` — the reference's
    * per-iteration artifact layout, the natural way to inspect rank
    * convergence or resume a divergence hunt at a specific round.
    * Returns the final ranks (same frame the registered queries rank). */
  def pprIterTrace(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val (ranks, ckpts) = personalizedPageRankLoop(spark,
      graphShared(spark, dir), Some(outDir))
    val result = ranks.localCheckpoint(true)
    ckpts.foreach(graft.Tables.releaseCheckpoint)
    result
  }

  /** Returns the final ranks plus every iteration's lazy checkpoint, so
    * callers that materialize a (small) derived result can release the
    * 10 iterations' blocks deterministically instead of leaving ~MBs per
    * run parked in the MemoryStore until a driver GC. */
  private[graft] def personalizedPageRankLoop(spark: SparkSession,
      g: GraphArtifacts, traceDir: Option[String] = None): (DataFrame, Seq[DataFrame]) = {
    val GraphArtifacts(adjW, outdeg, hasDangling, nPart) = g
    val srcDf = spark.createDataFrame(sources.map(Tuple1(_))).toDF("source")

    // Checkpoint cadence, MEASURED at sf0.1/local[32] (min-of-two):
    // per-iteration 11.4 s, every 2nd 12.2 s, only-final 15.4 s — the
    // plan must be truncated EVERY iteration or it doubles per round and
    // the optimizer becomes the bottleneck; it is also the only safe
    // cadence when the dangling branch gives `ranks` two consumers.
    // Round 4 re-measured the eager/lazy axis: LAZY per-iteration
    // checkpoints (same truncation, materialization deferred so the
    // scheduler pipelines iterations without a driver barrier each
    // round) shave ~5%, and caching adj/outdeg PRE-PARTITIONED on src
    // removes an adjacency exchange from every iteration (10.7 → 8.0 s
    // together). Checkpointed blocks still materialize once and are
    // shared by multiple consumers.

    // ranks: one row per (source, node) with nonzero mass; init: source=1.0
    var ranks = srcDf.select(col("source"), col("source").as("node"), lit(1.0).as("rank"))
    val ckpts = Seq.newBuilder[DataFrame]

    for (i <- 1 to iterations) {
      // seed a zero-mass row per source so the teleport term below always
      // has a row to land on, even when the source gets no incoming mass
      val seed = srcDf.select(col("source"), col("source").as("node"),
        lit(0.0).as("contrib"))
      // dangling mass flows to the personalization source (the reference
      // collects it via side files, `RunPersonalizedPageRankBasic.java:
      // 525-539`; here it is just one more contribution into the same
      // shuffle — no extra job, no driver round-trip)
      val edgeContribs = ranks
        .join(adjW, col("node") === col("src"))
        .select(col("source"), col("dst").as("node"),
          (col("rank") / col("outdeg")).as("contrib"))
      val contribs = (if (hasDangling)
        edgeContribs.unionByName(ranks
          .join(outdeg, col("node") === col("src"), "left_anti")
          .select(col("source"), col("source").as("node"), col("rank").as("contrib")))
      else edgeContribs)
        .unionByName(seed)
        // pin the aggregation exchange to the loop's width AND to the
        // NEXT iteration's join key: hashing by node alone satisfies the
        // (source, node) aggregate's clustering (subset rule), so
        // partial+final still run co-located after ONE graph-sized
        // exchange — and the checkpointed ranks come out co-partitioned
        // with the src-keyed cached adjacency, so the next iteration's
        // join inserts NO ranks-side exchange (r6: one exchange per
        // iteration, down from two; ScaleDesignSpec pins the shape)
        .repartition(nPart, col("node"))
        .groupBy("source", "node")
        .agg(sum("contrib").as("mass"))
      val next = contribs
        .withColumn("rank",
          (lit(1.0) - alpha) * col("mass") +
            when(col("node") === col("source"), alpha).otherwise(0.0))
        .select("source", "node", "rank")
      ranks = checkpointKeepingPartitioning(next)
      // trace mode ([[pprIterTrace]]): persist this round's ranks under
      // the reference's iterNNNN layout before the next round consumes
      // them — the write is also what materializes the lazy checkpoint
      traceDir.foreach(d =>
        ranks.write.mode("overwrite").parquet(s"$d/${iterLabel(i)}"))
      ckpts += ranks
    }
    (ranks, ckpts.result())
  }

  /** Log-space PPR — the reference's actual numeric domain
    * (`RunPersonalizedPageRankBasic.java:341-348,595-607`): ranks held as
    * log-masses, incoming mass folded with the custom logsumexp
    * Aggregator (A11), teleport/dangling merged via the same stable
    * log-add. On huge graphs with tiny per-node masses this is what keeps
    * float underflow from zeroing the tail; PageRankSpec asserts
    * exp(logRank) matches the normal-space loop to 1e-9. */
  def personalizedPageRankLog(spark: SparkSession, dir: String, edges: DataFrame): DataFrame = {
    // same pre-partitioned cache + lazy per-iteration checkpoint as the
    // normal-space loop
    val g = weightedGraph(edges)
    try personalizedPageRankLogLoop(spark, g)._1
    finally { g.adjW.unpersist(); g.outdeg.unpersist() }
  }

  /** Same (ranks, iteration checkpoints) contract as
    * [[personalizedPageRankLoop]]. */
  private def personalizedPageRankLogLoop(spark: SparkSession,
      g: GraphArtifacts): (DataFrame, Seq[DataFrame]) = {
    val GraphArtifacts(adjW, outdeg, hasDangling, nPart) = g
    import graft.functions.LogSumExp.logsumexp
    val srcDf = spark.createDataFrame(sources.map(Tuple1(_))).toDF("source")
    val logAlpha = math.log(alpha)
    val log1mAlpha = math.log1p(-alpha)
    var ranks = srcDf.select(col("source"), col("source").as("node"),
      lit(0.0).as("logRank")) // log(1)
    val ckpts = Seq.newBuilder[DataFrame]
    for (_ <- 1 to iterations) {
      val seed = srcDf.select(col("source"), col("source").as("node"),
        lit(Double.NegativeInfinity).as("logContrib")) // log(0)
      val edgeContribs = ranks
        .join(adjW, col("node") === col("src"))
        .select(col("source"), col("dst").as("node"),
          (col("logRank") - log(col("outdeg"))).as("logContrib"))
      // same static-property gate as the normal-space loop: a graph with
      // no dangling nodes contributes an EMPTY frame here, so skipping
      // the per-iteration left_anti join changes nothing numerically
      val contribs = (if (hasDangling)
        edgeContribs.unionByName(ranks
          .join(outdeg, col("node") === col("src"), "left_anti")
          .select(col("source"), col("source").as("node"),
            col("logRank").as("logContrib")))
      else edgeContribs)
        .unionByName(seed)
        // see the normal-space loop: one node-keyed exchange pins the
        // loop width and co-partitions the next iteration's join
        .repartition(nPart, col("node"))
        .groupBy("source", "node")
        .agg(logsumexp(col("logContrib")).as("logMass"))
      ranks = contribs
        .withColumn("logRank",
          when(col("node") === col("source"),
            // logsumexp(log α, log(1−α)+logMass) — the reference's
            // teleport fold, sumLogProbs(alpha-term, mass-term)
            greatest(lit(logAlpha), col("logMass") + log1mAlpha) +
              log1p(exp(
                least(lit(logAlpha), col("logMass") + log1mAlpha) -
                  greatest(lit(logAlpha), col("logMass") + log1mAlpha))))
            .otherwise(col("logMass") + log1mAlpha))
        .select("source", "node", "logRank")
      ranks = checkpointKeepingPartitioning(ranks)
      ckpts += ranks
    }
    (ranks, ckpts.result())
  }

  /** G5/O5: top-k nodes per source by rank (the window form the reference
    * builds with bounded priority queues + a single reducer). */
  def pprTopK(spark: SparkSession, dir: String): DataFrame = {
    val (ranks, ckpts) = personalizedPageRankLoop(spark, graphShared(spark, dir))
    val result = ranks
      // rank by the ROUNDED value (node tiebreak): the oracle engine's
      // summation order differs in the last ulp, so ordering on the raw
      // double would let sub-1e-6 noise pick different top-k rows
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy(round(col("rank"), 6).desc, col("node"))))
      .filter(col("rnk") <= topK)
      .select(col("source"), col("node"), round(col("rank"), 6).as("rank"), col("rnk"))
      // materialize the (sources × k)-row result, then release the 10
      // iterations' checkpoint blocks deterministically — the memoized
      // graph cache stays for the other PPR variant
      .localCheckpoint(true)
    ckpts.foreach(graft.Tables.releaseCheckpoint)
    result.orderBy("source", "rnk")
  }

  /** O5 standalone: top-5 events by value per event_type — the windowed
    * top-k operator on its own, DuckDB-checkable (value is untouched
    * parquet data, bit-exact in both engines). */
  def topkByGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("event_type").orderBy(desc("value"), col("event_id"))))
      .filter(col("rnk") <= 5)
      .select(col("event_type"), col("event_id"), col("value"), col("rnk"))
      .orderBy("event_type", "rnk")

  /** The log-space loop's registered form — the reference's ACTUAL numeric
    * path (`RunPersonalizedPageRankBasic.java:341-348,595-607` runs the
    * whole computation on log-masses with `sumLogProbs`). Emits the
    * per-source top-k by rounded log-rank (monotonic with rank, same
    * tiebreak discipline as [[pprTopK]]). */
  def pprTopKLog(spark: SparkSession, dir: String): DataFrame = {
    val (ranks, ckpts) = personalizedPageRankLogLoop(spark, graphShared(spark, dir))
    val result = ranks
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy(round(col("logRank"), 6).desc, col("node"))))
      .filter(col("rnk") <= topK)
      .select(col("source"), col("node"), round(col("logRank"), 6).as("log_rank"), col("rnk"))
      .localCheckpoint(true) // see pprTopK — release the loop's blocks
    ckpts.foreach(graft.Tables.releaseCheckpoint)
    result.orderBy("source", "rnk")
  }

  /** Triangle counting over the supplier co-occurrence graph — the graph
    * analytic beyond the PPR/CC families, built the way it survives
    * scale rather than the way it reads shortest:
    *
    *  1. '''Bounded-degree projection.''' The co-occurrence projection
    *     ("suppliers sharing a part") is quadratic in per-part degree —
    *     a hot part with 10⁴ suppliers would emit 5·10⁷ pairs. Each
    *     part's supplier list is capped at [[triMaxPerPart]] FIRST
    *     (rank window over suppkey — lowered to the bounded-PQ operator
    *     by TopKRewrite), the standard projection guard.
    *  2. '''Edge-weight top-E cap.''' A small node set under a growing
    *     fact table saturates toward a clique (at sf0.1 the raw
    *     projection is ~50% dense and wedge work exploded to 17 s —
    *     measured, PLANS.md), and NO enumeration trick beats density:
    *     wedges are the work. Real co-occurrence pipelines keep the
    *     STRONGEST edges; here the top [[triEdgeCap]] by
    *     (shared-part count desc, u, v) — a global
    *     TakeOrderedAndProject, scale-safe — bound the graph (and the
    *     wedge cost) independently of sf. Below the cap (sf0.01 and
    *     down) the graph is the full projection.
    *  3. '''Degree-ordered orientation''' (the compact-forward trick,
    *     Latapy 2008): each undirected edge points from its
    *     (degree, id)-smaller endpoint to the larger, so wedge
    *     enumeration is O(m^1.5) instead of Σdeg²; wedge pairs are
    *     ordered by the SAME total order, so a triangle closes iff the
    *     oriented edge lo→hi exists — one equi-join probe, no OR
    *     conditions, no direction ambiguity.
    *
    * All arithmetic is integer-exact. The four statistics are computed
    * EAGERLY over a persisted edge set (≤ [[triEdgeCap]] rows — the
    * persist is bounded by the declared cap, and released before
    * return): a lazy four-way crossJoin of single-row aggregates
    * re-evaluated the whole projection pipeline once per statistic
    * (measured 4× cost, PLANS.md), and wedge + triangle counts fold
    * into ONE pass via a left-join hit marker. The driver payload is
    * four longs. */
  val triMaxPerPart = 20
  val triEdgeCap = 50000
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("part"), col("l_suppkey").as("supp"))
      .distinct()
    val rk = Window.partitionBy("part").orderBy("supp")
    val capped = li.withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= triMaxPerPart).drop("rk")
    val a = capped.as("a"); val b = capped.as("b")
    val edges = a.join(b, col("a.part") === col("b.part") &&
        col("a.supp") < col("b.supp"))
      .select(col("a.supp").as("u"), col("b.supp").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .orderBy(desc("w"), col("u"), col("v")).limit(triEdgeCap)
      .select("u", "v")
    triangleStats(spark, edges)
  }

  /** The orientation + wedge pipeline over an arbitrary deduped
    * undirected edge set (columns `u < v`) — separated from the
    * projection so correctness is pinned on adversarial graphs too
    * (PageRankSpec feeds seeded random graphs where almost every node
    * ties on degree, the case the (deg, id) total order must break). */
  private[graft] def triangleStats(spark: SparkSession, edges: DataFrame): DataFrame = {
    val edgesP = edges.persist()
    try {
      val nEdges = edgesP.count()
      val deg = edgesP.select(col("u").as("n"))
        .unionAll(edgesP.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val nNodes = deg.count()
      // orient u→v when (deg,id)(u) < (deg,id)(v); carry dst's key for
      // the wedge-pair ordering below
      val du = deg.select(col("n").as("u"), col("deg").as("du"))
      val dv = deg.select(col("n").as("v"), col("deg").as("dv"))
      val oriented = edgesP.join(du, "u").join(dv, "v")
        .select(
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")), col("u"))
            .otherwise(col("v")).as("src"),
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")), col("v"))
            .otherwise(col("u")).as("dst"),
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")), col("dv"))
            .otherwise(col("du")).as("ddeg"))
        .persist()
      val e1 = oriented.as("e1"); val e2 = oriented.as("e2")
      val wedges = e1.join(e2, col("e1.src") === col("e2.src") &&
          (col("e1.ddeg") < col("e2.ddeg") ||
            (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))))
        .select(col("e1.dst").as("x"), col("e2.dst").as("y"))
      val closing = oriented
        .select(col("src").as("x"), col("dst").as("y"), lit(1).as("hit"))
      // one pass: every wedge row counted, closed ones marked
      val Array(nWedges, nTriangles) = wedges
        .join(closing, Seq("x", "y"), "left_outer")
        .agg(count(lit(1)).as("w"), count(col("hit")).as("t"))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
      oriented.unpersist(false)
      val sp = spark
      import sp.implicits._
      Seq((nNodes, nEdges, nWedges, nTriangles))
        .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles")
    } finally edgesP.unpersist(false)
  }

  /** The reference's LITERAL output shape for the PPR top-k
    * (`ExtractTopPersonalizedPageRankNodes.java:256` prints
    * `String.format("%.5f %d", pageRank, nodeid)` under a per-source
    * header): one formatted line per (source, rnk) row. Float-format
    * discipline: the value is pre-`round(...,5)`ed so both engines
    * format the decimal-nearest double of an exact 5-decimal value —
    * Java's HALF_UP-on-decimal-expansion and C printf's
    * round-to-nearest-binary then agree on every digit (the same
    * absorb-the-formatter-skew trick as the 6dp hash discipline). */
  def pprTopKText(spark: SparkSession, dir: String): DataFrame =
    pprTopK(spark, dir)
      .select(col("source"), col("rnk"),
        format_string("%.5f %d", round(col("rank"), 5), col("node")).as("line"))
      .orderBy("source", "rnk")

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "triangle_count" -> (triangleCount _),
    "topk_by_group" -> (topkByGroup _),
    "ppr_topk" -> (pprTopK _),
    "ppr_topk_text" -> (pprTopKText _),
    "ppr_topk_log" -> (pprTopKLog _))

  /** The PPR oracle: the driver loop is a FIXED 10 iterations, so it
    * unrolls into 10 chained CTEs generated from the same constants the
    * Spark loop uses — same graph build, same contribution/teleport
    * algebra, same rounded-rank top-k. Cross-engine float discipline:
    * both engines compute rank/outdeg and the 0.85·mass+0.15 teleport as
    * the identical double ops; only the summation ORDER differs (ulp
    * noise ≪ the 6dp rounding both sides apply). */
  private def pprOracleSql: String = {
    val iters = (1 to iterations).map { k =>
      s"""r$k AS MATERIALIZED (
            SELECT source, node,
                   (1.0::DOUBLE - $alpha::DOUBLE) * sum(contrib) +
                   CASE WHEN node = source THEN $alpha::DOUBLE
                        ELSE 0.0::DOUBLE END AS rank
            FROM (
              SELECT r.source, e.dst AS node, r.rank / o.outdeg AS contrib
              FROM r${k - 1} r
              JOIN outdeg o ON r.node = o.src
              JOIN edges e ON r.node = e.src
              UNION ALL
              SELECT r.source, r.source AS node, r.rank AS contrib
              FROM r${k - 1} r LEFT JOIN outdeg o ON r.node = o.src
              WHERE o.src IS NULL
              UNION ALL
              SELECT source, source AS node, 0.0::DOUBLE AS contrib FROM srcs)
            GROUP BY source, node)"""
    }.mkString(",\n")
    s"""WITH off AS (SELECT max(p_partkey) + 1 AS o FROM part),
        edges AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM (
            SELECT l_partkey AS src, l_suppkey + (SELECT o FROM off) AS dst
            FROM lineitem
            UNION ALL
            SELECT l_suppkey + (SELECT o FROM off) AS src, l_partkey AS dst
            FROM lineitem)),
        outdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        srcs AS (SELECT CAST(unnest([${sources.mkString(", ")}]) AS BIGINT) AS source),
        r0 AS (SELECT source, source AS node, 1.0::DOUBLE AS rank FROM srcs),
        $iters,
        ranked AS (
          SELECT source, node, round(rank, 6) AS rank,
                 row_number() OVER (
                   PARTITION BY source ORDER BY round(rank, 6) DESC, node) AS rnk
          FROM r$iterations)
        SELECT source, node, rank, rnk FROM ranked WHERE rnk <= $topK
        ORDER BY source, rnk"""
  }

  /** The log-space PPR oracle: the same 10 unrolled iterations, but every
    * mass is a log-mass and the per-(source,node) combine is the
    * max+ln(Σexp(x−m)) fold (the proven `logsumexp_by_group` oracle
    * shape, two-step because SQL can't nest aggregates). The teleport is
    * the reference's `sumLogProbs(log α, log(1−α)+logMass)` expressed
    * with the identical greatest/least algebra the Spark loop uses.
    * Float discipline:
    *  - the log α / log1p(−α) constants are the Scala doubles embedded in
    *    shortest-round-trip decimal (bit-identical after parse);
    *  - DuckDB 1.0 has no log1p, so the oracle folds with ln(1+exp(d));
    *    d ≤ 0 always, and |ln(1+y) − log1p(y)| ≤ 1 ulp of the result for
    *    y ∈ (2⁻⁵², 1] while below that both sides are ≪ the 6dp rounding
    *    both engines apply — the same transcendental-skew absorb that
    *    keeps the PMI/log10 family green;
    *  - all-(−∞) groups (the seed row before any mass returns to the
    *    source) produce NaN in the discarded CASE branch only. */
  private def pprLogOracleSql: String = {
    val la = math.log(alpha)
    val l1a = math.log1p(-alpha)
    val iters = (1 to iterations).map { k =>
      s"""c$k AS (
            SELECT r.source, e.dst AS node, r.logRank - ln(o.outdeg) AS lc
            FROM lr${k - 1} r
            JOIN outdeg o ON r.node = o.src
            JOIN edges e ON r.node = e.src
            UNION ALL
            SELECT r.source, r.source AS node, r.logRank AS lc
            FROM lr${k - 1} r LEFT JOIN outdeg o ON r.node = o.src
            WHERE o.src IS NULL
            UNION ALL
            SELECT source, source AS node, '-infinity'::DOUBLE AS lc FROM srcs),
          m$k AS (SELECT source, node, max(lc) AS mx FROM c$k GROUP BY 1, 2),
          lr$k AS MATERIALIZED (
            SELECT source, node,
                   CASE WHEN node = source THEN
                     greatest($la::DOUBLE, lm + $l1a::DOUBLE) +
                       ln(1.0::DOUBLE + exp(least($la::DOUBLE, lm + $l1a::DOUBLE) -
                            greatest($la::DOUBLE, lm + $l1a::DOUBLE)))
                   ELSE lm + $l1a::DOUBLE END AS logRank
            FROM (
              SELECT c.source, c.node,
                     CASE WHEN m.mx = '-infinity'::DOUBLE THEN '-infinity'::DOUBLE
                          ELSE m.mx + ln(sum(exp(c.lc - m.mx))) END AS lm
              FROM c$k c JOIN m$k m USING (source, node)
              GROUP BY c.source, c.node, m.mx))"""
    }.mkString(",\n")
    s"""WITH off AS (SELECT max(p_partkey) + 1 AS o FROM part),
        edges AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM (
            SELECT l_partkey AS src, l_suppkey + (SELECT o FROM off) AS dst
            FROM lineitem
            UNION ALL
            SELECT l_suppkey + (SELECT o FROM off) AS src, l_partkey AS dst
            FROM lineitem)),
        outdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        srcs AS (SELECT CAST(unnest([${sources.mkString(", ")}]) AS BIGINT) AS source),
        lr0 AS (SELECT source, source AS node, 0.0::DOUBLE AS logRank FROM srcs),
        $iters,
        ranked AS (
          SELECT source, node, round(logRank, 6) AS log_rank,
                 row_number() OVER (
                   PARTITION BY source ORDER BY round(logRank, 6) DESC, node) AS rnk
          FROM lr$iterations)
        SELECT source, node, log_rank, rnk FROM ranked WHERE rnk <= $topK
        ORDER BY source, rnk"""
  }

  val oracleSql: Map[String, String] = Map(
    // every CTE is MATERIALIZED (r14): DuckDB inlines plain CTEs, so the
    // four scalar statistic subqueries re-evaluated the whole projection
    // pipeline — capped window, pair self-join, grouped edge weights,
    // global top-E sort — once EACH, and the replicated pair projection
    // exhausted >70 GB of spill scratch at sf1 (the one oracle-side
    // failure in the r13 sf1 sweep). Materialized, each stage runs once
    // and the oracle is spill-bounded by the declared caps, like the
    // Spark side it checks (the pprOracleSql precedent exactly).
    "triangle_count" ->
      s"""WITH capped AS MATERIALIZED (
            SELECT part, supp FROM (
              SELECT l_partkey AS part, l_suppkey AS supp,
                     row_number() OVER (PARTITION BY l_partkey
                                        ORDER BY l_suppkey) AS rk
              FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
            WHERE rk <= $triMaxPerPart),
          edges AS MATERIALIZED (
            SELECT u, v FROM (
              SELECT a.supp AS u, b.supp AS v, count(*) AS w
              FROM capped a JOIN capped b
                ON a.part = b.part AND a.supp < b.supp
              GROUP BY 1, 2)
            ORDER BY w DESC, u, v LIMIT $triEdgeCap),
          deg AS MATERIALIZED (
            SELECT n, count(*) AS deg FROM (
              SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
            GROUP BY n),
          oriented AS MATERIALIZED (
            SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
                        THEN u ELSE v END AS src,
                   CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
                        THEN v ELSE u END AS dst,
                   CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
                        THEN d2.deg ELSE d1.deg END AS ddeg
            FROM edges
            JOIN deg d1 ON d1.n = edges.u
            JOIN deg d2 ON d2.n = edges.v),
          wedges AS MATERIALIZED (
            SELECT e1.dst AS x, e2.dst AS y
            FROM oriented e1 JOIN oriented e2
              ON e1.src = e2.src
             AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst)))
          SELECT (SELECT count(*) FROM deg) AS n_nodes,
                 (SELECT count(*) FROM edges) AS n_edges,
                 (SELECT count(*) FROM wedges) AS n_wedges,
                 (SELECT count(*) FROM wedges w
                  JOIN oriented o ON o.src = w.x AND o.dst = w.y) AS n_triangles""",
    "ppr_topk" -> pprOracleSql,
    // the same unrolled-loop oracle, final SELECT lowered to the
    // reference's literal "%.5f %d" line via printf over the
    // pre-rounded value (see [[pprTopKText]] for why the formatters
    // agree digit-for-digit)
    "ppr_topk_text" ->
      s"""WITH fmt_base AS ($pprOracleSql)
          SELECT source, rnk, printf('%.5f %d', round(rank, 5), node) AS line
          FROM fmt_base ORDER BY source, rnk""",
    "ppr_topk_log" -> pprLogOracleSql,
    "topk_by_group" ->
      """WITH ranked AS (
           SELECT event_type, event_id, value,
                  row_number() OVER (
                    PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk
           FROM events)
         SELECT event_type, event_id, value, rnk
         FROM ranked WHERE rnk <= 5
         ORDER BY event_type, rnk""")
}
