package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators — the two storage-side plays that decide
  * whether a 100 TB job shuffles/scans at all, demonstrated as
  * registered, oracle-checked queries rather than doc prose:
  *
  *  - '''Bucketed co-located join''': both join sides are written
  *    `bucketBy(N, key)` once; every subsequent equi-join on the key
  *    reads bucket-aligned splits and the SortMergeJoin plans with NO
  *    ShuffleExchange on either side (LakehouseSpec pins the plan). At
  *    100 TB this converts the fact⋈fact shuffle — the single most
  *    expensive exchange in the engine — into a write-time cost paid
  *    once and amortized over every consumer. This is the DataFrame
  *    restatement of the reference's repartition-and-cache idiom
  *    (SURVEY §2 O8/J1 family).
  *
  *  - '''Static partition pruning''': the events table written
  *    `partitionBy(day)` (the universal time-partitioned lake layout),
  *    then a one-day query whose day predicate is a LITERAL — pruning
  *    happens at planning time and the scan lists exactly one
  *    partition directory out of 30 (spec pins `partitionFilters` and
  *    the file count). At 100 TB this is the difference between
  *    reading ~3 TB and reading everything. The literal matters: a
  *    subquery-shaped predicate only prunes at runtime via DPP, which
  *    the graft-synth source demonstrates separately
  *    (SynthSource runtime filtering).
  *
  * Artifacts are memoized per (session, sfDir) like
  * [[graft.sources.OrcQueries]]. Bench: both queries sit in
  * `planPinnedLayouts` (excluded from the timed set — the evidence here
  * is the plan shape, which LakehouseSpec pins; filtered timings and
  * the build costs are recorded in PLANS.md).
  */
object Lakehouse {

  /** Explicit bucket-width override — the A/B hook the r11 sizing curve
    * was measured through. Parsed defensively at first USE, not at
    * object init (r11 advice: a malformed value at init surfaced as an
    * opaque ExceptionInInitializerError from every Lakehouse
    * touchpoint). The env is read once per JVM, so a width A/B needs one
    * process per width; artifact names carry the width, so runs at
    * different widths coexist on disk. */
  private lazy val envBuckets: Option[Int] =
    sys.env.get("SPARK_GRAFT_BUCKETS").map { s =>
      s.toIntOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_BUCKETS must be a positive integer, got '$s'"))
    }

  /** One scan task's worth of bytes — parquet's default row-group size.
    * A bucket much larger than this scans as one oversized task; much
    * smaller and the layout fragments into tiny files. */
  val targetBucketBytes: Long = 128L << 20

  /** Bytes on disk of `dir/<table>.parquet` (single file or a directory
    * of parts); 0 when absent (the empty-feed paths). */
  private[graft] def tableBytes(dir: String, table: String): Long = {
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(sizeOf).sum)
      else if (f.isFile) f.length()
      else 0L
    sizeOf(new java.io.File(dir, s"$table.parquet"))
  }

  private val bmemo =
    scala.collection.mutable.Map.empty[(SparkSession, String, String), Int]

  /** Bucket width DERIVED from table stats (r11 verdict item 5). The r11
    * curve measured that bucket count CAPS scan and join parallelism —
    * the fixture's 8-bucket layout INVERTED the q19 win at sf3 because
    * 8 buckets means 8 scan tasks on a 32-core box — so the default is
    * computed, never a rule-of-thumb constant:
    *
    *   width = max(defaultParallelism, ceil(tableBytes / targetBucketBytes))
    *
    * At 100 TB the byte term derives thousands of buckets (~one default
    * row group each); on the local fixtures the parallelism floor
    * dominates, so the layout never throttles the box. Memoized per
    * (session, dir, table) so every artifact a session builds for a
    * fixture agrees on the width (names carry it); SPARK_GRAFT_BUCKETS
    * overrides for the recorded width A/Bs. */
  def bucketsFor(spark: SparkSession, dir: String, table: String): Int =
    envBuckets.getOrElse(bmemo.synchronized {
      bmemo.getOrElseUpdate((spark, dir, table),
        deriveBuckets(tableBytes(dir, table),
          spark.sparkContext.defaultParallelism))
    })

  /** The derivation itself, pure so LakehouseSpec can pin both regimes:
    * the parallelism floor (fixture scale) and the bytes term (at 100 TB
    * ≈ 800k buckets of ~one row group each on a 1000-executor floor). */
  private[graft] def deriveBuckets(bytes: Long, defaultParallelism: Int): Int = {
    val byBytes = (bytes + targetBucketBytes - 1) / targetBucketBytes
    math.max(math.max(defaultParallelism, 1),
      math.min(byBytes, Int.MaxValue.toLong).toInt)
  }

  /** Writer-side parquet row-group size for the UNBUCKETED layout
    * artifacts (r11 verdict item 6): parquet assigns a row group to the
    * split holding its midpoint, so a FILE's scan parallelism is its
    * row-group count — RowGroupProf measured every single-row-group
    * fixture scanning as one productive task no matter the split confs.
    * The WRITER owns the fix (reader confs cannot split a row group):
    * size groups so the whole layout carries ≥ ~4 groups per core,
    * clamped to [1 MB, 128 MB] — at 100 TB the clamp lands on parquet's
    * default; fixture-scale layouts get the 1 MB floor and with it real
    * scan parallelism and finer min/max skipping granularity. */
  private[graft] def layoutBlockBytes(spark: SparkSession, totalBytes: Long): Long = {
    val par = math.max(spark.sparkContext.defaultParallelism, 1)
    math.min(math.max(totalBytes / (4L * par), 1L << 20), 128L << 20)
  }

  private val memo =
    scala.collection.mutable.Map.empty[(SparkSession, String), (String, String)]
  private val pmemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), String]

  private def tag(dir: String) = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Clears every memoized layout (r11 advice): the builders rebuild
    * (mode=overwrite) on the next touch, so a rebuilt fixture at the
    * same dir can no longer silently reuse stale artifacts. Registered
    * in Bench's memo-clearing block like every other memoized family. */
  def clearMemos(): Unit = {
    memo.synchronized(memo.clear()); pmemo.synchronized(pmemo.clear())
    zmemo.synchronized(zmemo.clear()); q19memo.synchronized(q19memo.clear())
    snapmemo.synchronized(snapmemo.clear()); bmemo.synchronized(bmemo.clear())
  }

  /** Write lineitem + orders bucketed by the join key (once per
    * session/sf). `repartition(N, key)` before the write aligns write
    * tasks with buckets — one file per bucket, no tiny-file fan-out
    * (writer tasks × buckets files otherwise: the small-file problem
    * at 100 TB). Projection to the consumed columns at write time is
    * deliberate: a bucketed artifact is a materialized layout decision
    * and carrying dead columns re-pays their scan forever. */
  def bucketedTablesFor(spark: SparkSession, dir: String): (String, String) =
    memo.synchronized {
      memo.getOrElseUpdate((spark, dir), {
        // width derived from the LARGER side (lineitem): co-located SMJ
        // needs both sides at one width, and the fact side's scan is the
        // parallelism that matters
        val n = bucketsFor(spark, dir, "lineitem")
        val t = s"${tag(dir)}_b$n"
        val liT = s"graft_li_bucketed_$t"
        val ordT = s"graft_ord_bucketed_$t"
        Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("l_qty"))
          .repartition(n, col("l_orderkey"))
          .write.mode("overwrite")
          .bucketBy(n, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"target/graft-bucketed/li_$t")
          .saveAsTable(liT)
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .repartition(n, col("o_orderkey"))
          .write.mode("overwrite")
          .bucketBy(n, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"target/graft-bucketed/ord_$t")
          .saveAsTable(ordT)
        (liT, ordT)
      })
    }

  /** Fact⋈fact join on the bucket key with zero join-side exchanges;
    * the only shuffles left are the (tiny) grouped rollup and the
    * final order. The merge hint keeps the demonstration honest — at
    * sf0.01 AQE would otherwise elect broadcast and the co-location
    * would be untested (at real scale neither side broadcasts and SMJ
    * is what the planner picks unhinted). l_quantity is integral by
    * generation, so the long cast at write time makes the sum exact
    * cross-engine (the integer-cents discipline). */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (liT, ordT) = bucketedTablesFor(spark, dir)
    val li = spark.table(liT)
    val ord = spark.table(ordT)
    li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_qty")).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** Write events day-partitioned (once per session/sf). Partition
    * values come from the data (`to_date(ts)`); 30 distinct days at
    * every sf. */
  def partitionedDirFor(spark: SparkSession, dir: String): String =
    pmemo.synchronized {
      pmemo.getOrElseUpdate((spark, dir), {
        val out = s"target/graft-part-events/${tag(dir)}"
        Tables.events(spark, dir)
          .withColumn("day", to_date(col("ts")))
          .write.mode("overwrite").partitionBy("day")
          // writer-side row-group sizing (see layoutBlockBytes): a
          // pruned one-day read is often ONE file — its scan
          // parallelism is this option
          .option("parquet.block.size",
            layoutBlockBytes(spark, tableBytes(dir, "events")))
          .parquet(out)
        out
      })
    }

  /** One-day rollup over the day-partitioned layout with a LITERAL day
    * predicate — static pruning: the scan's partitionFilters carry the
    * predicate and only that day's directory is listed/read. The day
    * literal is the corpus min day, fetched as a bounded single-row
    * scalar from the original table (the documented scalar-collect
    * class; a deployment passes the day as a job parameter). Values
    * sum as exact micro-unit longs (events.value is 6dp by
    * generation). */
  def partitionedPrune(spark: SparkSession, dir: String): DataFrame = {
    // empty-feed guard (the registry-wide empty-tables pin): an empty
    // events table has no min day to prune to, and its partitioned
    // write would leave a footer-less directory no reader can open —
    // return the empty result instead of building artifacts
    val minRow = Tables.events(spark, dir)
      .agg(min(to_date(col("ts")))).collect()(0)
    if (minRow.isNullAt(0))
      return emptyResult(spark,
        Seq("event_type" -> "string", "n_events" -> "long", "value_micro" -> "long"))
    val minDay = minRow.getDate(0)
    val out = partitionedDirFor(spark, dir)
    spark.read.parquet(out)
      .filter(col("day") === lit(minDay.toString).cast("date"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1e6).cast("long")).as("value_micro"))
      .orderBy("event_type")
  }

  /** Z-layout file count — one z-range per file so min/max footer stats
    * are tight boxes on both dimensions. */
  val zFiles = 16

  private val zmemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), (String, String)]

  /** Write the events table twice: Z-ORDERED on the (ts_micros,
    * value_micro) grid, and a hash-scattered control with the identical
    * schema — the A/B pair LakehouseSpec measures row-group skipping
    * on. Dimensions are time × value — the "values in range during a
    * time window" ops query — and both are derived-but-MATERIALIZED
    * integer columns (unix micros, value micro-units) because a parquet
    * reader can only push predicates on COLUMNS; the expression forms
    * would disable the very stats pruning the layout exists for.
    * (user_id, the natural third dimension, is deliberately NOT a box
    * dim: it is Zipf-skewed by generation, so a min/max-midpoint band
    * on it can be empty — key_skew_profile is the query that measures
    * that skew.) The z key is computed, used for range-partition +
    * in-file sort, then DROPPED: it decides physical order, not
    * schema. Grid coords scale each dimension's span to 16 bits from
    * the corpus min/max (a bounded 4-scalar collect at layout-build
    * time — a deployment's OPTIMIZE job knows these from table
    * stats). */
  def zorderDirsFor(spark: SparkSession, dir: String): (String, String) =
    zmemo.synchronized {
      zmemo.getOrElseUpdate((spark, dir), {
        val t = tag(dir)
        val zOut = s"target/graft-zorder/z_$t"
        val flatOut = s"target/graft-zorder/flat_$t"
        // writer-side row-group sizing (see layoutBlockBytes): min/max
        // skipping granularity IS the row group — a one-group file can
        // only be skipped whole, and both layouts should split the same
        val blockBytes = layoutBlockBytes(spark, tableBytes(dir, "events"))
        val base = Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("ts_micros"),
            round(col("value") * 1e6).cast("long").as("value_micro"))
        // precondition: non-empty feed (callers guard via boundsOf)
        val Array(tmin, tmax, vmin, vmax) = boundsOf(spark, dir).get
        def grid(c: Column, lo: Long, hi: Long): Column =
          ((c - lo) * 65535L / math.max(hi - lo, 1L)).cast("long")
        base
          .withColumn("z", graft.functions.ZOrder.z_value(
            grid(col("ts_micros"), tmin, tmax),
            grid(col("value_micro"), vmin, vmax)))
          .repartitionByRange(zFiles, col("z"))
          .sortWithinPartitions("z")
          .drop("z")
          .write.mode("overwrite")
          .option("parquet.block.size", blockBytes).parquet(zOut)
        base
          .repartition(zFiles, col("event_id"))
          .write.mode("overwrite")
          .option("parquet.block.size", blockBytes).parquet(flatOut)
        (zOut, flatOut)
      })
    }

  /** Corpus min/max of the two box dimensions (integer micros so every
    * bound below is integer arithmetic — exact cross-engine). None on
    * an empty feed (no bounds to grid or box on). */
  private def boundsOf(spark: SparkSession, dir: String): Option[Array[Long]] = {
    val r = Tables.events(spark, dir)
      .agg(min(unix_micros(col("ts").cast("timestamp"))),
        max(unix_micros(col("ts").cast("timestamp"))),
        min(round(col("value") * 1e6).cast("long")),
        max(round(col("value") * 1e6).cast("long"))).collect()(0)
    if (r.isNullAt(0)) None
    else Some(Array(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  /** Empty DataFrame with the query's exact output schema — the shape
    * every empty-feed early return materializes. */
  private def emptyResult(spark: SparkSession,
      cols: Seq[(String, String)]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(cols.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.DataType.fromDDL(t))
    })
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
  }

  /** The middle-decile 2-D box: [45%, 55%] of each dimension's span,
    * all integer arithmetic (truncating division on non-negative spans
    * — identical in Spark and DuckDB). */
  private[graft] def boxBounds(spark: SparkSession, dir: String)
      : (Long, Long, Long, Long) = {
    val Array(tmin, tmax, vmin, vmax) = boundsOf(spark, dir).get
    (tmin + (tmax - tmin) * 45L / 100L, tmin + (tmax - tmin) * 55L / 100L,
      vmin + (vmax - vmin) * 45L / 100L, vmin + (vmax - vmin) * 55L / 100L)
  }

  /** 2-D box rollup over the Z-ORDERED layout — the query shape
    * multi-dimensional clustering exists for: both predicates are plain
    * column ranges, so they push to the parquet reader, and because the
    * layout interleaves both dimensions the row-group min/max stats
    * skip most of the table (LakehouseSpec pins scanned rows ≪ the
    * hash-scattered control's on the SAME query). Partitioning prunes
    * one dimension ([[partitionedPrune]]); z-ordering is the answer
    * when TWO dimensions matter at once — at 100 TB the difference
    * between reading ~1% and reading everything. */
  def zorderBoxAgg(spark: SparkSession, dir: String): DataFrame = {
    // empty-feed guard: no bounds to box on, and the empty layout write
    // would leave footer-less artifacts
    if (boundsOf(spark, dir).isEmpty)
      return emptyResult(spark, Seq("event_type" -> "string",
        "n_events" -> "long", "value_micro_sum" -> "long"))
    val (zOut, _) = zorderDirsFor(spark, dir)
    val (tlo, thi, vlo, vhi) = boxBounds(spark, dir)
    spark.read.parquet(zOut)
      .filter(col("ts_micros").between(tlo, thi) &&
        col("value_micro").between(vlo, vhi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_micro")).as("value_micro_sum"))
      .orderBy("event_type")
  }

  private val q19memo =
    scala.collection.mutable.Map.empty[(SparkSession, String), String]

  /** Lineitem (orderkey, suppkey, shipdate) bucketed+sorted by
    * l_orderkey — the layout [[q19SoleDelayerBucketed]] self-probes.
    * Separate from [[bucketedTablesFor]]'s artifact on purpose: a
    * bucketed table is a materialized projection decision, and q19's
    * probe columns (suppkey, shipdate) are dead weight for the
    * join-rollup consumer (and vice versa). Same bucket-aligned
    * `repartition(N, key)` write discipline. */
  def q19BucketedTableFor(spark: SparkSession, dir: String): String =
    q19memo.synchronized {
      q19memo.getOrElseUpdate((spark, dir), {
        val n = bucketsFor(spark, dir, "lineitem")
        val t = s"${tag(dir)}_b$n"
        val liT = s"graft_li19_bucketed_$t"
        Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .repartition(n, col("l_orderkey"))
          .write.mode("overwrite")
          .bucketBy(n, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"target/graft-bucketed/li19_$t")
          .saveAsTable(liT)
        liT
      })
    }

  /** [[graft.operators.Relational.q19SoleDelayer]] — the TPC-H Q21
    * semi + anti SELF-join pair — replayed on the bucketed-by-orderkey
    * layout, where BOTH fact⋈fact probes run with zero join-side
    * exchanges (LakehouseSpec pins the plan):
    *
    *  - the scan reports `HashPartitioning(l_orderkey, N)`, which
    *    already satisfies the two DISTINCTs' clustered distribution on
    *    (l_orderkey, l_suppkey) — a superset-key aggregate over a
    *    bucketed scan needs no exchange;
    *  - both SortMergeJoins key on l_orderkey, so each side arrives
    *    co-partitioned straight off the layout. The suppkey inequality
    *    rides along as the SMJ's residual condition.
    *
    * This is the engine's strongest 100 TB artifact: the classically
    * hard Q21 shape planning with NO shuffle at all until the final
    * (tiny) per-supplier rollup. Merge hints keep the demonstration
    * honest at small sf, where AQE would otherwise elect broadcast and
    * leave the co-location untested (at real scale neither distinct
    * side broadcasts and SMJ is the unhinted plan). Oracle: identical
    * to q19_sole_delayer's EXISTS / NOT EXISTS form. */
  def q19SoleDelayerBucketed(spark: SparkSession, dir: String): DataFrame = {
    val pairs = spark.table(q19BucketedTableFor(spark, dir))
    val allSup = pairs.select("l_orderkey", "l_suppkey").distinct()
    val late = pairs
      .filter(col("l_shipdate") > lit(Relational.q6CutoffDate).cast("timestamp"))
      .select("l_orderkey", "l_suppkey").distinct()
    val others = allSup.toDF("o_key", "other_supp").hint("merge")
    val lateOthers = late.toDF("o_key", "other_supp").hint("merge")
    late
      .join(others,
        col("l_orderkey") === col("o_key") &&
          col("l_suppkey") =!= col("other_supp"), "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("o_key") &&
          col("l_suppkey") =!= col("other_supp"), "left_anti")
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("n_waiting"))
      .orderBy(desc("n_waiting"), col("suppkey"))
  }

  private val snapmemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), (String, String)]

  /** BOTH snapshot versions materialized bucketed-by-key — how a CDC
    * deployment actually stores them
    * ([[graft.operators.Relational.snapshotDiff]]'s scaladoc makes
    * exactly this claim; this builds it). v2 evolves from v1 with the
    * same deterministic transform as snapshot_diff, then each version
    * is written `bucketBy(N, o_orderkey)` — the evolution is notional
    * (a real pipeline's v2 arrives as its own table); what matters is
    * the layout both versions share. */
  def snapshotBucketedTablesFor(spark: SparkSession, dir: String): (String, String) =
    snapmemo.synchronized {
      snapmemo.getOrElseUpdate((spark, dir), {
        val n = bucketsFor(spark, dir, "orders")
        val t = s"${tag(dir)}_b$n"
        val base = Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        val k = col("o_orderkey")
        val v2 = base.filter(pmod(k, lit(25)) =!= 11)
          .select(k,
            when(pmod(k, lit(10)) === 3, col("o_totalprice") + 1000.0)
              .otherwise(col("o_totalprice")).as("o_totalprice"),
            when(pmod(k, lit(10)) === 3, lit("U"))
              .otherwise(col("o_orderstatus")).as("o_orderstatus"))
          .unionByName(base.filter(pmod(k, lit(100)) === 7)
            .select((-k).as("o_orderkey"), col("o_totalprice"),
              lit("N").as("o_orderstatus")))
        val names = Seq(s"graft_snap_v1_$t" -> base, s"graft_snap_v2_$t" -> v2)
        names.foreach { case (name, df) =>
          df.repartition(n, col("o_orderkey"))
            .write.mode("overwrite")
            .bucketBy(n, "o_orderkey").sortBy("o_orderkey")
            .option("path", s"target/graft-bucketed/${name.stripPrefix("graft_")}")
            .saveAsTable(name)
        }
        (names(0)._1, names(1)._1)
      })
    }

  /** [[graft.operators.Relational.snapshotDiff]] replayed on the
    * co-bucketed snapshot pair: the CDC full-outer diff — the ONE wide
    * join a change-feed reader pays — plans with zero join-side
    * exchanges (LakehouseSpec pins it), because both versions arrive
    * `HashPartitioning(o_orderkey, N)` straight off the layout. At
    * 100 TB this is the difference between re-shuffling two whole
    * snapshots per diff and a merge-scan of co-located buckets. Same
    * oracle as snapshot_diff (the layout never changes the answer);
    * merge hint for the usual small-sf honesty. */
  def snapshotDiffBucketed(spark: SparkSession, dir: String): DataFrame = {
    val (v1T, v2T) = snapshotBucketedTablesFor(spark, dir)
    val a = spark.table(v1T).select(col("o_orderkey").as("ka"),
      col("o_totalprice").as("old_price"), col("o_orderstatus").as("old_status"))
    val b = spark.table(v2T).select(col("o_orderkey").as("kb"),
      col("o_totalprice").as("new_price"), col("o_orderstatus").as("new_status"))
    a.hint("merge").join(b, col("ka") === col("kb"), "full_outer")
      .select(
        coalesce(col("ka"), col("kb")).as("o_orderkey"),
        when(col("ka").isNull, lit("insert"))
          .when(col("kb").isNull, lit("delete"))
          .when(col("old_price") =!= col("new_price") ||
            col("old_status") =!= col("new_status"), lit("update"))
          .otherwise(lit("none")).as("change"),
        col("old_status"), col("new_status"),
        col("old_price"), col("new_price"))
      .filter(col("change") =!= "none")
      .orderBy("o_orderkey")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bucketed_join" -> (bucketedJoin _),
    "partitioned_prune" -> (partitionedPrune _),
    "zorder_box_agg" -> (zorderBoxAgg _),
    "q19_sole_delayer_bucketed" -> (q19SoleDelayerBucketed _),
    "snapshot_diff_bucketed" -> (snapshotDiffBucketed _))

  val oracleSql: Map[String, String] = Map(
    // quantities are integral doubles; both engines aggregate them as
    // longs so the sum is exact (and ::BIGINT keeps DuckDB off HUGEINT)
    "bucketed_join" ->
      """SELECT o_orderpriority,
                count(*)::BIGINT AS n_items,
                sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "partitioned_prune" ->
      """SELECT event_type,
                count(*)::BIGINT AS n_events,
                sum(round(value * 1000000)::BIGINT)::BIGINT AS value_micro
         FROM events
         WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)
         GROUP BY event_type ORDER BY event_type""",
    // same middle-decile box over the ORIGINAL events (the z layout is
    // physical order only; value_micro parity gates the conversion) —
    // integer bounds via truncating division on non-negative spans,
    // identical in both engines
    "zorder_box_agg" ->
      """WITH b AS (
            SELECT min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax,
                   min(round(value * 1000000)::BIGINT) AS vmin,
                   max(round(value * 1000000)::BIGINT) AS vmax
            FROM events),
          e AS (
            SELECT event_type, epoch_us(ts) AS ts_micros,
                   round(value * 1000000)::BIGINT AS value_micro
            FROM events)
          SELECT event_type,
                 count(*)::BIGINT AS n_events,
                 sum(value_micro)::BIGINT AS value_micro_sum
          FROM e, b
          WHERE ts_micros BETWEEN tmin + (tmax - tmin) * 45 // 100
                              AND tmin + (tmax - tmin) * 55 // 100
            AND value_micro BETWEEN vmin + (vmax - vmin) * 45 // 100
                                AND vmin + (vmax - vmin) * 55 // 100
          GROUP BY event_type ORDER BY event_type""",
    // same EXISTS / NOT EXISTS form as q19_sole_delayer — the layout
    // changes the PLAN (zero join-side exchanges), never the answer
    "q19_sole_delayer_bucketed" ->
      s"""WITH late AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_shipdate > TIMESTAMP '${Relational.q6CutoffDate} 00:00:00'),
          allsup AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
          SELECT l.l_suppkey AS suppkey, count(*)::BIGINT AS n_waiting
          FROM late l
          WHERE EXISTS (SELECT 1 FROM allsup a
                        WHERE a.l_orderkey = l.l_orderkey
                          AND a.l_suppkey <> l.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM late o
                            WHERE o.l_orderkey = l.l_orderkey
                              AND o.l_suppkey <> l.l_suppkey)
          GROUP BY 1 ORDER BY n_waiting DESC, suppkey""",
    // identical to snapshot_diff's oracle — the co-bucketed layout
    // changes the PLAN (exchange-free full-outer diff), never the answer
    "snapshot_diff_bucketed" -> Relational.oracleSql("snapshot_diff"))
}
