package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's a7 taxi-event ingestion, on the reference's OWN graded
  * dataset (`/root/reference/taxi-data`, complete per FIXTURES §2):
  * positional CSV with a per-row layout switch — `yellow` rows carry
  * dropoff lon/lat at indexes 10/11, `green` rows at 8/9
  * (`RegionEventCount.scala:79-90`, SURVEY P7) — and the graded Goldman
  * Sachs / Citigroup bounding boxes (`RegionEventCount.scala:66-75`,
  * SURVEY P6).
  *
  * Everything is Column expressions over a raw text scan: the layout
  * dispatch is a `when/otherwise`, the geo filter a conjunctive range
  * predicate — one pass, no UDF, codegen-friendly. TaxiSpec verifies the
  * distributed pipeline against an independent driver-side parse of the
  * same files and feeds the events through the streaming trend detector.
  */
object TaxiEvents {

  /** Graded bounding boxes (lonMin, lonMax, latMin, latMax). */
  val goldman = (-74.0144185, -74.013777, 40.7138745, 40.7152275)
  val citigroup = (-74.012083, -74.009867, 40.720053, 40.7217236)

  private def inBox(lon: Column, lat: Column,
      box: (Double, Double, Double, Double)): Column =
    lon > box._1 && lon < box._2 && lat > box._3 && lat < box._4

  /** Raw taxi CSV lines → (region, dropoff_ts) for EVERY line: region is
    * null outside both boxes (or malformed), ts null when unparsable.
    * The split array is materialized once in its own projection; the
    * region/ts expressions above it reference the array ATTRIBUTE many
    * times, and CollapseProject's cheap-expression guard keeps the two
    * projections apart — so split runs once per row. (r14: the previous
    * shape inlined `split(value)` as a local Column, so the expression
    * tree reached Catalyst with ~16 split copies in the Filter and 16
    * more in the Project — the captured before-plan shows them all.) */
  private def parseAll(raw: DataFrame): DataFrame = {
    val c = col("c")
    val lon = when(c.getItem(0) === "yellow", c.getItem(10))
      .otherwise(c.getItem(8)).cast("double")
    val lat = when(c.getItem(0) === "yellow", c.getItem(11))
      .otherwise(c.getItem(9)).cast("double")
    val region = when(inBox(lon, lat, goldman), lit("goldman"))
      .when(inBox(lon, lat, citigroup), lit("citigroup"))
    raw
      .select(split(col("value"), ",").as("c"))
      .select(
        region.as("region"),
        to_timestamp(c.getItem(3), "yyyy-MM-dd HH:mm:ss").as("ts"))
  }

  /** In-box events only — the original parse contract (TaxiSpec, dev
    * tools). The hourly pipelines do NOT use this row-level filter: a
    * deterministic filter on derived columns is pushed below the
    * projection with its aliases substituted, which re-inlines the
    * split-heavy region/ts expressions into the Filter — they drop the
    * null groups above the aggregate instead (see [[hourlyCounts]]). */
  def parse(raw: DataFrame): DataFrame =
    parseAll(raw).filter(col("region").isNotNull && col("ts").isNotNull)

  /** Hourly dropoff counts per region with the null-drop ABOVE the
    * aggregate (r14): out-of-box/malformed rows ride into the hash
    * aggregate as a handful of carrier groups (null region × hours —
    * group-count-scale, not row-scale) and are dropped at the group
    * level. The `when(cnt > 0, …)` wrapper is semantically the identity
    * (every emitted group has cnt ≥ 1) but makes both conjuncts
    * reference the aggregate output, which pins the filter above the
    * aggregate — written plainly on the keys it would be pushed back
    * below the projection, re-inlining ~16 `split(value)` copies per
    * row into a Filter (the before-plan's exact shape). Group counts
    * are unchanged: count(1) per (region, window) group never depended
    * on the other groups' rows. */
  private def hourlyCounts(parsed: DataFrame): DataFrame =
    parsed
      .groupBy(col("region"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .filter(when(col("cnt") > 0,
        col("region").isNotNull && col("w").isNotNull).otherwise(lit(false)))

  /** R2 on the real data: hourly dropoff counts per company. The
    * `part-*.csv` filter is applied via pathGlobFilter on ONE directory
    * listing — passing the glob as the load path makes Spark stat each
    * of the 1,440 matched files individually (measured 2.9-7 s vs 0.5 s
    * for the filtered listing on this dataset). */
  def regionHourly(spark: SparkSession, taxiDir: String): DataFrame =
    hourlyCounts(parseAll(
      spark.read.option("pathGlobFilter", "part-*.csv").text(taxiDir)))
      .select(col("region"),
        col("w.start").cast("timestamp_ntz").as("hour_start"), col("cnt"))
      .orderBy("region", "hour_start")

  /** The reference's graded dataset is a FIXED path, not a per-sf table —
    * the registered query ignores the sf dir (every scale factor sees the
    * same 1,440 real files, like the reference's own grading). The
    * default is this machine's layout; other environments point
    * SPARK_GRAFT_TAXI_DIR at their copy of the dataset. */
  val taxiDataDir: String =
    sys.env.getOrElse("SPARK_GRAFT_TAXI_DIR", "/root/reference/taxi-data")

  /** R2's PRODUCTION shape, registered: the same parse → hourly count
    * over the same 1,440 real files, but driven as a Structured
    * Streaming file source (this is how the reference's job actually
    * ingests: a directory being appended to, one batch per arrival).
    * `Trigger.AvailableNow` drains the directory and terminates;
    * `complete` output mode re-emits the full aggregate on the final
    * batch, so the drained result equals the batch query row-for-row and
    * shares its oracle. The bounded result set (regions × hours) is
    * collected off the memory sink and re-created as a local frame so
    * the temp view can be dropped immediately. */
  def regionHourlyStream(spark: SparkSession, taxiDir: String): DataFrame =
    // backfill shape: drain in ONE micro-batch — under AvailableNow the
    // file source caps batches at 1,000 files by default, so the
    // 1,440-file directory paid a second state-store round + complete-
    // mode re-emit for the 440-file tail. A backfill drain wants few,
    // large batches; the reference's per-arrival replay cadence is the
    // _chunked twin below (Verify-gated, PLANS.md-timed — 24 sequential
    // state-store rounds are the semantic there, not a cost to optimize).
    drainRegionHourly(spark, taxiDir, maxFilesPerTrigger = 2000,
      minDataBatches = 1)

  /** The reference's ACTUAL replay semantic (r9 verdict item 5): its job
    * consumes the taxi directory minute-batch by minute-batch with the
    * window-count state evolving across batches (`EventCount.scala:
    * 59-87`). 60 per-minute files per trigger = one hour of arrivals per
    * micro-batch, so the day drains as 24 sequential micro-batches and
    * the hourly-window counts genuinely accumulate in the state store
    * across every batch boundary (compressed 60:1 so the replay stays
    * runnable); the multi-batch discipline is asserted on the progress
    * metrics, and the FINAL complete-mode emission must equal the batch
    * query row-for-row — the drain shares [[regionHourlyOracle]]. */
  def regionHourlyStreamChunked(spark: SparkSession, taxiDir: String): DataFrame =
    drainRegionHourly(spark, taxiDir, maxFilesPerTrigger = 60,
      minDataBatches = 2)

  /** Explicit-path listing threshold while a taxi drain runs. Each
    * micro-batch's getBatch wraps its admitted file list in a relation,
    * and listing MORE paths than `parallelPartitionDiscovery.threshold`
    * (default 32) launches a distributed stat job — ~1,440 single-file
    * tasks per batch here, pure scheduler overhead on a local FS where
    * a driver-side stat is ~40 µs/file. Profiled (TaxiStreamProf, r15):
    * getBatch 2.5-3.0 s → 0.10-0.15 s, warm drain 5.0 → 2.4 s. On a
    * high-latency object store the distributed listing is the right
    * choice again — deployments set SPARK_GRAFT_LIST_THRESHOLD=32 (or
    * lower) to restore it; the conf is restored after the drain either
    * way so nothing else in the session inherits the local default. */
  private val listThreshold: String =
    sys.env.getOrElse("SPARK_GRAFT_LIST_THRESHOLD", "10000")

  private def drainRegionHourly(spark: SparkSession, taxiDir: String,
      maxFilesPerTrigger: Int, minDataBatches: Int): DataFrame = {
    import spark.implicits._
    val sinkName = "taxi_region_hourly_stream_sink"
    spark.catalog.dropTempView(sinkName)
    val listKey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val prevThreshold = spark.conf.getOption(listKey)
    spark.conf.set(listKey, listThreshold)
    // same agg-first shape as the batch query (null carrier groups are a
    // bounded handful of state-store entries, dropped by the stateless
    // post-agg filter inside hourlyCounts)
    val agg = hourlyCounts(parseAll(spark.readStream
      .option("pathGlobFilter", "part-*.csv")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(taxiDir)))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName(sinkName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally {
      q.stop()
      prevThreshold match {
        case Some(v) => spark.conf.set(listKey, v)
        case None => spark.conf.unset(listKey)
      }
    }
    // fail loudly if the drain's batch structure is not the declared one
    // (e.g. a future option change collapsing the chunked replay)
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches >= minDataBatches,
      s"taxi stream drained in $dataBatches data micro-batch(es); " +
        s"expected >= $minDataBatches")
    val rows = spark.table(sinkName)
      .select(col("region"), col("w.start").as("hour_start"), col("cnt"))
      .as[(String, java.sql.Timestamp, Long)].collect().toSeq
    spark.catalog.dropTempView(sinkName)
    rows.toDF("region", "hour_start", "cnt")
      .select(col("region"),
        col("hour_start").cast("timestamp_ntz").as("hour_start"), col("cnt"))
      .orderBy("region", "hour_start")
  }

  /** Both engines read the SAME `part-*.csv` file set (Spark via
    * pathGlobFilter in [[regionHourly]]/[[regionHourlyStream]], DuckDB
    * via its glob) — a stray non-data file in the dataset dir (_SUCCESS,
    * checksums) can never silently diverge the parity surface between
    * the two engines. */
  /** Row budget per compaction output group. */
  val compactionTargetRows = 100000L

  /** Small-file compaction PLAN over the dataset's real 1,440-file
    * layout — the lakehouse maintenance op that decides rewrite batches
    * before any byte moves (Delta OPTIMIZE / Iceberg rewriteDataFiles
    * plan their bin packing exactly this way). Per-file row counts come
    * from ONE distributed scan keyed by `input_file_name()`; the plan
    * itself is next-fit bin packing in file-name order — a running-sum
    * window over a FILE-COUNT-sized table (metadata scale: the window
    * input is one row per file, never per record), with
    * `bin = floor(preceding_rows / target)`. Output is one row per
    * planned output group: files in, rows in, and the file range —
    * what a rewrite job would execute per task. The DuckDB oracle reads
    * the same files with `filename=true` and replays the identical
    * window arithmetic, so the plan is hash-gated end to end. */
  def compactionPlan(spark: SparkSession, taxiDir: String): DataFrame = {
    val perFile = spark.read.option("pathGlobFilter", "part-*.csv").text(taxiDir)
      .select(regexp_extract(input_file_name(), "([^/]+)$", 1).as("fname"))
      .groupBy("fname").agg(count(lit(1)).as("n_rows"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("fname")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perFile
      .withColumn("prev_rows", coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .withColumn("bin_id",
        floor(col("prev_rows").cast("double") / compactionTargetRows).cast("long"))
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
        min(col("fname")).as("first_file"), max(col("fname")).as("last_file"))
      .orderBy("bin_id")
  }

  /** EXECUTE the [[compactionPlan]] (r9 verdict item 8): rewrite the
    * 1,440-file per-minute layout into one file per planned bin — the
    * rewrite leg of Delta OPTIMIZE / Iceberg rewriteDataFiles. The plan
    * is file-count-sized metadata, so it broadcasts; every line routes to
    * its bin via the plan's [first_file, last_file] range, and
    * `repartition(nBins, bin_id)` + `partitionBy` lands exactly one task
    * (hence one file) per output group — the distributed rewrite a
    * 100 TB table would run, no driver funnel. Returns the plan row
    * count; TaxiSpec gates per-bin row-count parity plan-vs-rewrite. */
  def compactionRewrite(spark: SparkSession, taxiDir: String,
      outDir: String): Long = {
    val plan = compactionPlan(spark, taxiDir)
      .select("bin_id", "first_file", "last_file")
    val nBins = plan.count()
    val lines = spark.read.option("pathGlobFilter", "part-*.csv").text(taxiDir)
      .select(col("value"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("fname"))
    lines
      .join(broadcast(plan),
        col("fname") >= col("first_file") && col("fname") <= col("last_file"))
      .repartition(nBins.toInt, col("bin_id"))
      .select(col("value"), col("bin_id"))
      .write.partitionBy("bin_id").mode("overwrite").text(outDir)
    nBins
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "taxi_region_hourly" ->
      ((s: SparkSession, _: String) => regionHourly(s, taxiDataDir)),
    "taxi_region_hourly_stream" ->
      ((s: SparkSession, _: String) => regionHourlyStream(s, taxiDataDir)),
    "taxi_region_hourly_stream_chunked" ->
      ((s: SparkSession, _: String) => regionHourlyStreamChunked(s, taxiDataDir)),
    "taxi_compaction_plan" ->
      ((s: SparkSession, _: String) => compactionPlan(s, taxiDataDir)))

  /** Oracle over the SAME raw files: DuckDB reads whole lines (a 0x01
    * delimiter that never occurs in the data), splits positionally, and
    * replays the yellow/green layout dispatch, the bounding boxes, and
    * the hour bucket. `try_cast`/`try_strptime` mirror Spark's
    * null-on-malformed cast semantics; lon/lat strings parse to identical
    * IEEE doubles in both engines, and the box predicate compares those
    * raw doubles — no arithmetic, no rounding needed. */
  val oracleSql: Map[String, String] = Map(
    // the streaming form must reproduce the batch result exactly — same
    // oracle text (the driver runs it independently per query name)
    "taxi_region_hourly_stream" -> regionHourlyOracle,
    "taxi_region_hourly_stream_chunked" -> regionHourlyOracle,
    "taxi_region_hourly" -> regionHourlyOracle,
    // same files via filename=true; identical next-fit window arithmetic
    "taxi_compaction_plan" ->
      s"""WITH raw AS (
            SELECT filename
            FROM read_csv('$taxiDataDir/part-*.csv',
                          delim=e'\\x01', header=false, quote='', escape='',
                          columns={'column0': 'VARCHAR'}, filename=true)),
          f AS (
            SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
                   count(*) AS n_rows
            FROM raw GROUP BY 1),
          c AS (
            SELECT fname, n_rows,
                   coalesce(sum(n_rows) OVER (ORDER BY fname
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS prev_rows
            FROM f),
          b AS (
            SELECT floor(prev_rows::DOUBLE / $compactionTargetRows)::BIGINT
                     AS bin_id, fname, n_rows
            FROM c)
          SELECT bin_id, count(*) AS n_files, sum(n_rows)::BIGINT AS n_rows,
                 min(fname) AS first_file, max(fname) AS last_file
          FROM b GROUP BY 1 ORDER BY 1""")

  private lazy val regionHourlyOracle: String = {
      val g = goldman
      val c = citigroup
      s"""WITH raw AS (
           SELECT column0 AS value
           FROM read_csv('$taxiDataDir/part-*.csv',
                         delim=e'\\x01', header=false, quote='', escape='',
                         columns={'column0': 'VARCHAR'})),
         p AS (SELECT string_split(value, ',') AS c FROM raw),
         f AS (
           SELECT CASE WHEN c[1] = 'yellow' THEN try_cast(c[11] AS DOUBLE)
                       ELSE try_cast(c[9] AS DOUBLE) END AS lon,
                  CASE WHEN c[1] = 'yellow' THEN try_cast(c[12] AS DOUBLE)
                       ELSE try_cast(c[10] AS DOUBLE) END AS lat,
                  try_strptime(c[4], '%Y-%m-%d %H:%M:%S') AS ts
           FROM p),
         r AS (
           SELECT CASE WHEN lon > ${g._1} AND lon < ${g._2}
                        AND lat > ${g._3} AND lat < ${g._4} THEN 'goldman'
                       WHEN lon > ${c._1} AND lon < ${c._2}
                        AND lat > ${c._3} AND lat < ${c._4} THEN 'citigroup'
                  END AS region, ts
           FROM f)
         SELECT region, date_trunc('hour', ts) AS hour_start, count(*) AS cnt
         FROM r WHERE region IS NOT NULL AND ts IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2"""
  }
}
