package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-equivalent forms of the reference's a7 streaming computations
  * over the `events` table (`event_id, ts, user_id, event_type, value`):
  * hourly tumbling counts (`EventCount.scala:67-70`), region-keyed counts
  * (`RegionEventCount.scala:77-114`), and the trend detector
  * (`TrendingArrivals.scala:47-68`).
  *
  * These are the DuckDB-checkable batch semantics; the true Structured
  * Streaming variants (file/memory source, `Trigger.AvailableNow`,
  * `flatMapGroupsWithState`) live in `graft.streaming` and are verified by
  * ScalaTest to produce the SAME rows as these batch queries — the
  * batch/stream agreement is the differential test.
  *
  * The taxi geo bounding boxes (`RegionEventCount.scala:66-75`) have no
  * lon/lat analog in testdata; the band predicate on `value` plays the
  * same role (P6): a conjunctive range filter that routes each event to a
  * named region.
  */
/** One replayed event for the stream-stream join feed (snake_case fields
  * so the encoder round-trips the events table's column names). */
case class UserEvent(event_id: Long, user_id: Long, event_type: String,
                     tsMicros: Long)

object EventAnalytics {

  /** Value-band "regions" — the bounding-box analog. */
  def regionOf(value: Column): Column =
    when(value >= 75.0, lit("high"))
      .when(value < 25.0, lit("low"))
      .otherwise(lit(null).cast("string"))

  /** R1: tumbling hourly count of all events. `window()` is the streaming
    * primitive; its epoch-aligned start equals DuckDB's time_bucket. */
  /** Time-series resampling with forward-fill — the feature-pipeline
    * staple Spark has no single operator for, built by composition:
    * (1) aggregate onto the hourly grid cells that HAVE data (max keeps
    * the value exact — carried, never arithmetic); (2) generate the
    * complete regular grid with `sequence()` from the global bounds —
    * one scalar row exploded, crossed with the distinct types, both
    * bounded (types × hours); (3) left-join the sparse aggregate onto
    * the grid and close gaps with an ignore-nulls `last` over the
    * per-type hour order. Hours before a type's first observation
    * remain NULL — there is nothing to carry forward, and inventing a
    * value would silently fabricate features. At 100 TB the plan is one
    * shuffle for the hourly agg + one broadcast-able grid join; the
    * fill window partitions by type, so no global sort.
    *
    * The grid cross-product is the one step that REQUIRES a bounded
    * series-key set (series × hours explodes otherwise — exactly the
    * shape the registry's join audit exists to catch), so the bound is
    * LOUD, not a silent truncation: the distinct keys are collected
    * under a maxSeries+1 limit (a bounded driver fetch, the
    * knn_brute_cosine pattern) and a feed with more series than the
    * bound fails with instructions rather than gridding a
    * nondeterministic subset that would silently diverge from the
    * all-types oracle. Resampling an unbounded key set (e.g. per-user)
    * is a different operator — window it per partition, don't grid it. */
  val maxSeries = 64

  def eventsResample(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"), col("value"))
    // ONE raw scan (r14; was three): the grid bounds and the series-key
    // set are both derivable from the hourly aggregate — min/max of the
    // aggregate's hour equals min/max of the truncated feed, and its
    // event_type set equals the feed's distinct types. The aggregate is
    // series × hours rows (bounded), so the per-query localCheckpoint
    // pins it to one evaluation instead of replaying the full scan for
    // each of its three consumers (grid bounds, key collect, fill join).
    val hourly = ev.groupBy("event_type", "hour").agg(max("value").as("hmax"))
      .localCheckpoint()
    val grid = hourly.agg(min("hour").as("lo"), max("hour").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hour")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val keys = hourly.select("event_type").distinct().limit(maxSeries + 1).collect()
    require(keys.length <= maxSeries,
      s"events_resample grids series × hours and the feed has more than " +
        s"$maxSeries event types — resample per-key with a window instead " +
        s"of the grid, or raise maxSeries deliberately")
    import spark.implicits._
    keys.map(_.getString(0)).toSeq.toDF("event_type")
      .crossJoin(grid)
      .join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour").as("hour_start"),
        last(col("hmax"), ignoreNulls = true).over(w).as("filled"))
      .orderBy("event_type", "hour_start")
  }

  /** The UNORDERED hourly-count definition — the registrable
    * materialized-view form (a table, not a result list); the registered
    * query adds the ORDER BY above it. */
  def eventCountHourlyDef(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("hour_start"), col("cnt"))

  def eventCountHourly(spark: SparkSession, dir: String): DataFrame =
    eventCountHourlyDef(spark, dir).orderBy("hour_start")

  /** The transparent MV rewrite ([[graft.plans.MVRewrite]]) driven as a
    * registered, oracle-checked query: register the hourly-count
    * definition as a materialized view, run the UNCHANGED
    * [[eventCountHourly]] query, and return its rows — which now come
    * from the materialization, not the events scan. The `require` makes
    * the query fail loudly if the rewrite ever stops engaging (a
    * registered query that silently tested the ordinary path would be
    * worse than no query). The collect is bounded by the feed's hourly
    * grid (≤ |hours| rows — time-bounded, not sf-bounded, the
    * events_resample discipline) and exists so the view registry can be
    * CLEARED before returning — leaving it registered would silently
    * rewrite every later event_count_hourly run in the same session
    * (Verify and the bench share one session across queries). */
  def mvHourlyRewrite(spark: SparkSession, dir: String): DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-mv")
    val path = tmpRoot.toString + "/hourly_counts"
    graft.plans.MaterializedViews.register("hourly_counts",
      eventCountHourlyDef(spark, dir), path)
    try {
      val df = eventCountHourly(spark, dir)
      val usesMv = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.exists(_.toString.contains("hourly_counts"))
            case _ => false
          }
      }.exists(identity)
      require(usesMv, "MV rewrite did not engage — the registered query " +
        "would be exercising the ordinary plan")
      val rows = df.collect()
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.toSeq.asJava, df.schema).orderBy("hour_start")
    } finally {
      graft.plans.MaterializedViews.clear()
      // the materialization is per-invocation scratch — delete it so
      // repeated verify/bench sessions don't leak one parquet dir per run
      org.apache.commons.io.FileUtils.deleteQuietly(tmpRoot.toFile)
    }
  }

  /** As-of join (a mandate-named operator Spark lacks natively): for every
    * event, the timestamp of that user's most recent PREVIOUS 'error'
    * event. Implemented by composition — the preferred rung of the
    * custom-operator ladder: tag the build side, then an ordered running
    * `max` over the per-user window. One shuffle on the key, no custom
    * physical operator needed; semantics match DuckDB's native ASOF JOIN
    * (backward, inclusive) which the oracle mirrors with the same window
    * formulation. */
  def asofLastError(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("err_ts", when(col("event_type") === "error", col("ts")))
      .withColumn("last_error_ts", max(col("err_ts")).over(w))
      .select("event_id", "user_id", "ts", "last_error_ts")
      .orderBy("event_id")
  }

  /** Range (interval) join — the other mandate-named join Spark lacks as
    * a native operator: purchases paired with same-user errors within the
    * preceding 5 minutes. Bucketing both sides to the interval width and
    * joining on (user, bucket ± 1) turns the inequality join into an
    * equi-join + residual filter — the scale path; a bare inequality
    * condition would fall back to a nested-loop join. */
  private def intervalJoinParts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val intervalSec = 300L
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .withColumn("bucket", (unix_timestamp(col("p_ts").cast("timestamp")) / intervalSec).cast("long"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("e_ts"))
      .withColumn("e_bucket", (unix_timestamp(col("e_ts").cast("timestamp")) / intervalSec).cast("long"))
    val inner = purchases
      .withColumn("probe_bucket", explode(array(col("bucket") - 1, col("bucket"))))
      .join(errors, col("probe_bucket") === col("e_bucket") &&
        purchases("user_id") === errors("user_id"))
      .filter(col("e_ts") <= col("p_ts") &&
        col("e_ts") > col("p_ts") - expr(s"INTERVAL $intervalSec SECONDS"))
      .select(col("purchase_id"), col("error_id"), purchases("user_id"))
    (purchases, inner)
  }

  def intervalJoinErrors(spark: SparkSession, dir: String): DataFrame =
    intervalJoinParts(spark, dir)._2.orderBy("purchase_id", "error_id")

  /** LEFT OUTER interval join: every purchase appears, unmatched ones
    * with a null error_id. A naive left-outer over the bucket-exploded
    * probe side would fabricate one null row per probe bucket, so the
    * outer shape is inner ∪ (purchases left_anti matched) — the
    * equi-join scale path is preserved and the anti join runs on the
    * already-tiny matched keyset. An unmatched purchase has exactly one
    * (null) row, so no ordering tie between null and a real error_id
    * can exist within a purchase_id. */
  def intervalJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, inner) = intervalJoinParts(spark, dir)
    val unmatched = purchases
      .join(inner.select("purchase_id").distinct(), Seq("purchase_id"), "left_anti")
      .select(col("purchase_id"), lit(null).cast("long").as("error_id"),
        col("user_id"))
    inner.unionByName(unmatched).orderBy("purchase_id", "error_id")
  }

  /** Sliding (not just tumbling) window — beyond the reference, which
    * only ever uses window == slide (`EventCount.scala:67-70`): 1-hour
    * windows sliding every 30 minutes; each event lands in two windows.
    * The oracle expands the same two bucket memberships by hand. */
  def eventCountSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("win_start"), col("cnt"))
      .orderBy("win_start")

  /** Session windows (absent from the reference, SURVEY §2.9 "not
    * present"): per-user sessions closed by a 30-minute inactivity gap.
    * `session_window` is the streaming-native form; the oracle rebuilds
    * identical sessions with the gaps-and-islands window idiom. */
  def userSessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
      .orderBy("user_id", "session_start")

  /** R2: hourly counts keyed by region (events outside both bands drop,
    * exactly like taxi events outside both geo boxes). */
  def regionEventCount(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("region", regionOf(col("value")))
      .filter(col("region").isNotNull)
      .groupBy(col("region"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("region"), col("w.start").as("hour_start"), col("cnt"))
      .orderBy("region", "hour_start")

  /** R4 batch form: per (event_type, 10-min window) arrival counts with
    * the previous window's count and the reference's trend predicate
    * `cur ≥ 2·prev && cur ≥ 10` (`TrendingArrivals.scala:53`). `prev` is
    * the count of the window exactly 10 minutes earlier (0 if absent) —
    * gap semantics identical to the streaming state machine. */
  def trendingArrivals(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type"), window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("cur"))
      .select(col("event_type"), col("w.start").as("win_start"), col("cur"))
    val prev = counts.select(
      col("event_type"),
      (col("win_start") + expr("INTERVAL 10 MINUTES")).as("win_start"),
      col("cur").as("prev"))
    counts.join(prev, Seq("event_type", "win_start"), "left")
      .na.fill(0L, Seq("prev"))
      .withColumn("is_trending", col("cur") >= col("prev") * 2 && col("cur") >= 10)
      .orderBy("event_type", "win_start")
  }

  /** R4 out-of-order variant, REGISTERED: replays the events table as a
    * real Structured Streaming run through the buffered
    * (`allowedLatenessWindows = 1`) trend state machine with a
    * deterministic late-arrival schedule, and must reproduce the batch
    * [[trendingArrivals]] answer exactly (same oracle SQL) — the lateness
    * folds and the event-time-timeout flush of trailing windows are what
    * make the outputs equal.
    *
    * Schedule (all deterministic): the first three populated windows are
    * fed one batch per window with an md5-chosen third of their events
    * HELD BACK and delivered two batches later — i.e. after the NEXT
    * window has opened, so the straggler lands in the buffered window,
    * not the open one. Remaining events stream in timestamp order in one
    * batch, and two sentinel-key events past the last horizon advance
    * the watermark so every trailing window flushes via timeout (no
    * successor events exist for them).
    *
    * r13: the schedule is computed as DataFrame expressions (window and
    * md5-straggler columns select a batch index per event) and
    * materialized as one chunk FILE per batch, drained through a real
    * FileStreamSource one file per trigger — the feed never visits the
    * driver (the only driver reads are ≤4-row window-boundary fetches).
    * The counts inside a batch are order-insensitive, so chunk files
    * need no internal ordering; batch BOUNDARIES carry the whole
    * schedule. The production-shape streaming entry points are the
    * unbounded jobs in `graft.streaming`. */
  val lateWindowMicros = 600L * 1000 * 1000
  private val lateSentinelKey = "_late_sentinel"

  def trendingArrivalsLate(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{KeyedEvent, StreamingJobs}
    import spark.implicits._
    val W = lateWindowMicros
    val ev = Tables.events(spark, dir)
      .select(col("event_type").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
    val sinkName = "trending_arrivals_late_sink"
    spark.catalog.dropTempView(sinkName)
    if (ev.isEmpty)
      return Seq.empty[(String, java.sql.Timestamp, Long, Long, Boolean)]
        .toDF("event_type", "win_start", "cur", "prev", "is_trending")
        .select(col("event_type"),
          col("win_start").cast("timestamp_ntz").as("win_start"),
          col("cur"), col("prev"), col("is_trending"))
    val winC = col("tsMicros") - col("tsMicros") % W
    // the md5-first-byte straggler choice, as an expression: substring
    // 1..2 of the hex digest IS the first digest byte, so
    // conv(.,16,10) % 3 == 0 selects the same deterministic third the
    // pre-r13 driver-side schedule chose
    val stragglerC = (conv(substring(
      md5(concat_ws("_", col("key"), col("tsMicros"))), 1, 2), 16, 10)
      .cast("long") % 3) === 0
    // window-boundary facts, as BOUNDED driver fetches (≤4 rows + two
    // scalars), not a feed collect
    val winDf = ev.select(winC.as("w")).distinct()
    val head4 = winDf.orderBy("w").take(4).map(_.getLong(0))
    val winStats = winDf.agg(count(lit(1)), max(col("w"))).head()
    val nWindows = winStats.getLong(0)
    val lastWin = winStats.getLong(1)
    // the held-back schedule is only watermark-safe when the first four
    // populated windows are W-contiguous: with a gap, the global
    // watermark (batch max − 2W) advanced by a later on-time batch can
    // pass a held-back third's timestamps, and Spark's pre-stateful late
    // filter would silently drop them — breaking batch parity on a
    // sparser dataset. Non-contiguous prefixes fall back to the
    // single-batch replay (still a real streaming run through the same
    // buffered state machine).
    val earlyContiguous = nWindows >= 6 && head4.length == 4 &&
      head4.zip(head4.drop(1)).forall { case (a, b) => b - a == W }
    // batch index per event — the first three populated windows get
    // per-window batches with the straggler third delayed until AFTER
    // the next window's batch (one window late, inside the buffer
    // horizon); window 4 is fed complete so the last straggler batch
    // still precedes `rest` (a straggler arriving after `rest` would be
    // beyond the horizon and would drop, breaking batch parity)
    val batchC =
      if (!earlyContiguous) lit(0)
      else when(winC === head4(0) && !stragglerC, 0)
        .when(winC === head4(1) && !stragglerC, 1)
        .when(winC === head4(0) && stragglerC, 2)
        .when(winC === head4(2) && !stragglerC, 3)
        .when(winC === head4(1) && stragglerC, 4)
        .when(winC === head4(3), 5)
        .when(winC === head4(2) && stragglerC, 6)
        .otherwise(7)
    val work = java.nio.file.Files.createTempDirectory("graft-late-chunks")
    try {
      // one chunk FILE per schedule batch (ascending mtimes = admission
      // order), one file per trigger — batch boundaries carry the
      // schedule; the within-batch counts are order-insensitive
      java.nio.file.Files.createDirectories(work.resolve("chunks"))
      val tagged = ev.withColumn("batch", batchC)
      val presentBatches = tagged.groupBy("batch").count()
        .orderBy("batch").take(16).map(_.getInt(0))
      var idx = 0
      for (b <- presentBatches) {
        appendChunk(work, tagged.filter(col("batch") === b)
          .select("key", "tsMicros"), idx)
        idx += 1
      }
      // sentinels must push the watermark (which lags by the 2-window
      // lateness delay) past every real key's flush horizon: last open
      // window end + 1 lateness window + 2 windows of watermark lag
      val sentinelTs = lastWin + 5 * W
      for (ts <- Seq(sentinelTs, sentinelTs + W)) {
        appendChunk(work, Seq(KeyedEvent(lateSentinelKey, ts)).toDS()
          .select("key", "tsMicros"), idx)
        idx += 1
      }
      val q = StreamingJobs.detectTrends(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(work.resolve("chunks").toString)
          .as[KeyedEvent],
        W, allowedLatenessWindows = 1, timeoutFlush = true)
        .writeStream.outputMode("append").format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        q.awaitTermination()
        // the schedule is constructed so the pre-stateful watermark filter
        // drops NOTHING (hold-backs stay inside the lateness horizon, and
        // the non-contiguous fallback above avoids the gap hazard). If
        // cross-key skew or a schedule bug ever violates that, fail HERE,
        // attributably, instead of as a silent oracle hash mismatch
        // downstream (r5 advisor).
        val dropped = q.recentProgress
          .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
        require(dropped == 0,
          s"late replay lost $dropped events to the watermark filter — " +
            "batch parity would break; check the hold-back schedule")
      } finally q.stop()
      val out = spark.table(sinkName)
        .filter(col("key") =!= lateSentinelKey)
        .select(col("key").as("event_type"),
          timestamp_micros(col("winStartMicros")).cast("timestamp_ntz").as("win_start"),
          col("cur"), col("prev"), col("isTrending").as("is_trending"))
        .orderBy("event_type", "win_start")
        .localCheckpoint(true)
      spark.catalog.dropTempView(sinkName)
      out
    } finally graft.sources.FileSinkFs.deleteRecursively(work)
  }

  /** Stream-stream interval join, REGISTERED — the one streaming operator
    * class the registry did not yet exercise as an oracle-checked query
    * (SURVEY §2.9 "not present": the reference never joins two streams).
    * The dataflow is [[graft.streaming.StreamingJobs.streamIntervalJoin]]
    * — purchase and error streams watermarked independently, inner-joined
    * on user with the same ±5-minute event-time range condition as the
    * batch [[intervalJoinErrors]]. Spark's StreamingSymmetricHashJoin
    * keeps BOTH sides' rows in keyed state and derives each side's
    * eviction horizon from the range condition + watermark, so state is
    * bounded by (rate × (interval + watermark delay)) per side regardless
    * of stream length — the property that makes the operator viable on an
    * unbounded feed (StreamingSpec pins actual eviction: end-of-run state
    * rows ≪ rows fed). Here both sides derive from ONE replayed feed fed
    * in time-ordered chunks, so the watermark never drops input (asserted
    * via numRowsDroppedByWatermark, the r5 advisor discipline) and the
    * emitted matches are exactly the batch join's rows — hash-checked
    * against the SAME DuckDB oracle as `interval_join_errors`.
    *
    * Like the other replay harnesses, the feed is driver-built by
    * construction (MemoryStream, bounded by the events table); the
    * production shape is the same dataflow off an unbounded source. */
  val streamJoinBatches = 6

  def intervalJoinStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
    val sinkName = "interval_join_stream_sink"
    spark.catalog.dropTempView(sinkName)
    lastStreamJoinProgress = None
    // empty feed: no quantile cuts to chunk on — return the batch
    // oracle's empty result instead of crashing in the fixture writer
    if (raw.isEmpty)
      return Seq.empty[(Long, Long, Long)]
        .toDF("purchase_id", "error_id", "user_id")
    val work = java.nio.file.Files.createTempDirectory("graft-ivj-chunks")
    try {
      // time-ordered chunk files (quantile time cuts, ascending mtimes):
      // batch k's min ts ≥ batch k−1's max ts, so no row can trail its
      // side's watermark — drops would break the batch-parity oracle and
      // are asserted away below. The feed never touches the driver: the
      // chunk writer is a distributed filter+write per slice, and the
      // drain is a real FileStreamSource (r12 verdict item 3 — the last
      // MemoryStream collect-replays ported to the chunked-file shape
      // user_sessions/events_anomaly/taxi already use).
      val chunkDir = writeTimeOrderedChunks(work, raw, col("tsMicros"),
        streamJoinBatches)
      val src = spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(chunkDir.toString)
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_micros(col("tsMicros")).as("ts"))
      val joined = graft.streaming.StreamingJobs.streamIntervalJoin(
        src.filter(col("event_type") === "purchase"),
        src.filter(col("event_type") === "error"))
      val q = joined
        .writeStream.outputMode("append").format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        q.awaitTermination()
        val dropped = q.recentProgress
          .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
        require(dropped == 0,
          s"stream-stream join lost $dropped events to the watermark filter — " +
            "batch parity would break; the feed chunking is no longer time-ordered")
        lastStreamJoinProgress = Option(q.lastProgress)
      } finally q.stop()
      // materialize DISTRIBUTED (block-manager cache, not a driver
      // Array[Row]) before dropping the sink view the plan reads from
      val out = spark.table(sinkName)
        .orderBy("purchase_id", "error_id")
        .localCheckpoint(true)
      spark.catalog.dropTempView(sinkName)
      out
    } finally graft.sources.FileSinkFs.deleteRecursively(work)
  }

  /** Last drain's final progress — lets StreamingSpec assert state
    * eviction (rows retained ≪ rows fed) without re-plumbing the query. */
  @volatile private[graft] var lastStreamJoinProgress:
    Option[org.apache.spark.sql.streaming.StreamingQueryProgress] = None

  /** The closed event-type vocabulary, pinned so `pivot` never needs a
    * values-discovery pass (see [[eventsPivot]]). */
  val eventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot / reshape — daily event counts pivoted to one column per
    * event type (`RelationalGroupedDataset.pivot`). The value list is
    * EXPLICIT: with it, pivot is a single pass of conditional
    * aggregates; without it Spark first runs a distinct scan over the
    * pivot column just to learn the columns — a whole extra job at
    * 100 TB for something the schema owner already knows. Absent
    * combinations surface as 0, not null (matching the count
    * semantics the oracle states with FILTER). */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .groupBy("day").pivot("event_type", eventTypes).count()
    pivoted.select(col("day") +: eventTypes.map(t =>
      coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("day")
  }

  /** Relational set operations — INTERSECT / EXCEPT between derived
    * tables, a surface the reference never exercises (SURVEY §2.7 "no
    * relational UNION/INTERSECT/EXCEPT between tables"): buyers who
    * also errored vs buyers who never did. Catalyst lowers
    * `Dataset.intersect`/`except` to left-semi / left-anti joins over
    * distinct aggregates — the same scale-safe equi-join shapes the
    * audit admits everywhere else; nothing new to hand-tune. */
  def userSetOps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    def users(t: String) =
      e.filter(col("event_type") === t).select("user_id").distinct()
    users("purchase").intersect(users("error"))
      .withColumn("segment", lit("purchase_and_error"))
      .unionByName(users("purchase").except(users("error"))
        .withColumn("segment", lit("purchase_no_error")))
      .select("segment", "user_id")
      .orderBy("segment", "user_id")
  }

  /** Weekly retention cohorts — the product-analytics staple built on
    * first-touch: users are cohorted by the ISO week of their first
    * event, and each (cohort_week, week_offset) cell counts the cohort
    * members active that many weeks later, with the retention ratio
    * against the cohort's own size. Offset 0 is 1.0 by construction
    * (the first event makes its own week active).
    *
    * Scale shape: one user-keyed grouped min (first touch), one
    * user-keyed equi-join back to events, a per-user-week distinct, and
    * a composite-key count — all shuffles on user or (cohort, offset)
    * keys. The cohort-size side is one row per calendar week, a
    * broadcast by construction at any scale. The ratio is a single
    * int/int IEEE division — bit-identical cross-engine, no rounding. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val first = e.groupBy("user_id").agg(min("ts").as("t0"))
    def week(c: Column) = to_date(date_trunc("week", c))
    val active = e.join(first, "user_id")
      .select(col("user_id"), week(col("t0")).as("cohort_week"),
        (datediff(week(col("ts")), week(col("t0"))) / 7).cast("long")
          .as("week_offset"))
      .distinct()
    val counts = active.groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    val sizes = counts.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    counts.join(broadcast(sizes), "cohort_week")
      .withColumn("retention",
        col("n_users").cast("double") / col("cohort_size"))
      .select("cohort_week", "week_offset", "n_users", "cohort_size", "retention")
      .orderBy("cohort_week", "week_offset")
  }

  /** Conversion window for the ordered funnel (seconds). */
  val funnelWindowSec = 86400L

  /** Ordered conversion funnel — the sequential-pattern analytic
    * (view → click → purchase, each step within [[funnelWindowSec]] of
    * the previous): per user, the first view anchors the chain, then
    * the first click strictly after it within the window, then the
    * first purchase strictly after that click. Emits one row per step
    * with the user count and the summed step-to-step latency (exact
    * integer micros — no division to dispute).
    *
    * Scale shape: each step is a user-keyed equi-join against the
    * previous step's anchors plus a grouped min — three shuffles on the
    * SAME key (co-partitioned, exchange-reusable), each stage's anchor
    * frame strictly shrinking (here 150 → 60 → 25). The anti-pattern
    * this replaces is the per-user ordered collect / UDF state machine,
    * which serializes each user's full history through one task; the
    * join-chain form generalizes to k-step funnels by folding. */
  def conversionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id"), col("event_type"), col("ts"))
    val win = expr(s"INTERVAL $funnelWindowSec SECOND")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
      .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c.select("user_id", "t2"), "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + win)
      .groupBy("user_id").agg(min("ts").as("t3"), min("t2").as("t2"))
    def lag(a: Column, b: Column): Column =
      unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp"))
    val s1 = v.agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("step"), col("n_users"), lit(0L).as("total_lag_micros"))
    val s2 = c.agg(count(lit(1)).as("n_users"),
        coalesce(sum(lag(col("t2"), col("t1"))), lit(0L)).as("total_lag_micros"))
      .select(lit("2_click").as("step"), col("n_users"), col("total_lag_micros"))
    val s3 = p.agg(count(lit(1)).as("n_users"),
        coalesce(sum(lag(col("t3"), col("t2"))), lit(0L)).as("total_lag_micros"))
      .select(lit("3_purchase").as("step"), col("n_users"), col("total_lag_micros"))
    s1.unionByName(s2).unionByName(s3).orderBy("step")
  }

  /** First-touch attribution (batch): the EARLIEST event per
    * (user, event_type) — "when did this user first purchase / first
    * error", the classic attribution extract. Deterministic order: ties
    * on ts break to the lowest event_id. The per-key top-1 window is the
    * bounded-PQ shape TopKRewrite lowers (k = 1), so a hyperactive key
    * costs a 1-row heap per partition, never a sort of its events. */
  def firstTouch(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"), col("ts").as("first_ts"))
      .orderBy("user_id", "event_type")
  }

  /** SCD Type-2 history build (Kimball's slowly-changing-dimension
    * pattern — the standard lakehouse dimension-maintenance op): treat
    * each user's event_type sequence as attribute-change records and
    * reconstruct the versioned dimension — one row per CONSECUTIVE RUN
    * of the same value, with [valid_from, valid_to) intervals chained so
    * each version's end is the next version's start, and the open
    * current version flagged. Gaps-and-islands via two windows over ONE
    * user-keyed partitioning (lag → change flag → running sum = run id),
    * then a grouped aggregate and a lead for the interval chain — three
    * window passes and one aggregate, all sharing the same hash
    * partitioning on user_id, so the whole build is a single exchange.
    * At 100 TB the dimension build shuffles once by entity key and
    * every window/aggregate rides that partitioning — the plan shape a
    * MERGE-based SCD2 engine (Delta/Iceberg) lowers to internally.
    * The open version's valid_to is the +inf sentinel rather than null
    * (typed, null-free output; both engines compare it identically). */
  val scd2OpenEnd = "9999-12-31 00:00:00"
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val runs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byUser).isNull ||
          lag(col("event_type"), 1).over(byUser) =!= col("event_type"), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("run_id", sum(col("chg")).over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val versions = runs.groupBy("user_id", "run_id")
      .agg(min(col("event_type")).as("attr"), // constant within a run
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byRun = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("run_id")
    versions
      .withColumn("valid_to",
        // the sentinel must match ts's TIMESTAMP_NTZ type or coalesce
        // coerces the whole column to LTZ (a silent type change)
        coalesce(lead(col("valid_from"), 1).over(byRun),
          lit(scd2OpenEnd).cast("timestamp_ntz")))
      .withColumn("is_current", col("run_id") === max(col("run_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .select(col("user_id"), col("run_id").as("version"), col("attr"),
        col("valid_from"), col("valid_to"), col("n_events"), col("is_current"))
      .orderBy("user_id", "version")
  }

  /** Last drain's final progress — lets StreamingSpec pin the streaming
    * dedup's state-size contract (rows retained == distinct keys, not
    * rows fed). */
  @volatile private[graft] var lastFirstTouchProgress:
    Option[org.apache.spark.sql.streaming.StreamingQueryProgress] = None

  /** Streaming first-touch — `dropDuplicates` on the key columns, the
    * built-in StreamingDeduplicate stateful operator: the LAST stateful
    * operator class the registry did not yet exercise as an
    * oracle-checked query (windowed agg, session windows,
    * flatMapGroupsWithState, symmetric-hash join, and the foreachBatch
    * MV merge are all covered). Each key's FIRST arrival is emitted
    * immediately and all later arrivals drop against keyed state.
    *
    * Scale shape: state is O(distinct keys) — users × event types —
    * regardless of stream length (every duplicate is dropped, not
    * stored), the property that makes global first-touch viable on an
    * unbounded feed; StreamingSpec pins state rows == distinct keys ≪
    * rows fed. No watermark: first-EVER semantics wants the key's state
    * forever (the time-bounded variant is dropDuplicatesWithinWatermark,
    * whose windowed semantics would no longer equal the batch oracle).
    *
    * Replay-harness determinism (r13: ported off the MemoryStream
    * collect-replay onto the chunked FileStreamSource shape): the feed
    * drains from (ts, event_id)-sorted single-partition chunk files,
    * one file per trigger, so each key's first arrival IS its
    * (ts, event_id) minimum — the batch [[firstTouch]] row — and the
    * drain hash-matches the batch oracle verbatim. A violation of that
    * ordering would fail the hash loudly. */
  def firstTouchStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
    val sinkName = "first_touch_stream_sink"
    spark.catalog.dropTempView(sinkName)
    lastFirstTouchProgress = None
    if (raw.isEmpty)
      return Seq.empty[(Long, String, Long, java.sql.Timestamp)]
        .toDF("user_id", "event_type", "first_event_id", "first_ts")
        .select(col("user_id"), col("event_type"), col("first_event_id"),
          col("first_ts").cast("timestamp_ntz").as("first_ts"))
    val work = java.nio.file.Files.createTempDirectory("graft-ft-chunks")
    try {
      // dedup is order-SENSITIVE (first row encountered per key wins),
      // so the chunks are (tsMicros, event_id)-sorted single-partition
      // files admitted ONE per trigger: a single upstream partition
      // means each post-shuffle reducer pulls exactly one block in file
      // order, so within a micro-batch "first encountered" IS the
      // (ts, event_id) minimum — the batch firstTouch row — and across
      // micro-batches the earlier chunk's state wins. The oracle hash
      // fails loudly if this ordering contract is ever violated.
      var chunkDir = writeTimeOrderedChunks(work, raw, col("tsMicros"),
        streamJoinBatches, sortWithin = Seq("tsMicros", "event_id"))
      // ordering-premise guard (r13 ADVICE item 3): the contract above
      // assumes each chunk FILE becomes exactly ONE input partition.
      // Spark splits a file at maxSplitBytes = min(maxPartitionBytes,
      // max(openCostInBytes, batchBytes/parallelism)) — for a small
      // single-file micro-batch that floor is openCostInBytes (4 MB
      // default), NOT the 128 MB one might assume — so a chunk past it
      // would be read as several partitions, silently voiding the
      // single-upstream-partition premise.
      val bytes = (k: String) => org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(spark.conf.get(k))
      val onePartitionBound = math.min(
        bytes("spark.sql.files.maxPartitionBytes"),
        bytes("spark.sql.files.openCostInBytes"))
      def chunkSizes(d: java.nio.file.Path): Seq[Long] =
        graft.sources.FileSinkFs.list(d, "chunk_")
          .map(java.nio.file.Files.size(_))
      // SELF-HEALING at scale (r14: the sf3 sweep fired the r13 guard
      // for real — chunk_002 hit 4.23 MB vs the 4 MB floor): when a
      // chunk exceeds the one-partition bound, rewrite the drain with
      // proportionally more, smaller chunks — the guard's own first
      // remedy, now mechanical. Chunk count derives from measured
      // bytes (0.6 fill leaves room for banding skew), so the premise
      // is scale-invariant by construction: time-banded chunks are
      // exact value filters, so ANY chunk count preserves the global
      // time order the first-touch semantics needs. The hard require
      // below stays as the backstop for pathological time skew.
      val sizes0 = chunkSizes(chunkDir)
      if (sizes0.max > onePartitionBound) {
        val n = math.max(streamJoinBatches + 1,
          (sizes0.sum / (onePartitionBound * 6 / 10) + 1).toInt)
        val retry = work.resolve("retry")
        chunkDir = writeTimeOrderedChunks(retry, raw, col("tsMicros"),
          n, sortWithin = Seq("tsMicros", "event_id"))
      }
      graft.sources.FileSinkFs.list(chunkDir, "chunk_").foreach { p =>
        val sz = java.nio.file.Files.size(p)
        require(sz <= onePartitionBound,
          s"first_touch_stream ordering premise violated: ${p.getFileName} " +
            s"is $sz bytes > $onePartitionBound (min of " +
            "spark.sql.files.maxPartitionBytes and openCostInBytes) even " +
            "after the size-adaptive rewrite — time skew has packed one " +
            "band past the split floor; raise openCostInBytes for this " +
            "drain or re-band on a finer time column")
      }
      val q = spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunkDir.toString)
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_micros(col("tsMicros")).as("ts"))
        .dropDuplicates("user_id", "event_type")
        .writeStream.outputMode("append").format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        q.awaitTermination()
        lastFirstTouchProgress = Option(q.lastProgress)
      } finally q.stop()
      val out = spark.table(sinkName)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("first_event_id"),
          // back to NTZ so the streaming drain's schema matches the batch
          // twin's (Tables.events serves micros NTZ; UTC session)
          col("ts").cast("timestamp_ntz").as("first_ts"))
        .orderBy("user_id", "event_type")
        .localCheckpoint(true)
      spark.catalog.dropTempView(sinkName)
      out
    } finally graft.sources.FileSinkFs.deleteRecursively(work)
  }

  /** Heavy/light cut for the enrichment band — a fixed constant so the
    * oracle can carry it verbatim. */
  val enrichHeavyCut = 15L

  /** Last enrichment drain's final progress — lets StreamingSpec pin
    * STATELESSNESS (no state operators at all): the scale property of
    * stream-static enrichment is that nothing accumulates. */
  @volatile private[graft] var lastEnrichProgress:
    Option[org.apache.spark.sql.streaming.StreamingQueryProgress] = None

  /** Stream-static broadcast join — the remaining streaming join class
    * after [[intervalJoinStream]] (stream-stream): each micro-batch of
    * an unbounded event stream is enriched against a STATIC dimension
    * snapshot (here a per-user activity profile — the feature-store
    * pattern). The static side is planned ONCE and broadcast into every
    * micro-batch; no streaming state at all, so the operator scales with
    * batch size, not stream length, and needs no watermark. The enriched
    * rows are hash-checked against a plain batch join oracle — stateless
    * streaming must be EXACTLY batch semantics per row.
    *
    * File-source drain over the real events file (the
    * taxi_region_hourly_stream template), `Trigger.AvailableNow`. */
  def eventsEnrichStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val profile = raw.groupBy("user_id")
      .agg(count(lit(1)).as("n_user_events"))
    if (raw.isEmpty)
      return Seq.empty[(Long, Long, String, Long, String)]
        .toDF("event_id", "user_id", "event_type", "n_user_events", "band")
    // the enriched output is O(events) — a memory sink would hold the
    // whole result as driver rows (the one driver bottleneck the
    // stateless-join shape doesn't have). Production sink shape instead:
    // foreachBatch appends each micro-batch as parquet, the result is
    // read back distributed and pinned in the block manager (r12 verdict
    // item 3).
    val outDir = java.nio.file.Files.createTempDirectory("graft-enrich-out")
    val q = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .join(broadcast(profile), "user_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("n_user_events"),
        when(col("n_user_events") >= enrichHeavyCut, lit("heavy"))
          .otherwise(lit("light")).as("band"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        // epoch-idempotent (r13 ADVICE item 2): each micro-batch lands in
        // its own batch=<id> subdirectory with overwrite — a replayed
        // epoch rewrites the same directory instead of appending a
        // duplicate, the exactly-once recipe the kill-restart
        // StreamingSpec canonizes. Latent today (no checkpointLocation,
        // so this query cannot resume), but a blind append would start
        // silently duplicating the moment one is added.
        batch.write.mode("overwrite")
          .parquet(outDir.resolve(s"batch=$id").toString): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally {
      lastEnrichProgress = Option(q.lastProgress)
      q.stop()
    }
    try spark.read.parquet(outDir.toString)
      .select("event_id", "user_id", "event_type", "n_user_events", "band")
      .orderBy("event_id")
      .localCheckpoint(true)
    finally graft.sources.FileSinkFs.deleteRecursively(outDir)
  }

  /** Streaming incremental materialized-view maintenance, REGISTERED —
    * the production sink shape for S10 at scale: an hourly-count MV kept
    * current by [[graft.streaming.StreamingJobs.mergeHourlyBatch]] in a
    * `foreachBatch` sink (per-batch delta aggregate → partition-pruned
    * read of ONLY the touched hours → idempotent merge guarded by
    * `last_batch` → dynamic partition overwrite). Fed as the usual
    * six-chunk time-ordered replay so the merge runs across real
    * micro-batch boundaries; the finished MV must equal the batch
    * hourly-count oracle EXACTLY — incremental maintenance is only
    * correct if the sum of deltas is indistinguishable from a full
    * recompute. */
  def eventCountHourlyIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables.events(spark, dir)
      .select(unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
    if (raw.isEmpty)
      return Seq.empty[(java.sql.Timestamp, Long)].toDF("hour_start", "cnt")
        .select(col("hour_start").cast("timestamp_ntz").as("hour_start"),
          col("cnt"))
    val mvPath = java.nio.file.Files
      .createTempDirectory("graft-hourly-mv").toString
    val work = java.nio.file.Files.createTempDirectory("graft-mvinc-chunks")
    try {
      // time-ordered chunk files through a real FileStreamSource (r12
      // verdict item 3 — the merge runs across genuine micro-batch
      // boundaries without the feed ever visiting the driver); the MV
      // merge itself is order-insensitive (sums of deltas), so plain
      // quantile-cut chunks suffice
      val chunkDir = writeTimeOrderedChunks(work, raw, col("tsMicros"),
        streamJoinBatches)
      val q = spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(chunkDir.toString)
        .select(timestamp_micros(col("tsMicros")).as("ts"))
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          graft.streaming.StreamingJobs.mergeHourlyBatch(
            batch.sparkSession, mvPath, batch.toDF(), batchId): Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    } finally graft.sources.FileSinkFs.deleteRecursively(work)
    spark.read.parquet(mvPath)
      .select(
        timestamp_micros(col("hour_id").cast("long") * lit(3600L * 1000 * 1000))
          .cast("timestamp_ntz").as("hour_start"),
        col("cnt"))
      .orderBy("hour_start")
  }

  /** A11: the custom logsumexp Aggregator over grouped event values —
    * the log-domain fold the reference needs for PageRank masses
    * (`RunPersonalizedPageRankBasic.java:595-607`), exposed as a grouped
    * aggregate. Values scaled to keep exp() in range. */
  def logsumexpByGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(round(graft.functions.LogSumExp.logsumexp(col("value") / 100.0), 6).as("lse"))
      .orderBy("event_type")

  /** Semi-structured surface: the `props` column carries JSON; extract a
    * typed field with the codegen'd JSON path expression and aggregate.
    * At scale this is the schema-on-read pattern for event payloads —
    * extraction happens post-pushdown on only the projected column. */
  def eventsJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(col("k")).as("n_with_k"))
      .orderBy("event_type")

  /** Sketch aggregation (absent from the reference, essential at 100 TB):
    * HyperLogLog++ distinct-user estimates per event type next to the
    * exact count. The raw estimate is engine-specific, so the REGISTERED
    * query emits the exact count plus the sketch's accuracy CONTRACT
    * (|approx−exact|/exact ≤ 5%) — the oracle checks the exact column
    * exactly and asserts the contract holds, which makes the sketch
    * hash-verifiable without pretending DuckDB reproduces HLL++ bits.
    * The raw estimate stays available via [[approxDistinctUsersRaw]]
    * (ScalaTest pins it within 5% of exact). */
  /** rsd = 0.01: the published contract below claims "within 5%", so the
    * sketch must run at ~5× tighter standard error than the claim — the
    * default rsd 0.05 makes >5% deviations EXPECTED (≈1σ), and they
    * appeared at sf0.1 cardinalities. Sketch size is still KB-scale. */
  val hllRsd = 0.01

  /** ONE scan via two-level aggregation (r14; was two scans joined on
    * the group key). The earlier single-pass `agg(approx, countDistinct)`
    * was measured and rejected (ApproxProf: 2.12 s vs 0.87 s) because a
    * distinct aggregate makes Catalyst plan the whole aggregation through
    * Expand + the four-phase distinct pipeline, dragging the rsd-0.01 HLL
    * buffer (~16 KB per group) through the extra partial-merge phases —
    * but the two-level form avoids Expand entirely: level 1 groups by
    * (event_type, user_id) with NO aggregate (map-side partial dedup,
    * one exchange of the distinct pairs), level 2 counts the pairs
    * (= exact distinct users) and feeds each user_id to the HLL sketch
    * exactly once. HLL insertion is idempotent (register max over hashed
    * values), so the sketch over deduped pairs is bit-identical to the
    * sketch over the raw feed — and the raw feed is scanned ONCE instead
    * of twice, with no join. */
  def approxDistinctUsersRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type")
      // count(user_id), not count(1) (r15, advisor): over the distinct
      // (event_type, user_id) pairs the two differ only when a NULL
      // user_id appears in the feed — count(1) would count the NULL
      // group as a user, diverging from approx_count_distinct beside it
      // AND from the declared count(distinct user_id) oracle. The events
      // schema allows NULLs even though the fixtures carry none.
      .agg(approx_count_distinct(col("user_id"), hllRsd).as("approx_users"),
        count(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("approx_users"), col("exact_users"))
      .orderBy("event_type")

  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    approxDistinctUsersRaw(spark, dir)
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05).as("approx_within_5pct"))
      .orderBy("event_type")

  /** The scale path for percentiles: `percentile_approx` (the KLL-style
    * rank sketch) instead of exact `percentile`, which holds per-group
    * value buffers and cannot run over 100 TB. Verified with the same
    * discipline as [[approxDistinctUsers]]: the hash-compared columns
    * are the EXACT percentiles (DuckDB-reproducible), plus boolean
    * flags asserting the sketch's contract — each approximate quantile
    * must land inside an exact RANK band around its target (p50 within
    * the exact [p45, p55] values, etc). Rank bands make the tolerance
    * data-independent: percentile_approx guarantees rank error ≤ 1/acc
    * (1e-4 here), so a band ±2-5 rank points cannot produce a flaky
    * false unless the sketch is actually broken. */
  val pctApproxAcc = 10000

  def valuePctApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"),
        expr("percentile(value, array(0.45, 0.55, 0.88, 0.92, 0.985, 0.995))")
          .as("band"),
        expr(s"percentile_approx(value, array(0.5, 0.9, 0.99), $pctApproxAcc)")
          .as("apx"))
      .select(col("event_type"), col("p50"), col("p90"), col("p99"),
        col("apx")(0).between(col("band")(0), col("band")(1)).as("p50_in_band"),
        col("apx")(1).between(col("band")(2), col("band")(3)).as("p90_in_band"),
        col("apx")(2).between(col("band")(4), col("band")(5)).as("p99_in_band"))
      .orderBy("event_type")

  /** Exact interpolated percentiles per group — Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition. */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy("event_type")

  /** Time-clustered lake layout — the write-side twin of predicate
    * pushdown: range-partition the event stream on `ts` and sort within
    * partitions, so every parquet file covers a DISJOINT time interval
    * and its row-group min/max stats actually discriminate. A time-range
    * scan over the clustered table then skips whole row groups at read
    * time; over a hash-scattered layout every row group straddles the
    * full time axis and stats prune nothing. At 100 TB this is the
    * difference between reading a day and reading the lake — same
    * pushed filter, wildly different bytes off disk.
    *
    * Caveat discovered by measurement: Spark 4 plans TIMESTAMP_NTZ
    * predicates as Pushed Filters but ParquetFilters declines the type,
    * so NTZ stats never actually skip row groups. The layout therefore
    * carries `ts_micros` (epoch micros under the forced-UTC session) as
    * a BIGINT shadow of `ts` — integer stats DO prune, so time-range
    * readers filter on `ts_micros`. Side-effecting (a writer), so
    * test-gated: ScaleDesignSpec measures the scan's numOutputRows under
    * both layouts. */
  def writeTimeClustered(spark: SparkSession, dir: String, out: String,
      buckets: Int = 8): Unit =
    Tables.events(spark, dir)
      .withColumn("ts_micros",
        unix_micros(col("ts").cast("timestamp")))
      .repartitionByRange(buckets, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(out)

  /** Z-order (Morton-curve) clustered layout — the MULTI-dimensional twin
    * of [[writeTimeClustered]]. Range-clustering on one column makes that
    * column's row-group stats discriminate and leaves every other
    * column's stats useless; interleaving the bits of two normalized
    * dimension ranks and range-clustering on the interleaved value gives
    * BOTH columns locally-narrow min/max ranges, so predicates on either
    * user_id or ts prune row groups from the same single layout. This is
    * the standard lakehouse answer (Delta/Iceberg Z-ORDER BY) to "one
    * table, two access paths" — at 100 TB you cannot afford a second
    * copy clustered the other way.
    *
    * The dimension min/max scaling needs one tiny aggregate (4 longs to
    * the driver — the bounded-collect discipline); the interleave itself
    * is a flat fold of shift/and/or Column arithmetic, entirely inside
    * whole-stage codegen (no HOF lambdas, no UDF). Bit i of the user
    * rank lands at 2i+1 and of the time rank at 2i, so the two
    * dimensions alternate significance and a range predicate on either
    * one constrains every other z-bit pair. */
  /** Bit-interleave of two `bits`-wide ranks (bit i of `u` → 2i+1, of
    * `t` → 2i): strictly monotone in either argument with the other
    * fixed — the property the z-layout's per-dimension pruning rests on
    * (ScaleDesignSpec checks it against a reference implementation). */
  private[graft] def morton(u: Column, t: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(u.bitwiseAND(lit(1L << i)), i + 1))
        .bitwiseOR(shiftleft(t.bitwiseAND(lit(1L << i)), i))
    }

  def writeZOrdered(spark: SparkSession, dir: String, out: String,
      buckets: Int = 8, bits: Int = 16): Unit = {
    val ev = Tables.events(spark, dir)
      .withColumn("ts_micros", unix_micros(col("ts").cast("timestamp")))
    val Row(uLo: Long, uHi: Long, tLo: Long, tHi: Long) = ev.agg(
      min("user_id"), max("user_id"), min("ts_micros"), max("ts_micros")).head()
    val cap = (1L << bits) - 1
    def rank(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L) else ((c - lit(lo)) * cap / (hi - lo)).cast("long")
    ev.withColumn("zval",
        morton(rank(col("user_id"), uLo, uHi), rank(col("ts_micros"), tLo, tHi), bits))
      .repartitionByRange(buckets, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(out)
  }

  /** Small-file compaction — the lake-maintenance pass every streaming
    * or incremental ingest eventually needs: micro-batch sinks and
    * per-partition writers leave thousands of KB-scale files, and at
    * 100 TB the resulting scan pays per-file open/footer/listing costs
    * that dwarf the data read. Compaction sizes the output from the
    * INPUT's actual bytes (ceil(total/target) files), re-clusters on the
    * given column with `repartitionByRange` + `sortWithinPartitions`
    * while it is touching every row anyway — so the compacted layout
    * regains the row-group pruning of [[writeTimeClustered]] even when
    * the fragments arrived hash-scattered — and rewrites once.
    * Side-effecting (a writer), so test-gated like the other layouts:
    * ScaleDesignSpec pins content preservation, the file-count formula,
    * and pairwise-disjoint per-file ranges after compaction. Returns the
    * number of files written. */
  def compactClustered(spark: SparkSession, src: String, out: String,
      clusterCol: String, targetFileBytes: Long): Int = {
    val parts = Option(new java.io.File(src).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-")
        && f.getName.endsWith(".parquet"))
    require(parts.nonEmpty, s"nothing to compact under $src")
    val totalBytes = parts.map(_.length()).sum
    val n = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(src)
      .repartitionByRange(n, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(out)
    n
  }

  /** Watermark delay for the streaming session drain (minutes). */
  val sessionWmDelayMin = 2L

  /** R-family production shape: the SAME 30-minute session windows as
    * [[userSessions]], driven as a Structured Streaming file source
    * with append-mode output — sessions merge in keyed state as events
    * arrive and EMIT only when the watermark passes their end (the
    * built-in session_window operator in streaming mode; the batch twin
    * plans the identical aggregate). The registered result is therefore
    * the watermark-CLOSED session set: after the single file batch the
    * watermark rests at max(ts) − [[sessionWmDelayMin]] min, so exactly
    * the sessions whose end precedes it appear — the oracle states that
    * same set in SQL (islands + end < wm). Trailing sessions staying in
    * state is the documented append-mode contract; a live pipeline
    * flushes them as later files arrive. Drained with AvailableNow off
    * the memory sink (the taxi-stream template; bounded by sessions ×
    * users). */
  def userSessionsStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sinkName = "user_sessions_stream_sink"
    spark.catalog.dropTempView(sinkName)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val q = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"$sessionWmDelayMin minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val rows = spark.table(sinkName)
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSeq
    spark.catalog.dropTempView(sinkName)
    rows.toDF("user_id", "session_start", "session_end", "n_events")
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** Chunk count / per-trigger admission for the MULTI-batch session
    * drain. 6 chunks at 2 files per trigger = 3 data micro-batches plus
    * the engine's final watermark-advance batch. */
  val sessionChunks = 6
  val sessionChunksPerTrigger = 2

  /** The multi-batch leg of [[userSessionsStream]]: the SAME streaming
    * session-window aggregate, driven from a directory of TIME-ORDERED
    * chunk files with `maxFilesPerTrigger` bounding each micro-batch —
    * so sessions genuinely merge in keyed state across batches, the
    * watermark advances batch-by-batch (closing and EVICTING sessions as
    * it passes them), and the registered result is produced by real
    * incremental execution rather than one single-file batch. This is
    * the production shape at 100 TB: state tracks the OPEN-session
    * working set (active users × watermark delay), never the corpus —
    * measured at sf1 (PLANS.md round 9: ~76 MB state, flat per-batch
    * wall, chunking-invariant vs the single-batch drain).
    *
    * The final closed-session set is chunk-count-invariant (the
    * watermark rests at max(ts) − delay either way), so the oracle is
    * the same batch islands SQL as the single-batch twin — the batch
    * engine independently states the semantics the incremental state
    * machine must reproduce. The chunk fixture (time-range slices with
    * increasing mtimes, so FileStreamSource admits oldest-first) is
    * harness scaffolding, deleted after the drain. */
  /** Write `df` as `nChunks` TIME-ORDERED single-file parquet chunks
    * under `work/chunks` (quantile time cuts; ascending modified times
    * so FileStreamSource admits oldest-first) — the shared fixture
    * builder behind every multi-batch chunked drain. Returns the chunk
    * directory; callers may append extra chunks (e.g. a sentinel file)
    * with [[appendChunk]]. */
  private def writeTimeOrderedChunks(work: java.nio.file.Path, df: DataFrame,
      tCol: Column, nChunks: Int,
      sortWithin: Seq[String] = Nil): java.nio.file.Path = {
    val chunkDir = work.resolve("chunks")
    val t = tCol.cast("double")
    val bounds = df.select(t.as("t")).stat.approxQuantile(
      "t", (1 until nChunks).map(_.toDouble / nChunks).toArray, 0.001)
    val cuts = Array(Double.NegativeInfinity) ++ bounds :+ Double.PositiveInfinity
    java.nio.file.Files.createDirectories(chunkDir)
    for (i <- 0 until nChunks)
      appendChunk(work, df.filter(t >= cuts(i) && t < cuts(i + 1)), i, sortWithin)
    chunkDir
  }

  /** Append one single-file chunk with a modified time that sorts after
    * every lower index (FileStreamSource's admission order).
    * `sortWithin` orders the rows INSIDE the chunk file: an
    * order-SENSITIVE stateful operator (streaming dedup keeps the first
    * row it encounters per key) replayed through a file source is only
    * deterministic if each micro-batch is one single-partition file in
    * a defined row order — a single upstream partition means each
    * shuffle reducer pulls exactly one block and sees the file's row
    * order, so "first encountered" is well-defined. Order-insensitive
    * aggregates (windows, sessions, joins) leave it empty. */
  private def appendChunk(work: java.nio.file.Path, df: DataFrame, idx: Int,
      sortWithin: Seq[String] = Nil): Unit = {
    val tmp = work.resolve("tmp_chunk")
    val one = df.coalesce(1)
    val ordered =
      if (sortWithin.nonEmpty) one.sortWithinPartitions(sortWithin.map(col): _*)
      else one
    ordered.write.mode("overwrite").parquet(tmp.toString)
    val part = graft.sources.FileSinkFs.list(tmp, "part-").head
    val dest = work.resolve("chunks").resolve(f"chunk_$idx%03d.parquet")
    java.nio.file.Files.move(part, dest)
    java.nio.file.Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L + idx * 10000L))
  }

  def userSessionsStreamChunked(spark: SparkSession, dir: String): DataFrame = {
    val sp0 = spark
    import sp0.implicits._
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // empty feed: no quantile cuts to chunk on and nothing to drain —
    // return the empty result frame (the batch oracle's empty result)
    // instead of crashing in the fixture writer (empty-input pin,
    // ScaleDesignSpec)
    if (raw.isEmpty)
      return Seq.empty[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        .toDF("user_id", "session_start", "session_end", "n_events")
        .select(col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
    val work = java.nio.file.Files.createTempDirectory("graft-sess-chunks")
    try {
      val chunkDir = writeTimeOrderedChunks(work, raw,
        col("ts").cast("timestamp").cast("long"), sessionChunks)
      val sinkName = "user_sessions_stream_chunked_sink"
      spark.catalog.dropTempView(sinkName)
      val q = spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", sessionChunksPerTrigger)
        .parquet(chunkDir.toString)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", s"$sessionWmDelayMin minutes")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .writeStream.outputMode("append").format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val rows = spark.table(sinkName)
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))
        .collect().toSeq.map(r => (r.getLong(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3)))
      spark.catalog.dropTempView(sinkName)
      val sp = spark
      import sp.implicits._
      rows.toDF("user_id", "session_start", "session_end", "n_events")
        .select(col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    } finally graft.sources.FileSinkFs.deleteRecursively(work)
  }

  /** Chunk count / per-trigger admission for the multi-batch ANOMALY
    * drain (same cadence as the session drain: 3 data micro-batches). */
  val anomalyChunks = 6
  val anomalyChunksPerTrigger = 2

  /** The multi-batch leg of [[eventsAnomalyStream]]: the SAME
    * `flatMapGroupsWithState` anomaly ring (open hourly window + ≤24
    * closed-window baseline per key), driven from TIME-ORDERED chunk
    * files through a real FileStreamSource with `maxFilesPerTrigger`
    * bounding each micro-batch — so the ring state genuinely carries
    * across micro-batch boundaries and every batch's per-key iterator
    * continues where the previous batch's state left off. This
    * completes the chunked-drain discipline for ARBITRARY custom state
    * (the session drain covers the built-in session_window operator;
    * this covers the hand-rolled GroupState machine), closing the
    * "MemoryStream replays are driver-fed" caveat for the anomaly
    * family too.
    *
    * The drain-flush sentinel (one per-key event one full window past
    * max(ts), whose own window never closes and never emits) rides the
    * LAST chunk file instead of a driver `addData` call — the fixture
    * carries the drain discipline, the engine does all the feeding.
    * In-order delivery across batches holds because the chunks are
    * time-range slices admitted oldest-first; the oracle is the batch
    * rolling-baseline SQL, chunk-count-invariant by the same argument
    * as the session drain. */
  def eventsAnomalyStreamChunked(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    val windowMicros = 3600L * 1000000L
    val raw = Tables.events(spark, dir)
      .select(col("event_type").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
    // empty feed: nothing to chunk, no sentinel to anchor — the same
    // empty-result contract as the MemoryStream twin's evs.nonEmpty guard
    if (raw.isEmpty)
      return Seq.empty[(String, Long, Long, Boolean)]
        .toDF("event_type", "winStart", "cnt", "is_anomaly")
        .select(col("event_type"), timestamp_micros(col("winStart")).as("hour"),
          col("cnt"), col("is_anomaly"))
    val work = java.nio.file.Files.createTempDirectory("graft-anom-chunks")
    try {
      val chunkDir = writeTimeOrderedChunks(work, raw, col("tsMicros"), anomalyChunks)
      val maxTs = raw.agg(max("tsMicros")).head.getLong(0)
      appendChunk(work,
        raw.select("key").distinct()
          .withColumn("tsMicros", lit(maxTs + 1000L * windowMicros)),
        anomalyChunks) // sorts after every data chunk
      val sinkName = "events_anomaly_stream_chunked_sink"
      spark.catalog.dropTempView(sinkName)
      val q = graft.streaming.StreamingJobs.detectAnomalies(
        spark.readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", anomalyChunksPerTrigger)
          .parquet(chunkDir.toString)
          .as[graft.streaming.KeyedEvent],
        windowMicros)
        .writeStream.outputMode("append").format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val rows = spark.table(sinkName)
        .as[(String, Long, Long, Int, Boolean)].collect().toSeq
      spark.catalog.dropTempView(sinkName)
      rows.toDF("event_type", "winStart", "cnt", "n", "is_anomaly")
        .select(col("event_type"), timestamp_micros(col("winStart")).as("hour"),
          col("cnt"), col("is_anomaly"))
        .orderBy("event_type", "hour")
    } finally graft.sources.FileSinkFs.deleteRecursively(work)
  }

  /** Pre-flight shuffle-skew diagnostic: the log2 histogram of per-key
    * row counts for the join/aggregation keys a pipeline is about to
    * shuffle on. At 100 TB this tiny two-level aggregate (map-side
    * partial → ≤64-row histogram) is what decides the salting factor
    * and AQE skew thresholds BEFORE the expensive job runs — the repo's
    * own salted twins (wordcount_salted, q4_nation_count_salted) pick
    * [[Relational.joinSalts]] from exactly this shape of evidence.
    * Bucket arithmetic is exact integer work on both engines:
    * `length(bin(cnt)) - 1` is floor(log2) without a float log. */
  def keySkewProfile(spark: SparkSession, dir: String): DataFrame = {
    def profile(df: DataFrame, key: String, label: String): DataFrame =
      df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
        .groupBy((length(bin(col("cnt"))) - 1).cast("long").as("log2_bucket"))
        .agg(count(lit(1)).as("n_keys"), max(col("cnt")).as("max_per_key"),
          sum(col("cnt")).as("n_rows"))
        .withColumn("keyspace", lit(label))
    profile(Tables.events(spark, dir).select("user_id"),
        "user_id", "events.user_id")
      .unionByName(profile(
        Tables.lineitem(spark, dir).select("l_orderkey"),
        "l_orderkey", "lineitem.l_orderkey"))
      .select("keyspace", "log2_bucket", "n_keys", "max_per_key", "n_rows")
      .orderBy("keyspace", "log2_bucket")
  }

  /** Rolling-baseline anomaly detection — the monitoring-pipeline staple
    * over any metric stream: each (event_type, hour)'s count is tested
    * against its own trailing 24-hour baseline with a 3σ rule. The
    * sliding frame (ROWS 24 PRECEDING..1 PRECEDING — a frame shape no
    * other registered window uses; q13 is cumulative-unbounded) carries
    * exact integer sums Σx and Σx², and the σ test is the integer
    * inequality (n·x − Σx)² > 9·(n·Σx² − (Σx)²) — algebraically
    * (x − μ)² > (3σ)² with both sides scaled by n², so the flag is
    * hash-exact across engines with NO float at the decision boundary.
    * Domain bound, ENFORCED in the plan (not a comment): per-cell counts
    * up to [[graft.streaming.AnomalyMath.longSafeCellBound]] keep every
    * intermediate exact in Long (the binding term is 9·n·Σx² ≤ 5184·B²
    * — see AnomalyMath's derivation); rows whose frame contains a hotter
    * cell evaluate the SAME inequality in the double domain, where
    * 1e-15 ulp noise is meaningless against a 3σ margin. The streaming
    * ring state applies the identical guarded predicate via
    * [[graft.streaming.AnomalyMath.threeSigma]], so the replay
    * differential cannot drift. Rows with fewer than 12 baseline hours
    * report false (no baseline, no claim). */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    anomalyFlags(hourly).orderBy("event_type", "hour")
  }

  /** The guarded 3σ flag computation over an (event_type, hour, cnt)
    * frame — split out so the overflow-guard test can feed a synthetic
    * hot cell without rebuilding the events aggregate. */
  private[graft] def anomalyFlags(hourly: DataFrame): DataFrame = {
    val fr = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    val cd = col("cnt").cast("double")
    val longTest =
      (col("n") * col("cnt") - col("sx")) * (col("n") * col("cnt") - col("sx")) >
        lit(9L) * (col("n") * col("sxx") - col("sx") * col("sx"))
    // the double-domain fallback mirrors AnomalyMath's else-branch:
    // Σx and Σx² accumulated as doubles, same inequality
    val nd = col("n").cast("double")
    val doubleTest =
      (nd * cd - col("sxd")) * (nd * cd - col("sxd")) >
        lit(9.0) * (nd * col("sxxd") - col("sxd") * col("sxd"))
    // The Long-path window sums are computed EAGERLY for every row (a
    // window agg has no branch laziness), so under ANSI mode a hot cell
    // would throw ARITHMETIC_OVERFLOW before the when() ever chose the
    // double branch. Clamping cells above the bound to 0 makes the Long
    // sums total functions (≤ 24·B and ≤ 24·B² — overflow-free by
    // construction); the clamp is the identity exactly when mx ≤ B,
    // which is the only case the when() consumes them.
    val bound = graft.streaming.AnomalyMath.longSafeCellBound
    val safeCnt = when(col("cnt") <= bound, col("cnt")).otherwise(lit(0L))
    hourly
      .withColumn("n", count(lit(1)).over(fr))
      .withColumn("sx", sum(safeCnt).over(fr))
      .withColumn("sxx", sum(safeCnt * safeCnt).over(fr))
      .withColumn("sxd", sum(cd).over(fr))
      .withColumn("sxxd", sum(cd * cd).over(fr))
      .withColumn("mx", greatest(max(col("cnt")).over(fr), col("cnt")))
      .select(col("event_type"), col("hour"), col("cnt"),
        (col("n") >= 12 &&
          when(col("mx") <= lit(bound), longTest).otherwise(doubleTest))
          .as("is_anomaly"))
  }

  /** The streaming anomaly detector replayed as a REGISTERED query
    * against the batch oracle (the interval_join_stream discipline):
    * the full events feed drains through
    * [[graft.streaming.StreamingJobs.detectAnomalies]] in time-ordered
    * micro-batches — so the ring state actually evolves across batches
    * — with one far-future sentinel per key closing the trailing
    * windows (sentinel windows never close, so they never emit). The
    * emitted rows must hash-match [[eventsAnomaly]]'s oracle exactly:
    * counts AND the integer-3σ flags.
    *
    * r14 (r13 verdict item 4 — the LAST MemoryStream replay): the feed
    * arrives through a real chunked FileStreamSource drain, one chunk
    * file per trigger, preserving the replay's original cadence
    * ([[streamJoinBatches]] data micro-batches + the sentinel batch)
    * with the engine doing all the feeding — no driver-side collect of
    * the input. The [[eventsAnomalyStreamChunked]] twin remains the
    * reference-cadence leg (more chunks per trigger over the same
    * machine); this one pins the original batch-per-slice semantics. */
  def eventsAnomalyStream(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    val windowMicros = 3600L * 1000000L
    val raw = Tables.events(spark, dir)
      .select(col("event_type").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
    // empty feed: nothing to chunk, no sentinel to anchor — the same
    // empty-result contract as the batch oracle's empty result
    if (raw.isEmpty)
      return Seq.empty[(String, Long, Long, Boolean)]
        .toDF("event_type", "winStart", "cnt", "is_anomaly")
        .select(col("event_type"), timestamp_micros(col("winStart")).as("hour"),
          col("cnt"), col("is_anomaly"))
    val work = java.nio.file.Files.createTempDirectory("graft-anom-replay")
    try {
      val chunkDir =
        writeTimeOrderedChunks(work, raw, col("tsMicros"), streamJoinBatches)
      val maxTs = raw.agg(max("tsMicros")).head.getLong(0)
      appendChunk(work,
        raw.select("key").distinct()
          .withColumn("tsMicros", lit(maxTs + 1000L * windowMicros)),
        streamJoinBatches) // sorts after every data chunk
      val sinkName = "events_anomaly_stream_sink"
      spark.catalog.dropTempView(sinkName)
      val q = graft.streaming.StreamingJobs.detectAnomalies(
        spark.readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(chunkDir.toString)
          .as[graft.streaming.KeyedEvent],
        windowMicros)
        .writeStream.outputMode("append").format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val rows = spark.table(sinkName)
        .as[(String, Long, Long, Int, Boolean)].collect().toSeq
      spark.catalog.dropTempView(sinkName)
      rows.toDF("event_type", "winStart", "cnt", "n", "is_anomaly")
        .select(col("event_type"), timestamp_micros(col("winStart")).as("hour"),
          col("cnt"), col("is_anomaly"))
        .orderBy("event_type", "hour")
    } finally graft.sources.FileSinkFs.deleteRecursively(work)
  }

  /** The statistical-aggregate surface (second moments + bivariate):
    * sample stddev/variance, Pearson correlation, sample covariance and
    * the least-squares slope of value on user_id, per event type — all
    * single-pass map-side-combinable aggregates (Spark's are Welford/
    * co-moment updates, constant state per group). 6dp rounding on both
    * engines absorbs summation-order ulps, the registry-wide float
    * discipline. The near-zero correlations are the honest answer:
    * user_id and value are independent by construction in this feed. */
  def valueMoments(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(stddev_samp(col("value")), 6).as("sd"),
        round(var_samp(col("value")), 6).as("variance"),
        round(corr(col("value"), col("user_id").cast("double")), 6).as("corr_user"),
        round(covar_samp(col("value"), col("user_id").cast("double")), 6).as("covar_user"),
        round(regr_slope(col("value"), col("user_id").cast("double")), 6).as("slope_user"))
      .orderBy("event_type")

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "value_moments" -> (valueMoments _),
    "events_anomaly" -> (eventsAnomaly _),
    "events_anomaly_stream" -> (eventsAnomalyStream _),
    "events_anomaly_stream_chunked" -> (eventsAnomalyStreamChunked _),
    "key_skew_profile" -> (keySkewProfile _),
    "user_sessions_stream" -> (userSessionsStream _),
    "user_sessions_stream_chunked" -> (userSessionsStreamChunked _),
    "approx_distinct_users" -> (approxDistinctUsers _),
    "value_percentiles" -> (valuePercentiles _),
    "value_pct_approx" -> (valuePctApprox _),
    "event_count_sliding" -> (eventCountSliding _),
    "user_sessions" -> (userSessions _),
    "asof_last_error" -> (asofLastError _),
    "first_touch" -> (firstTouch _),
    "scd2_history" -> (scd2History _),
    "conversion_funnel" -> (conversionFunnel _),
    "events_pivot" -> (eventsPivot _),
    "retention_cohorts" -> (retentionCohorts _),
    "user_set_ops" -> (userSetOps _),
    "first_touch_stream" -> (firstTouchStream _),
    "interval_join_errors" -> (intervalJoinErrors _),
    "interval_join_outer" -> (intervalJoinOuter _),
    "interval_join_stream" -> (intervalJoinStream _),
    "events_enrich_stream" -> (eventsEnrichStream _),
    "event_count_hourly_incremental" -> (eventCountHourlyIncremental _),
    "events_json_extract" -> (eventsJsonExtract _),
    "event_count_hourly" -> (eventCountHourly _),
    "mv_hourly_rewrite" -> (mvHourlyRewrite _),
    "events_resample" -> (eventsResample _),
    "region_event_count" -> (regionEventCount _),
    "trending_arrivals" -> (trendingArrivals _),
    "trending_arrivals_late" -> (trendingArrivalsLate _),
    "logsumexp_by_group" -> (logsumexpByGroup _))

  /** The islands CTE of user_sessions, plus session_end = last + gap and
    * the append-mode emission predicate end < (max(ts) − delay) — shared
    * by the single-batch and chunked multi-batch streaming drains (the
    * closed-session set is chunk-count-invariant). */
  private val closedSessionsOracleSql =
    s"""WITH e AS (
         SELECT user_id, ts,
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
         FROM events),
       f AS (
         SELECT user_id, ts,
                CASE WHEN prev IS NULL OR ts - prev > INTERVAL '30 minutes'
                     THEN 1 ELSE 0 END AS new_session
         FROM e),
       g AS (
         SELECT user_id, ts,
                sum(new_session) OVER (
                  PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS session_id
         FROM f),
       s AS (
         SELECT user_id, min(ts) AS session_start,
                max(ts) + INTERVAL '30 minutes' AS session_end,
                count(*) AS n_events
         FROM g GROUP BY user_id, session_id),
       wm AS (SELECT max(ts) - INTERVAL '$sessionWmDelayMin minutes' AS wm
              FROM events)
       SELECT user_id, session_start, session_end, n_events
       FROM s, wm WHERE session_end < wm
       ORDER BY user_id, session_start"""

  private val firstTouchOracleSql =
    """WITH r AS (
         SELECT user_id, event_type, event_id, ts,
                row_number() OVER (PARTITION BY user_id, event_type
                  ORDER BY ts, event_id) AS rk
         FROM events)
       SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
       FROM r WHERE rk = 1 ORDER BY user_id, event_type"""

  private val trendingOracleSql =
    """WITH counts AS (
         SELECT event_type, time_bucket(INTERVAL '10 minutes', ts) AS win_start,
                count(*) AS cur
         FROM events GROUP BY event_type, win_start)
       SELECT c.event_type, c.win_start, c.cur,
              coalesce(p.cur, 0) AS prev,
              (c.cur >= coalesce(p.cur, 0) * 2 AND c.cur >= 10) AS is_trending
       FROM counts c
       LEFT JOIN counts p
         ON p.event_type = c.event_type
        AND p.win_start = c.win_start - INTERVAL '10 minutes'
       ORDER BY c.event_type, c.win_start"""

  private val eventsAnomalyOracle =
    """WITH hourly AS (
         SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
         FROM events GROUP BY 1, 2),
       w AS (
         SELECT event_type, hour, cnt,
                count(*) OVER fr AS n,
                cast(sum(cnt) OVER fr AS BIGINT) AS sx,
                cast(sum(cnt * cnt) OVER fr AS BIGINT) AS sxx
         FROM hourly
         WINDOW fr AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
       SELECT event_type, hour, cnt,
              (n >= 12 AND
               (n * cnt - sx) * (n * cnt - sx) > 9 * (n * sxx - sx * sx))
                AS is_anomaly
       FROM w ORDER BY event_type, hour"""

  val oracleSql: Map[String, String] = Map(
    "value_moments" ->
      """SELECT event_type,
                round(stddev_samp(value), 6) AS sd,
                round(var_samp(value), 6) AS variance,
                round(corr(value, cast(user_id AS DOUBLE)), 6) AS corr_user,
                round(covar_samp(value, cast(user_id AS DOUBLE)), 6) AS covar_user,
                round(regr_slope(value, cast(user_id AS DOUBLE)), 6) AS slope_user
          FROM events GROUP BY event_type ORDER BY event_type""",
    // the streaming replay must be indistinguishable from the batch
    // frame — same oracle for both
    "events_anomaly_stream" -> eventsAnomalyOracle,
    "events_anomaly_stream_chunked" -> eventsAnomalyOracle,
    "events_anomaly" -> eventsAnomalyOracle,
    "key_skew_profile" ->
      """WITH ev AS (
           SELECT cast(length(bin(cnt)) - 1 AS BIGINT) AS log2_bucket,
                  count(*) AS n_keys, max(cnt) AS max_per_key,
                  cast(sum(cnt) AS BIGINT) AS n_rows, 'events.user_id' AS keyspace
           FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
           GROUP BY 1),
         li AS (
           SELECT cast(length(bin(cnt)) - 1 AS BIGINT) AS log2_bucket,
                  count(*) AS n_keys, max(cnt) AS max_per_key,
                  cast(sum(cnt) AS BIGINT) AS n_rows, 'lineitem.l_orderkey' AS keyspace
           FROM (SELECT l_orderkey, count(*) AS cnt FROM lineitem
                 GROUP BY l_orderkey)
           GROUP BY 1)
         SELECT keyspace, log2_bucket, n_keys, max_per_key, n_rows
         FROM (SELECT * FROM ev UNION ALL SELECT * FROM li)
         ORDER BY keyspace, log2_bucket""",
    // the exact column is compared exactly; TRUE asserts the sketch's
    // 5% accuracy contract (a property oracle for the HLL estimate)
    "approx_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
                TRUE AS approx_within_5pct
         FROM events GROUP BY event_type ORDER BY event_type""",
    // the exact columns are hash-compared; the TRUE flags assert the
    // sketch's rank-band contract (same discipline as the HLL query)
    "value_pct_approx" ->
      """SELECT event_type,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.9), 6) AS p90,
                round(quantile_cont(value, 0.99), 6) AS p99,
                TRUE AS p50_in_band, TRUE AS p90_in_band, TRUE AS p99_in_band
         FROM events GROUP BY event_type ORDER BY event_type""",
    "value_percentiles" ->
      """SELECT event_type,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.9), 6) AS p90,
                round(quantile_cont(value, 0.99), 6) AS p99
         FROM events GROUP BY event_type ORDER BY event_type""",
    "interval_join_errors" ->
      """SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id
         FROM events p
         JOIN events e
           ON p.event_type = 'purchase' AND e.event_type = 'error'
          AND e.user_id = p.user_id
          AND e.ts <= p.ts
          AND e.ts > p.ts - INTERVAL '300 seconds'
         ORDER BY purchase_id, error_id""",
    "interval_join_outer" ->
      """SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
           ON e.user_id = p.user_id
          AND e.ts <= p.ts
          AND e.ts > p.ts - INTERVAL '300 seconds'
         ORDER BY purchase_id, error_id""",
    // the streaming twin emits the SAME rows as the batch interval join:
    // the stream-stream state machine is hash-checked against the batch
    // oracle (the user_sessions_stream / trending_arrivals_late
    // discipline, now for two-sided join state)
    "interval_join_stream" ->
      """SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id
         FROM events p
         JOIN events e
           ON p.event_type = 'purchase' AND e.event_type = 'error'
          AND e.user_id = p.user_id
          AND e.ts <= p.ts
          AND e.ts > p.ts - INTERVAL '300 seconds'
         ORDER BY purchase_id, error_id""",
    // stateless streaming must equal batch row-for-row: the plain batch
    // join IS the oracle for the stream-static enrichment
    "events_enrich_stream" ->
      s"""WITH prof AS (
            SELECT user_id, count(*) AS n_user_events FROM events GROUP BY user_id)
          SELECT e.event_id, e.user_id, e.event_type, p.n_user_events,
                 CASE WHEN p.n_user_events >= $enrichHeavyCut
                      THEN 'heavy' ELSE 'light' END AS band
          FROM events e JOIN prof p USING (user_id)
          ORDER BY event_id""",
    // date_trunc('week') starts Monday on both engines; week offsets are
    // exact day-diff // 7 on week starts; retention is one int/int IEEE
    // division (no rounding needed)
    "retention_cohorts" ->
      """WITH f AS (SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id),
          a AS (SELECT DISTINCT e.user_id,
                       date_trunc('week', f.t0)::DATE AS cohort_week,
                       (date_diff('day', date_trunc('week', f.t0)::DATE,
                                  date_trunc('week', e.ts)::DATE) // 7)::BIGINT
                         AS week_offset
                FROM events e JOIN f USING (user_id)),
          c AS (SELECT cohort_week, week_offset, count(*) AS n_users
                FROM a GROUP BY cohort_week, week_offset),
          s AS (SELECT cohort_week, n_users AS cohort_size
                FROM c WHERE week_offset = 0)
          SELECT c.cohort_week, c.week_offset, c.n_users, s.cohort_size,
                 c.n_users::DOUBLE / s.cohort_size AS retention
          FROM c JOIN s USING (cohort_week)
          ORDER BY cohort_week, week_offset""",
    // pivot == one conditional aggregate per pinned event type
    "events_pivot" ->
      s"""SELECT ts::DATE AS day,
                 ${eventTypes.map(t =>
                   s"count(*) FILTER (event_type = '$t') AS $t").mkString(",\n                 ")}
          FROM events GROUP BY day ORDER BY day""",
    "user_set_ops" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
          er AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
          SELECT 'purchase_and_error' AS segment, user_id
          FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM er)
          UNION ALL
          SELECT 'purchase_no_error', user_id
          FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM er)
          ORDER BY segment, user_id""",
    // step chain as correlated-free CTEs; lags as exact integer micros
    "conversion_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, ts FROM events),
          v AS (SELECT user_id, min(ts) AS t1
                FROM e WHERE event_type = 'view' GROUP BY user_id),
          c AS (SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
                FROM e JOIN v USING (user_id)
                WHERE event_type = 'click' AND e.ts > v.t1
                  AND e.ts <= v.t1 + INTERVAL $funnelWindowSec SECOND
                GROUP BY e.user_id),
          p AS (SELECT e.user_id, min(e.ts) AS t3, min(c.t2) AS t2
                FROM e JOIN c USING (user_id)
                WHERE event_type = 'purchase' AND e.ts > c.t2
                  AND e.ts <= c.t2 + INTERVAL $funnelWindowSec SECOND
                GROUP BY e.user_id)
          SELECT '1_view' AS step, (SELECT count(*) FROM v) AS n_users,
                 0::BIGINT AS total_lag_micros
          UNION ALL
          SELECT '2_click', (SELECT count(*) FROM c),
                 (SELECT coalesce(sum(epoch_us(t2) - epoch_us(t1)), 0)::BIGINT FROM c)
          UNION ALL
          SELECT '3_purchase', (SELECT count(*) FROM p),
                 (SELECT coalesce(sum(epoch_us(t3) - epoch_us(t2)), 0)::BIGINT FROM p)
          ORDER BY step""",
    "first_touch" -> firstTouchOracleSql,
    // islands SQL is the standard declarative statement of SCD2
    // semantics (same status as the sessionization oracle)
    "scd2_history" ->
      s"""WITH r AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          runs AS (
            SELECT user_id, event_type, ts,
                   CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
            FROM r),
          v AS (
            SELECT user_id, run_id, min(event_type) AS attr,
                   min(ts) AS valid_from, count(*) AS n_events
            FROM runs GROUP BY user_id, run_id)
          SELECT user_id, run_id AS version, attr, valid_from,
                 coalesce(lead(valid_from) OVER
                     (PARTITION BY user_id ORDER BY run_id),
                   TIMESTAMP '$scd2OpenEnd') AS valid_to,
                 n_events,
                 run_id = max(run_id) OVER (PARTITION BY user_id) AS is_current
          FROM v ORDER BY user_id, version""",
    // the streaming dedup emits each key's FIRST arrival of the ordered
    // replay == the batch (ts, event_id) minimum: the StreamingDeduplicate
    // state machine is hash-checked against the batch oracle (the
    // interval_join_stream discipline, now for dedup state)
    "first_touch_stream" -> firstTouchOracleSql,
    "asof_last_error" ->
      """SELECT event_id, user_id, ts,
                max(CASE WHEN event_type = 'error' THEN ts END) OVER (
                  PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS last_error_ts
         FROM events ORDER BY event_id""",
    // the islands CTE of user_sessions, plus session_end = last + gap
    // and the append-mode emission predicate end < (max(ts) − delay)
    "user_sessions_stream" -> closedSessionsOracleSql,
    // the multi-batch drain emits the SAME closed-session set (chunk-
    // count invariance: the final watermark is max(ts) − delay either
    // way) — the batch islands SQL independently states what the
    // incremental state machine must reproduce across real micro-batches
    "user_sessions_stream_chunked" -> closedSessionsOracleSql,
    "user_sessions" ->
      """WITH e AS (
           SELECT user_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
           FROM events),
         f AS (
           SELECT user_id, ts,
                  CASE WHEN prev IS NULL OR ts - prev > INTERVAL '30 minutes'
                       THEN 1 ELSE 0 END AS new_session
           FROM e),
         g AS (
           SELECT user_id, ts,
                  sum(new_session) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM f)
         SELECT user_id, min(ts) AS session_start, count(*) AS n_events
         FROM g GROUP BY user_id, session_id
         ORDER BY user_id, session_start""",
    "event_count_sliding" ->
      """WITH m AS (
           SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
                    AS win_start
           FROM events)
         SELECT win_start, count(*) AS cnt
         FROM m GROUP BY win_start ORDER BY win_start""",
    "events_json_extract" ->
      """SELECT event_type,
                sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
                count(json_extract_string(props, '$.k')) AS n_with_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "event_count_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, count(*) AS cnt
         FROM events GROUP BY hour_start ORDER BY hour_start""",
    // the MV-rewritten query must be indistinguishable from the base
    // hourly query — same oracle
    "mv_hourly_rewrite" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, count(*) AS cnt
         FROM events GROUP BY hour_start ORDER BY hour_start""",
    // the incrementally-maintained MV must be indistinguishable from a
    // full recompute — the batch hourly query IS its oracle
    "event_count_hourly_incremental" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, count(*) AS cnt
         FROM events GROUP BY hour_start ORDER BY hour_start""",
    "region_event_count" ->
      """WITH r AS (
           SELECT CASE WHEN value >= 75.0 THEN 'high'
                       WHEN value < 25.0 THEN 'low' END AS region, ts
           FROM events)
         SELECT region, time_bucket(INTERVAL '1 hour', ts) AS hour_start, count(*) AS cnt
         FROM r WHERE region IS NOT NULL
         GROUP BY region, hour_start ORDER BY region, hour_start""",
    // resample: same composition — sparse hourly max, generated grid,
    // left join, ignore-nulls fill; `filled` is a CARRIED double (never
    // arithmetic), so it ships raw. Leading pre-first-observation hours
    // stay NULL on both engines.
    "events_resample" ->
      """WITH ev AS (
           SELECT event_type, date_trunc('hour', ts) AS hour, value FROM events),
         hourly AS (
           SELECT event_type, hour, max(value) AS hmax FROM ev GROUP BY 1, 2),
         grid AS (
           SELECT unnest(generate_series(min(hour), max(hour), INTERVAL 1 HOUR)) AS hour
           FROM ev),
         g AS (
           SELECT t.event_type, grid.hour
           FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN grid)
         SELECT g.event_type, g.hour AS hour_start,
                last_value(h.hmax IGNORE NULLS) OVER (
                  PARTITION BY g.event_type ORDER BY g.hour
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM g LEFT JOIN hourly h
           ON g.event_type = h.event_type AND g.hour = h.hour
         ORDER BY 1, 2""",
    "trending_arrivals" -> trendingOracleSql,
    // the late-replay streaming variant must land on the IDENTICAL batch
    // truth: the lateness buffer folds the delayed third of each early
    // window back in, and the timeout flush emits the trailing windows —
    // so the oracle is the same SQL
    "trending_arrivals_late" -> trendingOracleSql,
    "logsumexp_by_group" ->
      """WITH m AS (
           SELECT event_type, max(value / 100.0) AS mx
           FROM events GROUP BY event_type)
         SELECT e.event_type,
                round(mx + ln(sum(exp(value / 100.0 - mx))), 6) AS lse
         FROM events e JOIN m USING (event_type)
         GROUP BY e.event_type, mx
         ORDER BY event_type""")
}
