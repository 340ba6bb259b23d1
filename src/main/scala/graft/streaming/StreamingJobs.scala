package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed event: key = the reference's "company" (here event_type /
  * region), tsMicros = event time in microseconds. */
case class KeyedEvent(key: String, tsMicros: Long)

/** Per-key detector state: the open window and the previous window's
  * count — the Structured Streaming form of the reference's
  * `mapWithState` tuple `(cur, batchTimeMs, prev)`
  * (`TrendingArrivals.scala:47-68`). With allowed lateness the state
  * additionally BUFFERS the most recently closed window (`pend*`) so
  * late events within one window of the open one fold in before the
  * window is emitted; `pendStart = -1` means nothing is buffered. */
/** Ring state for the streaming anomaly detector: the open window plus
  * the counts of the ≤24 most recently CLOSED windows (newest first) —
  * bounded per-key state by construction, the property that lets the
  * operator run forever. */
case class AnomalyState(winStart: Long, cur: Long, ring: List[Long])
case class AnomalyResult(key: String, winStartMicros: Long, cnt: Long,
                         baselineN: Int, isAnomaly: Boolean)

/** The integer 3σ anomaly test shared by the batch plan
  * (`EventAnalytics.eventsAnomaly`) and the streaming ring state
  * ([[StreamingJobs.detectAnomalies]]) — one definition so the replay
  * differential can never drift.
  *
  * Exactness bound: with every cell count ≤ B and a ≤24-cell baseline,
  * the worst Long intermediate is rhs = 9·(n·sxx − sx²) ≤ 9·24·24·B² =
  * 5184·B², which stays under Long.MaxValue (9.22e18) iff B ≤ ~4.2e7
  * (lhs (48B)² = 2304·B² is smaller; sxx itself ≤ 24B² needs B ≤ 6.2e8).
  * Beyond [[AnomalyMath.longSafeCellBound]] the test switches to the
  * double-domain form — same inequality, 53-bit mantissa precision
  * instead of silent wraparound. */
object AnomalyMath {
  /** Per-cell count up to which every Long intermediate above is exact. */
  val longSafeCellBound: Long = 40000000L

  def threeSigma(cur: Long, ring: Seq[Long]): Boolean = {
    val n = ring.length.toLong
    if (cur <= longSafeCellBound && ring.forall(_ <= longSafeCellBound)) {
      val sx = ring.sum
      val sxx = ring.map(c => c * c).sum
      val d = n * cur - sx
      d * d > 9L * (n * sxx - sx * sx)
    } else {
      // Double addition is order-sensitive (non-associative). The batch
      // plan's window sums accumulate the frame CHRONOLOGICALLY (rows in
      // hour order, oldest first); the streaming ring is prepend-ordered
      // (newest first). Summing the ring reversed keeps both paths adding
      // the same values in the same order, so a hot cell sitting exactly
      // at the 3σ boundary cannot make the replay differential disagree
      // by one ulp.
      val chron = ring.reverseIterator.toSeq
      val sx = chron.foldLeft(0.0)(_ + _.toDouble)
      val sxx = chron.foldLeft(0.0)((a, c) => a + c.toDouble * c.toDouble)
      val d = n.toDouble * cur.toDouble - sx
      d * d > 9.0 * (n.toDouble * sxx - sx * sx)
    }
  }
}

case class TrendState(winStart: Long, cur: Long, prev: Long,
    pendStart: Long = -1L, pendCur: Long = 0L, pendPrev: Long = 0L)

/** Emitted when a window closes. */
case class WindowResult(key: String, winStartMicros: Long, cur: Long,
    prev: Long, isTrending: Boolean)

/** [[KeyedEvent]] plus the instant-typed event-time column the watermark
  * (and hence EventTimeTimeout) requires. Top-level for Encoder derivation. */
case class TimedKeyedEvent(key: String, tsMicros: Long,
    eventTime: java.sql.Timestamp)

/** True Structured Streaming forms of the reference's a7 DStream jobs
  * (SURVEY §2.9). The batch-equivalent, oracle-checked semantics live in
  * `operators.EventAnalytics`; ScalaTest drives these against MemoryStream
  * / file sources and asserts agreement with the batch results — the
  * stream/batch differential replaces the reference's ManualClock replay
  * determinism (R6).
  */
object StreamingJobs {

  /** R1: tumbling hourly counts as a streaming aggregation. Watermark
    * bounds state: at scale the state store holds only open windows. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      // watermarks require an instant-typed column; testdata is NTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").cast("timestamp_ntz").as("hour_start"), col("cnt"))

  /** Stream-stream interval join (absent from the reference's DStream
    * surface entirely): purchases joined with same-user errors in the
    * preceding 5 minutes. Watermarks on BOTH sides bound the state store
    * — each side buffers only rows younger than watermark + interval;
    * without them a stream-stream join would hold its entire history. */
  def streamIntervalJoin(purchases: DataFrame, errors: DataFrame): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").cast("timestamp").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val e = errors
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").cast("timestamp").as("e_ts"))
      .withWatermark("e_ts", "10 minutes")
    p.join(e, expr(
      """p_user = e_user AND
         e_ts <= p_ts AND
         e_ts > p_ts - INTERVAL 300 SECONDS"""))
      .select(col("purchase_id"), col("error_id"), col("p_user").as("user_id"))
  }

  /** LEFT OUTER stream-stream interval join — the semantics inner joins
    * dodge: an unmatched purchase cannot emit when it arrives (a match
    * may still come), so the state store holds it until the ERROR-side
    * watermark passes its join horizon and only THEN emits the
    * null-padded row. The null is therefore a watermark-gated promise,
    * not a per-batch miss — StreamingSpec drives this: the unmatched
    * row is absent right after its batch and appears exactly once after
    * a later batch advances the watermark. Same both-sided watermarks +
    * time-bound condition as the inner form (they are what make outer
    * emission decidable at all). */
  def streamIntervalJoinOuter(purchases: DataFrame, errors: DataFrame): DataFrame =
    streamIntervalJoinTyped(purchases, errors, "left_outer")

  /** FULL OUTER: unmatched rows from BOTH sides emit null-padded once
    * their own watermark horizon passes — an unmatched error waits for
    * the purchase-side watermark to rule out a future purchase inside
    * its forward interval, symmetric to the left-outer case. The joined
    * user_id coalesces across sides because only one side populates it
    * on an outer row. */
  def streamIntervalJoinFull(purchases: DataFrame, errors: DataFrame): DataFrame =
    streamIntervalJoinTyped(purchases, errors, "full_outer")

  private def streamIntervalJoinTyped(purchases: DataFrame, errors: DataFrame,
                                      joinType: String): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").cast("timestamp").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val e = errors
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").cast("timestamp").as("e_ts"))
      .withWatermark("e_ts", "10 minutes")
    p.join(e, expr(
      """p_user = e_user AND
         e_ts <= p_ts AND
         e_ts > p_ts - INTERVAL 300 SECONDS"""), joinType)
      .select(col("purchase_id"), col("error_id"),
        coalesce(col("p_user"), col("e_user")).as("user_id"))
  }

  /** Streaming exact dedup — the ingest-side form of the batch
    * `Dedup.dedupExact`: drop re-crawled duplicate documents AS THEY
    * ARRIVE. The dedup key is the same md5 over whitespace-normalized
    * tokens, so a doc kept here is exactly a batch-dedup representative
    * (first arrival wins; StreamingSpec feeds doc_id order and asserts
    * set equality with the batch representatives).
    *
    * `dropDuplicatesWithinWatermark` is the piece that scales: state
    * holds only signatures younger than the watermark horizon, where a
    * plain `dropDuplicates` on an unbounded stream would grow its state
    * store with every signature ever seen. Re-crawls beyond the horizon
    * pass through again — the standard trade, handled downstream by the
    * batch dedup over the landed corpus. */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .withColumn("sig",
        md5(array_join(graft.functions.TextFunctions.tokenize(col("text")), " ")))
      .dropDuplicatesWithinWatermark("sig")
      .select("doc_id", "sig", "ts")

  /** One micro-batch of incremental materialized-view maintenance: merge
    * this batch's hourly count deltas into a parquet MV partitioned by
    * `hour_id` (epoch hours). The production exactly-once sink pattern
    * for `foreachBatch`:
    *
    *  - the batch is aggregated FIRST (delta rows ≪ batch rows);
    *  - only the MV partitions the delta touches are read back — a
    *    partition-pruned scan, so merge cost is O(touched hours), never
    *    O(MV size), no matter how much history the view holds;
    *  - every MV row carries `last_batch`, the id of the micro-batch
    *    that last updated it. A REPLAYED batch (Spark re-runs a batch
    *    after a failure before the checkpoint committed) finds
    *    `last_batch >= batchId` and adds nothing — idempotent replay is
    *    what upgrades at-least-once delivery to exactly-once content
    *    (StreamingSpec replays a batch deliberately and asserts the MV
    *    is unchanged);
    *  - the write uses DYNAMIC partition overwrite: untouched hours'
    *    files are not rewritten.
    *
    * Returns the touched hour count (diagnostic only). */
  def mergeHourlyBatch(spark: org.apache.spark.sql.SparkSession,
      mvPath: String, batch: DataFrame, batchId: Long): Int = {
    val delta = batch
      .withColumn("hour_id",
        floor(unix_micros(col("ts")) / lit(3600L * 1000 * 1000)).cast("long"))
      .groupBy("hour_id").agg(count(lit(1)).as("delta"))
    val touched = delta.select("hour_id").collect().map(_.getLong(0))
    if (touched.isEmpty) return 0
    // "exists" must mean "holds at least one hour_id= partition": the
    // caller may hand us a pre-created empty directory, and reading that
    // as parquet fails schema inference
    val hasPartitions = {
      val fs = new java.io.File(mvPath).listFiles()
      fs != null && fs.exists(f => f.isDirectory && f.getName.startsWith("hour_id="))
    }
    val existing =
      if (hasPartitions)
        spark.read.parquet(mvPath)
          .filter(col("hour_id").isin(touched.toIndexedSeq: _*))
          .select(col("hour_id"), col("cnt"), col("last_batch"))
      else
        spark.emptyDataFrame
          .select(lit(0L).as("hour_id"), lit(0L).as("cnt"),
            lit(-1L).as("last_batch")).limit(0)
    val merged = existing.as("e")
      .join(delta.as("d"), Seq("hour_id"), "full_outer")
      .select(col("hour_id"),
        (coalesce(col("cnt"), lit(0L)) +
          // the exactly-once guard: a replayed batch contributes nothing
          when(coalesce(col("last_batch"), lit(-1L)) < batchId,
            coalesce(col("delta"), lit(0L))).otherwise(lit(0L))).as("cnt"),
        greatest(coalesce(col("last_batch"), lit(-1L)), lit(batchId))
          .as("last_batch"))
    // localCheckpoint: the merged rows must be MATERIALIZED before the
    // dynamic overwrite deletes the very partitions the plan reads
    val pinned = merged.localCheckpoint(true)
    try pinned.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("hour_id").parquet(mvPath)
    finally graft.Tables.releaseCheckpoint(pinned)
    touched.length
  }

  /** Streaming twin of `events_anomaly`: rolling-baseline 3σ detection
    * as a `flatMapGroupsWithState` machine keyed by event type. State is
    * the open hourly window plus a ring of the ≤24 most recently CLOSED
    * window counts — bounded per key no matter how long the stream runs.
    * A window closes when a later-window event arrives (in-order
    * delivery, the detectTrends default); on close the flag is computed
    * against the ring with the SAME integer inequality as the batch
    * query — (n·x−Σx)² > 9·(n·Σx²−(Σx)²), no float at the decision
    * boundary — then the count joins the ring and the oldest entry
    * beyond 24 falls off. Rows with fewer than 12 baseline windows
    * report false, exactly like the batch frame. Trailing open windows
    * are closed by the caller's drain discipline (StreamingSpec feeds
    * per-key sentinels, the registered-replay pattern). */
  def detectAnomalies(events: Dataset[KeyedEvent], windowMicros: Long,
      minBaseline: Int = 12): Dataset[AnomalyResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    val func: (String, Iterator[KeyedEvent], GroupState[AnomalyState]) => Iterator[AnomalyResult] =
      (key, it, state) => {
        val out = scala.collection.mutable.ListBuffer.empty[AnomalyResult]
        var st = state.getOption.getOrElse(AnomalyState(-1L, 0L, Nil))
        def close(): Unit = {
          val ring = st.ring
          val flag = ring.length >= minBaseline &&
            AnomalyMath.threeSigma(st.cur, ring)
          out += AnomalyResult(key, st.winStart, st.cur, ring.length, flag)
          st = AnomalyState(-1L, 0L, (st.cur :: ring).take(24))
        }
        it.toSeq.sortBy(_.tsMicros).foreach { e =>
          val w = e.tsMicros - e.tsMicros % windowMicros
          if (st.winStart == -1L) st = st.copy(winStart = w, cur = 1L)
          else if (w == st.winStart) st = st.copy(cur = st.cur + 1L)
          else if (w > st.winStart) { close(); st = st.copy(winStart = w, cur = 1L) }
          // w < open window: late beyond the in-order contract — dropped
        }
        state.update(st)
        out.iterator
      }
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(func)
  }

  /** R4: the trend state machine — `flatMapGroupsWithState` keyed by
    * company. A window closes when a later-window event for the same key
    * arrives; the closed window emits with the reference predicate
    * `cur ≥ 2·prev && cur ≥ 10` evaluated against the immediately
    * preceding window (gap ⇒ prev = 0), matching
    * `EventAnalytics.trendingArrivals` exactly.
    *
    * `allowedLatenessWindows = 0` (default) assumes in-order delivery
    * (the reference's queueStream replay is strictly ordered): a window
    * emits the moment a later window opens, and events older than the
    * open window drop. `= 1` buffers the most recently closed window in
    * state instead of emitting it immediately; late events that belong
    * to it (anything within one window of the open one) fold in, and it
    * emits only when the NEXT window transition finalizes it. Emission
    * is therefore deferred by one window and a finite stream holds TWO
    * un-emitted windows per key — the standard lateness/latency trade;
    * events more than one window late still drop (they would need a
    * retraction, which Append mode cannot express).
    *
    * `timeoutFlush = true` additionally finalizes TRAILING windows: the
    * input gets a watermark whose delay covers the lateness horizon
    * ((1 + allowedLateness) windows — Spark filters stateful-operator
    * input older than the watermark, so a zero delay would silently
    * drop the very late events the buffer exists to fold), each key
    * arms an event-time timeout at its open window's lateness horizon
    * (open end + allowedLateness·window), and when the global watermark
    * passes it — no successor event required — the buffered window and
    * the open one emit and the key's state is REMOVED instead of
    * sitting in the state store forever (the observability the
    * reference gets from printing per-batch state snapshots,
    * `TrendingArrivals.scala:54-63`). The horizon rests on the usual
    * cross-key skew assumption: a key quiet for more than the lateness
    * horizon (by watermark) is final; an event for it arriving later
    * still opens a fresh window rather than silently dropping (Append
    * mode cannot retract the flushed one). */
  def detectTrends(events: Dataset[KeyedEvent], windowMicros: Long,
      minCount: Long = 10L, allowedLatenessWindows: Int = 0,
      timeoutFlush: Boolean = false): Dataset[WindowResult] = {
    require(allowedLatenessWindows == 0 || allowedLatenessWindows == 1,
      "allowedLatenessWindows must be 0 or 1 (one buffered window)")
    val spark = events.sparkSession
    import spark.implicits._
    val buffered = allowedLatenessWindows == 1

    def openPrevOf(st: TrendState): Long =
      if (st.pendStart != -1L && st.winStart == st.pendStart + windowMicros) st.pendCur
      else if (!buffered) st.prev
      else 0L

    val func: (String, Iterator[KeyedEvent], GroupState[TrendState]) => Iterator[WindowResult] =
      (key, it, state) => {
        val out = scala.collection.mutable.ListBuffer.empty[WindowResult]
        def emit(winStart: Long, cur: Long, prev: Long): Unit =
          out += WindowResult(key, winStart, cur, prev,
            cur >= 2L * prev && cur >= minCount)
        if (timeoutFlush && state.hasTimedOut) {
          // watermark passed the open window's lateness horizon: nothing
          // can change these windows any more — flush buffer then open,
          // resolving the open window's prev from the buffer exactly as a
          // successor transition would have
          val st = state.get
          if (buffered && st.pendStart != -1L) emit(st.pendStart, st.pendCur, st.pendPrev)
          if (st.winStart != -1L) emit(st.winStart, st.cur, openPrevOf(st))
          state.remove()
        } else {
          var st = state.getOption.getOrElse(TrendState(-1L, 0L, 0L))
          it.toSeq.sortBy(_.tsMicros).foreach { e =>
            val w = e.tsMicros - e.tsMicros % windowMicros
            if (st.winStart == -1L) st = TrendState(w, 1L, 0L)
            else if (w == st.winStart) st = st.copy(cur = st.cur + 1L)
            else if (w > st.winStart) {
              if (buffered) {
                // the buffered window is final now — the open one replaces
                // it in the buffer, with its prev link resolved LAZILY so
                // late folds into the buffer were counted
                if (st.pendStart != -1L) emit(st.pendStart, st.pendCur, st.pendPrev)
                val openPrev =
                  if (st.pendStart != -1L && st.winStart == st.pendStart + windowMicros)
                    st.pendCur
                  else 0L
                st = TrendState(w, 1L, 0L, st.winStart, st.cur, openPrev)
              } else {
                emit(st.winStart, st.cur, st.prev)
                val prev = if (w == st.winStart + windowMicros) st.cur else 0L
                st = TrendState(w, 1L, prev)
              }
            } else if (buffered && w == st.pendStart)
              // late event for the buffered window — folds in (this is the
              // whole point of the buffer)
              st = st.copy(pendCur = st.pendCur + 1L)
            else if (buffered && w > st.pendStart && w >= st.winStart - windowMicros) {
              // late event OPENS the gap window directly behind the open
              // one (its first event arrived late): it becomes the buffer;
              // whatever was buffered before it is final
              if (st.pendStart != -1L) emit(st.pendStart, st.pendCur, st.pendPrev)
              val prev =
                if (st.pendStart != -1L && w == st.pendStart + windowMicros) st.pendCur
                else 0L
              st = st.copy(pendStart = w, pendCur = 1L, pendPrev = prev)
            } // else: beyond the lateness horizon — dropped
          }
          state.update(st)
          if (timeoutFlush && st.winStart != -1L)
            // arm (or re-arm) the flush at the open window's lateness
            // horizon; the timeout timestamp must sit above the current
            // watermark, so a horizon the watermark already passed fires
            // on the very next batch
            state.setTimeoutTimestamp(math.max(
              (st.winStart + (1L + allowedLatenessWindows) * windowMicros) / 1000L,
              state.getCurrentWatermarkMs() + 1L))
        }
        out.iterator
      }

    if (timeoutFlush)
      events
        .withColumn("eventTime", timestamp_micros(col("tsMicros")))
        .withWatermark("eventTime",
          s"${(1L + allowedLatenessWindows) * windowMicros / 1000L} milliseconds")
        .as[TimedKeyedEvent]
        .groupByKey(_.key)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (key: String, it: Iterator[TimedKeyedEvent], state: GroupState[TrendState]) =>
            func(key, it.map(e => KeyedEvent(e.key, e.tsMicros)), state)
        }
    else
      events.groupByKey(_.key)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(func)
  }
}
