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
  * (`TrendingArrivals.scala:47-68`). */
case class TrendState(winStart: Long, cur: Long, prev: Long)

/** Emitted when a window closes. */
case class WindowResult(key: String, winStartMicros: Long, cur: Long,
    prev: Long, isTrending: Boolean)

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

  /** R4: the trend state machine — `flatMapGroupsWithState` keyed by
    * company. A window closes when a later-window event for the same key
    * arrives; the closed window emits with the reference predicate
    * `cur ≥ 2·prev && cur ≥ 10` evaluated against the immediately
    * preceding window (gap ⇒ prev = 0), matching
    * `EventAnalytics.trendingArrivals` exactly.
    *
    * In-order delivery is assumed (the reference's queueStream replay is
    * strictly ordered); out-of-order events older than the open window
    * are dropped — the place a production version would add a watermark
    * + allowed-lateness buffer in the state.
    */
  def detectTrends(events: Dataset[KeyedEvent], windowMicros: Long,
      minCount: Long = 10L): Dataset[WindowResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[KeyedEvent], state: GroupState[TrendState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[WindowResult]
          var st = state.getOption.getOrElse(TrendState(-1L, 0L, 0L))
          it.toSeq.sortBy(_.tsMicros).foreach { e =>
            val w = e.tsMicros - e.tsMicros % windowMicros
            if (st.winStart == -1L) st = TrendState(w, 1L, 0L)
            else if (w == st.winStart) st = st.copy(cur = st.cur + 1L)
            else if (w > st.winStart) {
              out += WindowResult(key, st.winStart, st.cur, st.prev,
                st.cur >= 2L * st.prev && st.cur >= minCount)
              val prev = if (w == st.winStart + windowMicros) st.cur else 0L
              st = TrendState(w, 1L, prev)
            } // w < winStart: late event older than the open window — dropped
          }
          state.update(st)
          out.iterator
      }
  }
}
