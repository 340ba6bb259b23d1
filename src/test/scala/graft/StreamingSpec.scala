package graft

import graft.operators.EventAnalytics
import graft.streaming.{KeyedEvent, StreamingJobs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Top-level so spark.implicits can derive its Encoder. */
case class TimedDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

class StreamingSpec extends GraftSpec {
  import spark.implicits._

  test("streaming hourly counts equal the batch query (file source, AvailableNow)") {
    // land events as µs-timestamped parquet the file source can read
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val batchDf = Tables.events(spark, sfDir)
    batchDf.write.mode("overwrite").parquet(s"$tmp/events")
    val stream = spark.readStream
      .schema(batchDf.schema)
      .parquet(s"$tmp/events")
    val q = StreamingJobs.hourlyCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("hourly_out")
      .collect().map(r => r.getAs[java.time.LocalDateTime](0) -> r.getLong(1)).toMap
    val want = EventAnalytics.eventCountHourly(spark, sfDir)
      .collect().map(r => r.getAs[java.time.LocalDateTime](0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("window counts conserve events (property: per-window sums equal totals)") {
    val total = Tables.events(spark, sfDir).count()
    val hourly = graft.operators.EventAnalytics.eventCountHourly(spark, sfDir)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(hourly == total)
    val sessions = graft.operators.EventAnalytics.userSessions(spark, sfDir)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(sessions == total)
    // sliding 1h/30min: every event lands in exactly two windows
    val sliding = graft.operators.EventAnalytics.eventCountSliding(spark, sfDir)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(sliding == total * 2)
  }

  test("stream-stream interval join equals the batch interval join") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    val ev = Tables.events(spark, sfDir)
    ev.filter(col("event_type") === "purchase").write.parquet(s"$tmp/purchases")
    ev.filter(col("event_type") === "error").write.parquet(s"$tmp/errors")
    val pStream = spark.readStream.schema(ev.schema).parquet(s"$tmp/purchases")
    val eStream = spark.readStream.schema(ev.schema).parquet(s"$tmp/errors")
    val q = StreamingJobs.streamIntervalJoin(pStream, eStream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.operators.EventAnalytics.intervalJoinErrors(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("error_id"))).toSet
    assert(want.nonEmpty)
    assert(got == want, s"stream $got vs batch $want")
  }

  test("left-outer stream-stream join: null rows are watermark-gated, emitted once") {
    // the semantics inner joins dodge: an unmatched purchase must NOT
    // emit in its own batch (a match may still arrive) and MUST emit
    // null-padded exactly once after the watermark passes its horizon
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val eIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    def df(ms: MemoryStream[(Long, Long, java.sql.Timestamp)]) =
      ms.toDF.toDF("event_id", "user_id", "ts")
    val qn = "ssj_outer_" + java.util.UUID.randomUUID().toString.take(8)
    val q = StreamingJobs.streamIntervalJoinOuter(df(pIn), df(eIn))
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    try {
      // batch 1: purchase 1 matches error 100; purchase 2 has no match
      pIn.addData((1L, 1L, t("10:00:00")), (2L, 2L, t("10:00:00")))
      eIn.addData((100L, 1L, t("09:58:00")))
      q.processAllAvailable()
      val after1 = spark.table(qn).collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(after1.contains((1L, Some(100L))), s"matched row missing: $after1")
      assert(!after1.exists(_._1 == 2L),
        "unmatched purchase emitted before its watermark horizon")
      // batch 2 advances both watermarks past purchase 2's horizon
      // (10:00 + 5 min interval < 10:30 − 10 min delay)
      pIn.addData((3L, 9L, t("10:30:00")))
      eIn.addData((101L, 8L, t("10:30:00")))
      q.processAllAvailable()
      // batch 3: any further data lets the evicting batch run
      pIn.addData((4L, 9L, t("11:30:00")))
      eIn.addData((102L, 8L, t("11:30:00")))
      q.processAllAvailable()
      val rows = spark.table(qn).collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      assert(rows.count(_ == (2L, None)) == 1,
        s"null-padded row must appear exactly once: $rows")
      // purchase 3 (no same-user error) is past the watermark too
      assert(rows.count(_ == (3L, None)) == 1, rows.toString)
      // batch 3's own purchase is still pending — no premature null
      assert(!rows.exists(_._1 == 4L), rows.toString)
    } finally q.stop()
  }

  test("full-outer stream-stream join: both sides' unmatched rows emit null-padded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val eIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    def df(ms: MemoryStream[(Long, Long, java.sql.Timestamp)]) =
      ms.toDF.toDF("event_id", "user_id", "ts")
    val qn = "ssj_full_" + java.util.UUID.randomUUID().toString.take(8)
    val q = StreamingJobs.streamIntervalJoinFull(df(pIn), df(eIn))
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    try {
      // purchase 1 ↔ error 100 match; purchase 2 and error 101 are both
      // unmatched (different users)
      pIn.addData((1L, 1L, t("10:00:00")), (2L, 2L, t("10:00:00")))
      eIn.addData((100L, 1L, t("09:58:00")), (101L, 3L, t("09:58:00")))
      q.processAllAvailable()
      // advance both watermarks far past every horizon, then one more
      // batch so the eviction pass runs
      pIn.addData((3L, 9L, t("11:00:00"))); eIn.addData((102L, 8L, t("11:00:00")))
      q.processAllAvailable()
      pIn.addData((4L, 9L, t("12:00:00"))); eIn.addData((103L, 8L, t("12:00:00")))
      q.processAllAvailable()
      val rows = spark.table(qn).collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2))).toSeq
      assert(rows.contains((Some(1L), Some(100L), 1L)), rows.toString)
      // purchase-side null (unmatched purchase 2) AND error-side null
      // (unmatched error 101), each exactly once, each with the right
      // coalesced user
      assert(rows.count(_ == ((Some(2L), None, 2L))) == 1, rows.toString)
      assert(rows.count(_ == ((None, Some(101L), 3L))) == 1, rows.toString)
    } finally q.stop()
  }

  test("registered interval_join_stream: batch-row parity + bounded join state") {
    // the registered replay drives the SAME dataflow as the file-source
    // test above, but in six time-ordered micro-batches — so the
    // watermark actually advances BETWEEN batches and the symmetric hash
    // join's state eviction is exercised, not just its matching logic
    val got = EventAnalytics.intervalJoinStream(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = EventAnalytics.intervalJoinErrors(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("error_id"))).toSet
    assert(want.nonEmpty)
    assert(got == want, s"stream ${got.size} rows vs batch ${want.size}")
    // bounded state: after the drain, the store holds only rows younger
    // than the eviction horizon (watermark delay + join interval), not
    // the full history of both sides — THE property that lets this
    // operator run on an unbounded feed. The feed spans days, so the
    // retained tail must be a strict (in practice small) subset.
    val fed = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "error")).count()
    val prog = EventAnalytics.lastStreamJoinProgress
      .getOrElse(fail("replay recorded no final progress"))
    val stateRows = prog.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows < fed,
      s"join state holds $stateRows rows — no eviction over a $fed-row feed")
  }

  test("incremental MV: replayed batch adds nothing (exactly-once guard)") {
    // the registered replay proves sum-of-deltas == full recompute via
    // its oracle; this test proves the failure-mode half: Spark re-runs
    // a micro-batch whose checkpoint didn't commit, so the SAME (batch,
    // batchId) arrives twice and must merge as a no-op
    val mv = java.nio.file.Files.createTempDirectory("graft-mv-replay").toString
    val batch = Tables.events(spark, sfDir)
      .select(col("ts").cast("timestamp").as("ts")).limit(500)
    graft.streaming.StreamingJobs.mergeHourlyBatch(spark, mv, batch, 0L)
    val once = spark.read.parquet(mv).collect()
      .map(r => r.getAs[Number]("hour_id").longValue -> r.getAs[Long]("cnt")).toMap
    graft.streaming.StreamingJobs.mergeHourlyBatch(spark, mv, batch, 0L)
    val twice = spark.read.parquet(mv).collect()
      .map(r => r.getAs[Number]("hour_id").longValue -> r.getAs[Long]("cnt")).toMap
    assert(once.nonEmpty)
    assert(twice == once, "replaying batchId 0 changed the MV — not exactly-once")
    // a genuinely NEW batch (same rows, next batchId) must double counts:
    // the guard keys on batch identity, not content
    graft.streaming.StreamingJobs.mergeHourlyBatch(spark, mv, batch, 1L)
    val fresh = spark.read.parquet(mv).collect()
      .map(r => r.getAs[Number]("hour_id").longValue -> r.getAs[Long]("cnt")).toMap
    assert(fresh == once.map { case (h, c) => h -> c * 2 })
  }

  test("incremental MV is chunking-invariant: one batch equals eleven") {
    // the merge must be a monoid fold over batches: ANY partition of the
    // input into micro-batches — including interleaved, non-time-ordered
    // ones — lands the identical MV. 11 deliberately does not divide the
    // row count and the modulo chunks interleave hours across batches.
    def build(nChunks: Int): Map[Long, Long] = {
      val mv = java.nio.file.Files.createTempDirectory("graft-mv-chunk").toString
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
      (0 until nChunks).foreach { i =>
        graft.streaming.StreamingJobs.mergeHourlyBatch(spark, mv,
          ev.filter(col("event_id") % nChunks === i).select("ts"), i.toLong)
      }
      spark.read.parquet(mv).collect()
        .map(r => r.getAs[Number]("hour_id").longValue -> r.getAs[Long]("cnt")).toMap
    }
    val one = build(1)
    assert(one.nonEmpty && one.values.sum == Tables.events(spark, sfDir).count())
    assert(build(11) == one, "chunking changed the merged MV")
  }

  test("stream-static enrichment is stateless and preserves every event") {
    val out = EventAnalytics.eventsEnrichStream(spark, sfDir)
    val total = Tables.events(spark, sfDir).count()
    assert(out.count() == total,
      "the profile join dropped events — the static snapshot must cover every user")
    // no streaming state AT ALL: the static side broadcasts into each
    // micro-batch; nothing accumulates across batches — the property
    // that makes this shape O(batch), not O(stream), at 100 TB/day
    val prog = EventAnalytics.lastEnrichProgress
      .getOrElse(fail("drain recorded no final progress"))
    assert(prog.stateOperators.isEmpty,
      s"stream-static enrichment created state: ${prog.stateOperators.toSeq}")
  }

  test("region-keyed trend machine matches batch semantics (R2+R4 composition)") {
    implicit val sc = spark.sqlContext
    val windowMicros = 60L * 60 * 1000 * 1000 // hourly, matching region_event_count
    val events = Tables.events(spark, sfDir)
      .withColumn("region", graft.operators.EventAnalytics.regionOf(col("value")))
      .filter(col("region").isNotNull)
      .select(col("region").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
      .as[KeyedEvent]
      .collect().sortBy(_.tsMicros)
    val input = MemoryStream[KeyedEvent]
    val q = StreamingJobs.detectTrends(input.toDS(), windowMicros)
      .writeStream.outputMode("append")
      .format("memory").queryName("region_trend_out")
      .start()
    input.addData(events.toSeq)
    q.processAllAvailable()
    q.stop()
    // closed windows must carry the same counts as the batch region query
    val got = spark.table("region_trend_out").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = graft.operators.EventAnalytics.regionEventCount(spark, sfDir).collect()
      .map { r =>
        val micros = r.getAs[java.time.LocalDateTime]("hour_start")
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000
        (r.getAs[String]("region"), micros) -> r.getAs[Long]("cnt")
      }.toMap
    assert(got.nonEmpty)
    got.foreach { case (k, cur) =>
      assert(want.get(k).contains(cur), s"window $k: stream $cur vs batch ${want.get(k)}")
    }
  }

  test("streaming anomaly detector reproduces the batch flags with bounded ring state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val W = 3600L * 1000000L
    val input = MemoryStream[KeyedEvent]
    val qn = "anom_" + java.util.UUID.randomUUID().toString.take(8)
    val q = StreamingJobs.detectAnomalies(input.toDS(), W)
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    val events = Tables.events(spark, sfDir).select("event_type", "ts").collect()
      .map { r =>
        KeyedEvent(r.getString(0),
          r.getAs[java.time.LocalDateTime]("ts")
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
      }.sortBy(_.tsMicros)
    try {
      // two in-order batches, then one far-future sentinel per key to
      // close the trailing windows (the registered-replay discipline);
      // sentinel windows themselves never close, so they never emit
      val (b1, b2) = events.splitAt(events.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val sentinelTs = events.last.tsMicros + 1000L * W
      input.addData(events.map(_.key).distinct.toSeq
        .map(k => KeyedEvent(k, sentinelTs)))
      q.processAllAvailable()
      def micros(v: Any): Long = v match {
        case t: java.sql.Timestamp => t.toInstant.toEpochMilli * 1000L
        case d: java.time.LocalDateTime =>
          d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      }
      val got = spark.table(qn).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getBoolean(4)))).toMap
      val want = graft.operators.EventAnalytics.eventsAnomaly(spark, sfDir)
        .collect()
        .map(r => (r.getString(0), micros(r.get(1))) ->
          ((r.getLong(2), r.getBoolean(3)))).toMap
      assert(want.nonEmpty && got.size == want.size,
        s"stream ${got.size} rows vs batch ${want.size}")
      assert(got == want)
      // the state bound: every emitted row's baseline arity is <= 24
      assert(spark.table(qn).collect().forall(_.getInt(3) <= 24))
    } finally q.stop()
  }

  test("restart from checkpoint restores state and processes only new files (R7)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val ckpt = s"$tmp/ckpt"
    val srcDir = s"$tmp/events"
    val ev = Tables.events(spark, sfDir).orderBy("ts").cache()
    val half = (ev.count() / 2).toInt
    ev.limit(half).write.mode("append").parquet(srcDir)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(ev.schema).parquet(srcDir)
      val q = StreamingJobs.hourlyCounts(stream)
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("restart_out")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce() // first run: only the first half exists
    val afterFirst = spark.table("restart_out")
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(afterFirst == half)
    // land the second half, restart a NEW query from the same checkpoint
    ev.exceptAll(ev.limit(half)).write.mode("append").parquet(srcDir)
    runOnce()
    val got = spark.table("restart_out")
      .collect().map(r => r.getAs[java.time.LocalDateTime](0) -> r.getLong(1)).toMap
    val want = graft.operators.EventAnalytics.eventCountHourly(spark, sfDir)
      .collect().map(r => r.getAs[java.time.LocalDateTime](0) -> r.getLong(1)).toMap
    ev.unpersist()
    // restored window state + the new files must reproduce the full batch
    assert(got == want)
  }

  test("trend state machine matches the batch trending query on replayed events") {
    implicit val sc = spark.sqlContext
    val windowMicros = 10L * 60 * 1000 * 1000
    val events = Tables.events(spark, sfDir)
      .select(col("event_type").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
      .as[KeyedEvent]
      .collect().sortBy(_.tsMicros)
    val input = MemoryStream[KeyedEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = StreamingJobs.detectTrends(input.toDS(), windowMicros)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt) // R7: durable state checkpoint
      .format("memory").queryName("trend_out")
      .start()
    // replay in three ordered batches (the reference's per-minute queueStream)
    events.grouped(math.max(1, events.length / 3 + 1)).foreach { batch =>
      input.addData(batch.toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("trend_out")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    val want = EventAnalytics.trendingArrivals(spark, sfDir).collect().map { r =>
      val winMicros = r.getAs[java.time.LocalDateTime]("win_start")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000
      (r.getAs[String]("event_type"), winMicros) ->
        (r.getAs[Long]("cur"), r.getAs[Long]("prev"), r.getAs[Boolean]("is_trending"))
    }.toMap
    // streaming emits a window only when it closes: every key's last window
    // is still open, so streaming = batch minus one trailing window per key
    val keys = want.keys.map(_._1).toSet
    assert(got.size == want.size - keys.size,
      s"got ${got.size}, want ${want.size} minus ${keys.size} open windows")
    got.foreach { case (k, v) =>
      assert(want.contains(k), s"unexpected window $k")
      assert(want(k) == v, s"window $k: streaming $v vs batch ${want(k)}")
    }
  }

  test("trend machine with allowed lateness folds out-of-order events (vs batch)") {
    implicit val sc = spark.sqlContext
    val W = 600L * 1000 * 1000 // 10-minute windows in micros
    val rng = new scala.util.Random(4242)
    // synthetic corpus: 3 keys × 14 windows, some windows empty (gaps),
    // counts chosen so several trending flags fire at minCount = 3
    val events = (for {
      key <- Seq("a", "b", "c")
      win <- 0 until 14 if (win + key.hashCode) % 5 != 0 // leave gaps
      n = 1 + math.abs((win * 7 + key.hashCode) % 6)
      i <- 0 until n
    } yield KeyedEvent(key, win * W + (i * W / 17) % W)).toArray
    // bounded disorder: sort by ts + jitter, |jitter| < W/2 ⇒ every event
    // arrives before any event two windows ahead — inside the one-window
    // lateness horizon, so NOTHING may drop
    val shuffled = events.sortBy(e => e.tsMicros + rng.nextLong(W) - W / 2)
    def run(name: String, evs: Seq[KeyedEvent]): Map[(String, Long), (Long, Long, Boolean)] = {
      val input = MemoryStream[KeyedEvent]
      val q = StreamingJobs.detectTrends(input.toDS(), W, minCount = 3L,
        allowedLatenessWindows = 1)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      evs.grouped(math.max(1, evs.length / 5 + 1)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    }
    val gotShuffled = run("late_trend_shuffled", shuffled.toSeq)
    val gotOrdered = run("late_trend_ordered", events.sortBy(_.tsMicros).toSeq)
    // batch truth with full late folds
    val counts = events.groupBy(e => (e.key, e.tsMicros - e.tsMicros % W))
      .map { case (k, es) => k -> es.length.toLong }
    val want = counts.map { case ((k, w), cur) =>
      val prev = counts.getOrElse((k, w - W), 0L)
      (k, w) -> (cur, prev, cur >= 2 * prev && cur >= 3L)
    }
    // a finite stream holds the last TWO populated windows per key in
    // state (open + lateness buffer) — everything else must have emitted
    val held = counts.keys.groupBy(_._1).values.flatMap(_.toSeq.sortBy(-_._2).take(2)).toSet
    val expected = want.filter { case (k, _) => !held(k) }
    assert(expected.nonEmpty && expected.exists(_._2._3), "test corpus too small")
    assert(gotShuffled == expected,
      s"shuffled run diverged: missing=${expected.keySet -- gotShuffled.keySet} " +
        s"extra=${gotShuffled.keySet -- expected.keySet} " +
        s"wrong=${gotShuffled.filter(kv => expected.get(kv._1).exists(_ != kv._2))}")
    assert(gotOrdered == expected, "in-order run with lateness diverged from batch")
  }

  test("timeout flush finalizes trailing windows without a successor event (R4)") {
    implicit val sc = spark.sqlContext
    val W = 600L * 1000 * 1000 // 10-minute windows in micros
    val input = MemoryStream[KeyedEvent]
    val q = StreamingJobs.detectTrends(input.toDS(), W, minCount = 3L,
      allowedLatenessWindows = 1, timeoutFlush = true)
      .writeStream.outputMode("append").format("memory").queryName("flush_out")
      .start()
    // window-aligned base well past epoch: the INITIAL watermark is 0,
    // and Spark's late-record filter drops eventTime ≤ watermark, so an
    // epoch-0 event would silently vanish (real data is 2024-dated)
    val base = 2000000L * W
    // key "a": 4 events in window 0, 3 in window 1 — then silence forever
    input.addData((0 until 4).map(i => KeyedEvent("a", base + i * 1000L)) ++
      (0 until 3).map(i => KeyedEvent("a", base + W + i * 1000L)))
    q.processAllAvailable()
    assert(spark.table("flush_out").isEmpty,
      "both windows still open/buffered — nothing may emit yet")
    // an unrelated key advances the event-time watermark (which lags by
    // the 2-window lateness delay): first batch records the new max,
    // the next batch fires a's timeout — no successor "a" event ever
    input.addData(Seq(KeyedEvent("z", base + 10 * W))); q.processAllAvailable()
    input.addData(Seq(KeyedEvent("z", base + 11 * W))); q.processAllAvailable()
    q.stop()
    val got = spark.table("flush_out").collect()
      .filter(_.getString(0) == "a")
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    // w0: cur=4 prev=0 → trending; w1: cur=3 prev=4 (resolved from the
    // buffer at flush time) → not trending
    assert(got == Map(base -> (4L, 0L, true), (base + W) -> (3L, 4L, false)),
      got.toString)
  }

  test("watermark drops under cross-key skew are surfaced, not silent (R4)") {
    // the flush variant's watermark is GLOBAL: a key lagging more than
    // the 2-window lateness delay behind the hottest key has its events
    // dropped by Spark's pre-stateful filter. The registered late-replay
    // query requires numRowsDroppedByWatermark == 0; this test engineers
    // a violation and asserts the metric actually reports it — i.e. a
    // skew-induced parity break is attributable, never silent.
    implicit val sc = spark.sqlContext
    val W = 600L * 1000 * 1000
    val base = 2000000L * W // past-epoch alignment, see flush test above
    val input = MemoryStream[KeyedEvent]
    val q = StreamingJobs.detectTrends(input.toDS(), W, minCount = 3L,
      allowedLatenessWindows = 1, timeoutFlush = true)
      .writeStream.outputMode("append").format("memory").queryName("skew_out")
      .start()
    // hot key races 10 windows ahead; two batches so the watermark
    // (batch max − 2W) actually advances past the laggard
    input.addData(Seq(KeyedEvent("hot", base + 10 * W))); q.processAllAvailable()
    input.addData(Seq(KeyedEvent("hot", base + 11 * W))); q.processAllAvailable()
    // laggard arrives 1 window into the stream — far below the watermark
    input.addData(Seq(KeyedEvent("lag", base + W))); q.processAllAvailable()
    val dropped = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    q.stop()
    assert(dropped >= 1L,
      "engineered cross-key skew produced no numRowsDroppedByWatermark " +
        "signal — the parity guard in trendingArrivalsLate would be blind")
    assert(!spark.table("skew_out").collect().exists(_.getString(0) == "lag"),
      "laggard emitted despite being beyond the watermark")
  }

  test("in-order and late-replay behavior is unchanged by the flush flag (R4)") {
    implicit val sc = spark.sqlContext
    val W = 600L * 1000 * 1000
    val base = 2000000L * W // past-epoch alignment, see flush test above
    val events = (for {
      key <- Seq("a", "b"); win <- 0 until 6
      i <- 0 until (1 + (win + key.hashCode.abs) % 4)
    } yield KeyedEvent(key, base + win * W + i * 1000L)).sortBy(_.tsMicros)
    def run(name: String, flush: Boolean): Set[(String, Long, Long, Long, Boolean)] = {
      val input = MemoryStream[KeyedEvent]
      val q = StreamingJobs.detectTrends(input.toDS(), W, minCount = 3L,
        allowedLatenessWindows = 1, timeoutFlush = flush)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      events.grouped(5).foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toSet
    }
    val without = run("flush_off", flush = false)
    val withFlush = run("flush_on", flush = true)
    // mid-stream emissions agree; the flush variant may only ADD final
    // windows the timeout closed (here: none fire — the stream ends
    // before the watermark passes any horizon)
    assert(without.subsetOf(withFlush),
      s"flush variant lost windows: ${without -- withFlush}")
    assert((withFlush -- without).forall { case (_, w, _, _, _) =>
      w >= events.map(e => e.tsMicros - e.tsMicros % W).max - W
    }, "flush added a non-trailing window")
  }

  test("streaming dedup keeps exactly the batch dedup representatives") {
    implicit val sc = spark.sqlContext
    // documents arriving in doc_id order, one synthetic second apart —
    // first arrival per signature == min doc_id per signature
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().sortBy(_.getLong(0))
      .map(r => TimedDoc(r.getLong(0), r.getString(1),
        new java.sql.Timestamp(1700000000000L + r.getLong(0) * 1000)))
    val input = MemoryStream[TimedDoc]
    val q = graft.streaming.StreamingJobs.dedupStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream_out")
      .start()
    // two batches to cross a micro-batch boundary mid-stream
    val (b1, b2) = docs.splitAt(docs.length / 2)
    input.addData(b1.toSeq); q.processAllAvailable()
    input.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_stream_out").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val want = graft.operators.Dedup.dedupExact(spark, sfDir).collect()
      .map(_.getAs[Long]("rep_doc_id")).toSet
    assert(kept == want,
      s"stream-kept ${kept.size} docs vs batch reps ${want.size}; " +
        s"diff=${(kept diff want) ++ (want diff kept)}")
  }

  test("streaming session_window: watermark-closed sessions equal the batch sessions") {
    // the built-in session-window operator in STREAMING mode (merging
    // keyed state as events arrive, append-mode finalization when the
    // watermark passes a session's end) — the production form of the
    // batch user_sessions query. Parity statement: the streamed output
    // is exactly the batch session set whose end the final watermark
    // passed; trailing sessions stay in state (the documented append-
    // mode contract, flushed by later batches in a live pipeline).
    val delayMin = 2L
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"$delayMin minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // the file source wants a directory: stream the sf dir with a glob
    // pinned to the events file (the taxi pathGlobFilter play)
    val q = sessions(spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir))
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Long]("n_events"))
    val got = spark.table("sess_stream").collect().map(key).toSet
    assert(got.nonEmpty, "no sessions emitted — watermark never advanced")
    // final watermark after the single file batch = max(ts) − delay
    val maxTs = raw.agg(max(col("ts").cast("timestamp"))).head().getTimestamp(0)
    val wm = new java.sql.Timestamp(maxTs.getTime - delayMin * 60 * 1000)
    val batch = sessions(raw).collect().map(key)
    val want = batch.filter(_._3.compareTo(wm) < 0).toSet
    assert(got == want,
      s"stream ${got.size} vs batch-closed ${want.size} sessions; " +
        s"batch total ${batch.length}")
  }

  test("chunked multi-batch session drain equals the single-batch drain " +
       "(chunking invariance through real watermark advancement)") {
    // the registered multi-batch leg: time-ordered chunk files admitted
    // maxFilesPerTrigger at a time, so sessions merge in keyed state
    // across micro-batches and the watermark advances batch-by-batch —
    // the closed-session set must be byte-identical to the single-batch
    // drain's (the sf1 leg of the same statement is StreamScaleProf)
    val chunked = graft.operators.EventAnalytics
      .userSessionsStreamChunked(spark, sfDir).collect().toSeq
    val single = graft.operators.EventAnalytics
      .userSessionsStream(spark, sfDir).collect().toSeq
    assert(chunked.nonEmpty, "no sessions emitted from the chunked drain")
    assert(chunked.map(_.toString) == single.map(_.toString),
      s"chunked ${chunked.size} vs single-batch ${single.size} sessions")
  }

  test("chunked multi-batch anomaly drain equals the driver-fed replay " +
       "(ring state carries across real micro-batch boundaries)") {
    // the registered multi-batch leg of the flatMapGroupsWithState
    // anomaly ring: the sentinel flush rides the last chunk file and the
    // engine feeds every batch — output must be byte-identical to the
    // MemoryStream replay (same machine, driver-fed)
    val chunked = graft.operators.EventAnalytics
      .eventsAnomalyStreamChunked(spark, sfDir).collect().toSeq
    val replay = graft.operators.EventAnalytics
      .eventsAnomalyStream(spark, sfDir).collect().toSeq
    assert(chunked.nonEmpty, "no windows emitted from the chunked drain")
    assert(chunked.map(_.toString) == replay.map(_.toString),
      s"chunked ${chunked.size} vs replay ${replay.size} windows")
  }

  test("streaming first-touch equals batch and holds O(keys) state") {
    val batch = EventAnalytics.firstTouch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.get(3))).toSet
    val stream = EventAnalytics.firstTouchStream(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.get(3))).toSet
    assert(stream == batch,
      "StreamingDeduplicate drain diverged from the batch first-touch")
    // the scale contract: dedup state holds one row per DISTINCT key —
    // users x event types — not one per event fed
    val fed = graft.Tables.events(spark, sfDir).count()
    val progress = EventAnalytics.lastFirstTouchProgress
      .getOrElse(fail("no progress captured"))
    val stateRows = progress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows == batch.size.toLong,
      s"dedup state holds $stateRows rows, expected one per key (${batch.size})")
    assert(stateRows < fed / 2,
      s"state ($stateRows) is not small vs rows fed ($fed) - O(keys) claim broken")
  }

  test("conversion funnel: steps shrink and chains verify against a brute replay") {
    val steps = EventAnalytics.conversionFunnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(steps.keySet == Set("1_view", "2_click", "3_purchase"))
    val n1 = steps("1_view")._1
    val n2 = steps("2_click")._1
    val n3 = steps("3_purchase")._1
    assert(n1 >= n2 && n2 >= n3, s"funnel must shrink: $n1 -> $n2 -> $n3")
    assert(steps("1_view")._2 == 0L)
    // brute per-user replay of the chain semantics
    val W = EventAnalytics.funnelWindowSec * 1000000L
    val byUser = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "unix_micros(cast(ts as timestamp)) as m")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    var (c2, c3, lag2, lag3) = (0L, 0L, 0L, 0L)
    byUser.foreach { case (_, evs) =>
      val views = evs.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        val t1 = views.min
        val clicks = evs.filter(e => e._2 == "click" && e._3 > t1 && e._3 <= t1 + W).map(_._3)
        if (clicks.nonEmpty) {
          val t2 = clicks.min
          c2 += 1; lag2 += t2 - t1
          val buys = evs.filter(e => e._2 == "purchase" && e._3 > t2 && e._3 <= t2 + W).map(_._3)
          if (buys.nonEmpty) { c3 += 1; lag3 += buys.min - t2 }
        }
      }
    }
    assert(n1 == byUser.count(_._2.exists(_._2 == "view")).toLong)
    assert((n2, steps("2_click")._2) == ((c2, lag2)))
    assert((n3, steps("3_purchase")._2) == ((c3, lag3)))
  }

  test("pivot and set ops agree with direct recounts") {
    // pivot: every (day, type) cell equals the filtered count; row sums
    // conserve the corpus
    val pivoted = EventAnalytics.eventsPivot(spark, sfDir)
    val types = EventAnalytics.eventTypes
    val cells = pivoted.collect()
    val total = Tables.events(spark, sfDir).count()
    assert(cells.map(r => types.indices.map(i => r.getLong(i + 1)).sum).sum == total,
      "pivoted cells must conserve every event")
    // set ops: intersect + except partition the buyer set
    val rows = EventAnalytics.userSetOps(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val buyers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val errorers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val both = rows.filter(_._1 == "purchase_and_error").map(_._2).toSet
    val pure = rows.filter(_._1 == "purchase_no_error").map(_._2).toSet
    assert(both == (buyers intersect errorers))
    assert(pure == (buyers diff errorers))
    assert((both ++ pure) == buyers && (both intersect pure).isEmpty,
      "segments must partition the buyer set")
  }

  test("unpivot inverts the pivot (reshape round trip)") {
    val pivoted = EventAnalytics.eventsPivot(spark, sfDir)
    val back = pivoted.unpivot(
      Array(col("day")),
      EventAnalytics.eventTypes.map(col).toArray,
      "event_type", "cnt")
      .filter(col("cnt") > 0)
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val want = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type")).count()
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(back == want, "unpivot(pivot(x)) must reproduce the long form")
  }

  test("retention cohorts: offset 0 is 1.0 and cohorts partition the user base") {
    val rows = EventAnalytics.retentionCohorts(spark, sfDir).collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, n, size, ret) =>
      assert(off >= 0 && n <= size, "a cohort can never grow past its size")
      assert(ret == n.toDouble / size && ret > 0.0 && ret <= 1.0)
    }
    val atZero = rows.filter(_._2 == 0L)
    assert(atZero.forall(_._5 == 1.0), "offset 0 must be full retention")
    // cohort sizes partition the distinct user base exactly
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(atZero.map(_._4).sum == users,
      "cohort sizes must sum to the distinct user count")
  }

  test("mid-stream kill + RocksDB/changelog restart resumes exactly-once " +
      "(the last stateful-matrix cell: R7 under the production provider)") {
    // the existing R7 test restarts between COMPLETED AvailableNow runs
    // under the default provider; the production failure is a process
    // dying mid-stream with RocksDB + changelog checkpointing holding
    // the state. One run: a windowed append-mode aggregate fed one chunk
    // file per micro-batch is KILLED after >= 2 committed batches, then
    // a new query resumes from the same checkpoint — the union of
    // emissions must equal an uninterrupted run's, with no window
    // emitted twice. The sink is the exactly-once recipe: foreachBatch
    // writing batch=<id> dirs idempotently (a re-run of the in-flight
    // batch overwrites identical content, committed batches never
    // re-run).
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val clKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevProv = spark.conf.getOption(provKey)
    val prevCl = spark.conf.getOption(clKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider")
    spark.conf.set(clKey, "true")
    val tmp = java.nio.file.Files.createTempDirectory("graft-killrestart")
    try {
      // 12 time-ordered single-file chunks (ascending mtimes), one per
      // trigger — enough batches that the kill reliably lands mid-stream
      val ev = Tables.events(spark, sfDir)
        .select(col("event_type"), col("ts").cast("timestamp").as("ts"))
      val nChunks = 12
      val bounds = ev.select(col("ts").cast("double").as("t"))
        .stat.approxQuantile("t",
          (1 until nChunks).map(_.toDouble / nChunks).toArray, 0.001)
      val cuts = Array(Double.NegativeInfinity) ++ bounds :+ Double.PositiveInfinity
      val srcDir = tmp.resolve("chunks")
      java.nio.file.Files.createDirectories(srcDir)
      for (i <- 0 until nChunks) {
        val stage = tmp.resolve("stage")
        ev.filter(col("ts").cast("double") >= cuts(i) &&
            col("ts").cast("double") < cuts(i + 1))
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = graft.sources.FileSinkFs.list(stage, "part-").head
        val dest = srcDir.resolve(f"chunk_$i%03d.parquet")
        java.nio.file.Files.move(part, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 10000L))
      }
      def agg = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
        .withWatermark("ts", "2 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("win_start"), col("event_type"), col("cnt"))
      def sinkTo(out: java.nio.file.Path)(df: org.apache.spark.sql.DataFrame,
          id: Long): Unit =
        df.write.mode("overwrite").parquet(out.resolve(s"batch=$id").toString): Unit
      def readOut(out: java.nio.file.Path): Set[(String, String, Long)] =
        spark.read.option("basePath", out.toString)
          .parquet(out.toString).select("win_start", "event_type", "cnt")
          .collect()
          .map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

      // reference: the same query, uninterrupted
      val refOut = tmp.resolve("ref_out"); val refCk = tmp.resolve("ref_ck")
      java.nio.file.Files.createDirectories(refOut)
      val refQ = agg.writeStream.outputMode("append")
        .option("checkpointLocation", refCk.toString)
        .foreachBatch(sinkTo(refOut) _)
        .trigger(Trigger.AvailableNow()).start()
      refQ.awaitTermination(180000); refQ.stop()
      val want = readOut(refOut)
      assert(want.nonEmpty, "reference run emitted nothing — vacuous")

      // the kill run: ProcessingTime cadence, stopped after >= 2
      // committed batches — between (or inside) micro-batches, not at a
      // clean AvailableNow finish line
      val out = tmp.resolve("out"); val ck = tmp.resolve("ck")
      java.nio.file.Files.createDirectories(out)
      val q1 = agg.writeStream.outputMode("append")
        .option("checkpointLocation", ck.toString)
        .foreachBatch(sinkTo(out) _)
        .trigger(Trigger.ProcessingTime("1 second")).start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
             System.nanoTime() < deadline) Thread.sleep(50)
      val committedBeforeKill = q1.recentProgress.count(_.numInputRows > 0)
      q1.stop() // the kill
      assert(committedBeforeKill >= 2,
        s"kill landed after only $committedBeforeKill data batches — too early to mean anything")
      assert(committedBeforeKill < nChunks,
        "the run drained before the kill — raise the chunk count")

      // resume from the same checkpoint with a NEW query
      val q2 = agg.writeStream.outputMode("append")
        .option("checkpointLocation", ck.toString)
        .foreachBatch(sinkTo(out) _)
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination(180000)
      val resumed = q2.recentProgress.filter(_.numInputRows > 0)
      // provider evidence: the resumed run must actually be on RocksDB
      val rocksSeen = q2.recentProgress.flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
        .exists(_.toLowerCase.contains("rocksdb"))
      q2.stop()
      assert(rocksSeen,
        "resumed run shows no rocksdb state-store metrics — provider did not take")
      assert(resumed.nonEmpty, "restart processed nothing — the kill test is vacuous")
      // resume continued the batch sequence (state restored from the
      // RocksDB checkpoint, not recomputed from batch 0)
      assert(resumed.map(_.batchId).min >= 1,
        s"restart began at batch ${resumed.map(_.batchId).min} — it replayed from scratch")

      val got = readOut(out)
      assert(got == want,
        s"kill+restart diverged from the uninterrupted run: " +
          s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      // exactly-once: no (window, type) emitted twice across the union
      val keys = spark.read.option("basePath", out.toString)
        .parquet(out.toString).select("win_start", "event_type").collect()
        .map(r => (r.get(0).toString, r.getString(1)))
      assert(keys.length == keys.distinct.length,
        "a window emitted twice across the kill/restart boundary")
    } finally {
      prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
      prevCl.fold(spark.conf.unset(clKey))(spark.conf.set(clKey, _))
      graft.sources.FileSinkFs.deleteRecursively(tmp)
    }
  }

  test("checkpoint compatibility contract: a shuffle-partitions change " +
      "across restart is silently pinned to the checkpoint; a state-schema " +
      "change fails loudly and actionably (the two classic SS ops traps)") {
    // r14 (r13 verdict item 7). The stateful matrix proves restarts
    // RESUME correctly; this pins what happens when the restart is
    // MISCONFIGURED — the two changes an operator is most likely to make
    // across a deploy:
    //  1. spark.sql.shuffle.partitions: Structured Streaming pins the
    //     state partition count at checkpoint creation (state files are
    //     keyed by partition id — repartitioning them would need a state
    //     rebuild). A changed session conf is SILENTLY IGNORED by the
    //     stateful operator: the restart succeeds and keeps running at
    //     the checkpointed width. Evidence: StateOperatorProgress
    //     .numShufflePartitions, asserted unchanged while the session
    //     conf reads the new value. Operationally this means scaling a
    //     stateful job's parallelism requires a NEW checkpoint (or the
    //     state rebalancing tooling), not a conf bump — exactly the trap
    //     a loud pin here documents.
    //  2. state SCHEMA: widening the aggregation (count → count+sum)
    //     changes the state row layout; the checkpoint's schema file
    //     must make the restart fail LOUDLY naming the incompatibility,
    //     never deserialize old bytes into the new layout.
    val tmp = java.nio.file.Files.createTempDirectory("graft-statecompat")
    val shufKey = "spark.sql.shuffle.partitions"
    val prevShuf = spark.conf.get(shufKey)
    try {
      val ev = Tables.events(spark, sfDir)
        .select(col("event_type"), col("ts").cast("timestamp").as("ts"),
          col("value"))
      val nChunks = 4
      val bounds = ev.select(col("ts").cast("double").as("t"))
        .stat.approxQuantile("t",
          (1 until nChunks).map(_.toDouble / nChunks).toArray, 0.001)
      val cuts = Array(Double.NegativeInfinity) ++ bounds :+ Double.PositiveInfinity
      val srcDir = tmp.resolve("chunks")
      java.nio.file.Files.createDirectories(srcDir)
      def addChunk(i: Int): Unit = {
        val stage = tmp.resolve("stage")
        ev.filter(col("ts").cast("double") >= cuts(i) &&
            col("ts").cast("double") < cuts(i + 1))
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = graft.sources.FileSinkFs.list(stage, "part-").head
        val dest = srcDir.resolve(f"chunk_$i%03d.parquet")
        java.nio.file.Files.move(part, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 10000L))
      }
      def src = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
        .withWatermark("ts", "2 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      def aggCount = src.agg(count(lit(1)).as("cnt"))
      val ck = tmp.resolve("ck")
      val sink = tmp.resolve("out")
      java.nio.file.Files.createDirectories(sink)
      def run(df: org.apache.spark.sql.DataFrame) = {
        val q = df.writeStream.outputMode("append")
          .option("checkpointLocation", ck.toString)
          .foreachBatch {
            (b: org.apache.spark.sql.DataFrame, id: Long) =>
              b.write.mode("overwrite")
                .parquet(sink.resolve(s"batch=$id").toString): Unit
          }
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination(180000) finally q.stop()
        q
      }
      // phase 1: create the checkpoint at 8 shuffle partitions
      spark.conf.set(shufKey, "8")
      addChunk(0); addChunk(1)
      val q1 = run(aggCount)
      val w1 = q1.recentProgress.filter(_.numInputRows > 0)
        .flatMap(_.stateOperators.toSeq).map(_.numShufflePartitions).distinct
      assert(w1.toSeq == Seq(8L),
        s"phase-1 state width $w1 — the checkpoint was not created at 8")
      // phase 2: restart the same query at 13 — must succeed AND stay at 8
      spark.conf.set(shufKey, "13")
      addChunk(2); addChunk(3)
      val q2 = run(aggCount)
      val p2 = q2.recentProgress.filter(_.numInputRows > 0)
      assert(p2.nonEmpty, "restart processed no data — the pin is vacuous")
      val w2 = p2.flatMap(_.stateOperators.toSeq)
        .map(_.numShufflePartitions).distinct
      assert(w2.toSeq == Seq(8L),
        s"restart ran state at width $w2 — expected the checkpointed 8 " +
          "to silently override the session's 13 (the documented SS contract)")
      assert(spark.conf.get(shufKey) == "13",
        "sanity: the session conf itself must still read 13")
      // phase 3: widen the state schema — the restart must fail loudly,
      // naming the schema incompatibility, never misread old state bytes
      val moreData = tmp.resolve("more")
      java.nio.file.Files.createDirectories(moreData)
      val extra = srcDir.resolve("chunk_extra.parquet")
      java.nio.file.Files.copy(srcDir.resolve("chunk_003.parquet"), extra)
      java.nio.file.Files.setLastModifiedTime(extra,
        java.nio.file.attribute.FileTime.fromMillis(1600000000000L + 99 * 10000L))
      val widened = src.agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
      val e = intercept[Exception] { run(widened) }
      val messages = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(messages.toLowerCase.contains("schema"),
        s"state-schema break did not fail on schema compatibility — got: " +
          messages.take(400))
    } finally {
      spark.conf.set(shufKey, prevShuf)
      graft.sources.FileSinkFs.deleteRecursively(tmp)
    }
  }

  test("stateful matrix under the RocksDB state store: exact parity with " +
      "the default provider across all five stateful shapes") {
    // at 100 TB of keys the in-memory HDFS-backed store is the streaming
    // scale-killer: every executor holds its partitions' ENTIRE keyed
    // state on-heap. RocksDBStateStoreProvider spills state to local
    // disk with bounded memory — the production answer — and swapping it
    // in must change NOTHING about results. One run of each stateful
    // shape per provider: windowed agg, session windows, fMGWS trend
    // machine, symmetric-hash stream-stream join, streaming dedup.
    implicit val sc = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks = "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider"
    val prev = spark.conf.getOption(provKey)

    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val joinTmp = java.nio.file.Files.createTempDirectory("graft-rkj").toString
    raw.filter(col("event_type") === "purchase").write.parquet(s"$joinTmp/p")
    raw.filter(col("event_type") === "error").write.parquet(s"$joinTmp/e")
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().sortBy(_.getLong(0))
      .map(r => TimedDoc(r.getLong(0), r.getString(1),
        new java.sql.Timestamp(1700000000000L + r.getLong(0) * 1000)))
    val trendEvents = Tables.events(spark, sfDir)
      .select(col("event_type").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
      .as[KeyedEvent].collect().sortBy(_.tsMicros)

    var rocksMetricsSeen = false
    def runMatrix(tag: String): Map[String, Set[String]] = {
      def drain(df: org.apache.spark.sql.DataFrame, name: String,
          mode: String): Set[String] = {
        val q = df.writeStream.format("memory").queryName(name)
          .outputMode(mode).option("checkpointLocation",
            java.nio.file.Files.createTempDirectory(s"graft-$name").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(120000)
        spark.table(name).collect().map(_.toString).toSet
      }
      def evStream = spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      val out = Map.newBuilder[String, Set[String]]
      out += "windowed_agg" ->
        drain(StreamingJobs.hourlyCounts(evStream), s"rk_hourly_$tag", "complete")
      out += "sessions" -> drain(
        evStream.withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", "2 minutes")
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("w.start"), col("w.end"), col("n_events")),
        s"rk_sess_$tag", "append")
      out += "join" -> drain(
        StreamingJobs.streamIntervalJoin(
          spark.readStream.schema(raw.schema).parquet(s"$joinTmp/p"),
          spark.readStream.schema(raw.schema).parquet(s"$joinTmp/e")),
        s"rk_join_$tag", "append")
      // fMGWS + dedup replay through MemoryStream (two batches so state
      // genuinely persists across a micro-batch boundary)
      val trendIn = MemoryStream[KeyedEvent]
      val trendQ = StreamingJobs.detectTrends(trendIn.toDS(), 10L * 60 * 1000 * 1000)
        .writeStream.outputMode("append").option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"graft-rk-tr-$tag").toString)
        .format("memory").queryName(s"rk_trend_$tag").start()
      trendEvents.grouped(trendEvents.length / 2 + 1).foreach { b =>
        trendIn.addData(b.toSeq); trendQ.processAllAvailable()
      }
      // provider evidence: the rocks pass must actually run on RocksDB —
      // its state operator reports rocksdb-prefixed custom metrics
      val metrics = Option(trendQ.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
      if (metrics.exists(_.toLowerCase.contains("rocksdb"))) rocksMetricsSeen = true
      trendQ.stop()
      val trendOut = spark.table(s"rk_trend_$tag").collect().map(_.toString).toSet
      out += "fmgws_trends" -> trendOut
      val dedupIn = MemoryStream[TimedDoc]
      val dedupQ = StreamingJobs.dedupStream(dedupIn.toDF())
        .writeStream.outputMode("append").option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"graft-rk-dd-$tag").toString)
        .format("memory").queryName(s"rk_dedup_$tag").start()
      val (b1, b2) = docs.splitAt(docs.length / 2)
      dedupIn.addData(b1.toSeq); dedupQ.processAllAvailable()
      dedupIn.addData(b2.toSeq); dedupQ.processAllAvailable()
      dedupQ.stop()
      out += "dedup" -> spark.table(s"rk_dedup_$tag").collect().map(_.toString).toSet
      out.result()
    }

    val base = runMatrix("dflt")
    assert(!rocksMetricsSeen, "default pass must not run on RocksDB")
    spark.conf.set(provKey, rocks)
    // the production RocksDB shape includes changelog checkpointing
    // (append the batch's changelog instead of uploading full SST
    // snapshots — the checkpoint-latency answer once state is large);
    // it changes the checkpoint FORMAT only, so it rides the same
    // parity assertions
    val clKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val clPrev = spark.conf.getOption(clKey)
    spark.conf.set(clKey, "true")
    try {
      val rk = runMatrix("rocks")
      assert(rocksMetricsSeen,
        "RocksDB pass shows no rocksdb state-store metrics — provider swap did not take")
      base.foreach { case (leg, want) =>
        assert(want.nonEmpty, s"$leg produced no rows — the parity check is vacuous")
        assert(rk(leg) == want,
          s"$leg diverged under RocksDB: ${(rk(leg) diff want) ++ (want diff rk(leg))}")
      }
    } finally {
      prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
      clPrev.fold(spark.conf.unset(clKey))(spark.conf.set(clKey, _))
    }
  }
}
