package graft

import graft.operators.TaxiEvents
import graft.streaming.{KeyedEvent, StreamingJobs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Differential tests on the reference's own graded taxi dataset — the
  * distributed Column-expression pipeline vs an independent driver-side
  * parse of the same files (no goldens are published in-repo, so the
  * plain-Scala re-implementation is the truth source). */
class TaxiSpec extends GraftSpec {
  import spark.implicits._

  val taxiDir = "/root/reference/taxi-data"
  lazy val taxiFiles = new java.io.File(taxiDir).listFiles().sorted

  private def inBox(lon: Double, lat: Double, b: (Double, Double, Double, Double)) =
    lon > b._1 && lon < b._2 && lat > b._3 && lat < b._4

  /** Driver-side reference parse: (region, dropoff hour) counts. */
  private lazy val referenceCounts: Map[(String, String), Long] = {
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    taxiFiles.foreach { f =>
      scala.io.Source.fromFile(f).getLines().foreach { line =>
        val c = line.split(",", -1)
        try {
          val (lon, lat) =
            if (c(0) == "yellow") (c(10).toDouble, c(11).toDouble)
            else (c(8).toDouble, c(9).toDouble)
          val region =
            if (inBox(lon, lat, TaxiEvents.goldman)) "goldman"
            else if (inBox(lon, lat, TaxiEvents.citigroup)) "citigroup"
            else null
          if (region != null) {
            val hour = c(3).substring(0, 13) // yyyy-MM-dd HH
            counts((region, hour)) = counts.getOrElse((region, hour), 0L) + 1
          }
        } catch { case _: Exception => () }
      }
    }
    counts.toMap
  }

  test("distributed taxi pipeline matches the driver-side parse (full dataset)") {
    val got = TaxiEvents.regionHourly(spark, taxiDir)
      .select(col("region"),
        date_format(col("hour_start"), "yyyy-MM-dd HH").as("hour"), col("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt"))
      .toMap
    assert(got.nonEmpty, "no events landed in either bounding box")
    assert(got == referenceCounts,
      s"mismatch: spark=${got.toSeq.sorted.take(5)} ref=${referenceCounts.toSeq.sorted.take(5)}")
  }

  test("regionHourly's plan keeps split() out of every Filter (r14 shape)") {
    // The r14 agg-first rewrite holds only because Catalyst cannot push
    // the when(cnt > 0, ...) null-drop back through the aggregate — a
    // Spark-version-sensitive property (advisor, r15). If a future
    // optimizer rule learns to simplify the wrapper or infer cnt >= 1,
    // the filter lands back below the projection with its aliases
    // substituted, re-inlining ~16 split(value) copies per row into a
    // Filter — the captured plans/r14 before-plan's exact regression.
    // Benign residue that stays: Catalyst infers `ts IS NOT NULL` from
    // the post-agg w-null-drop and pushes ONE isnotnull(to_timestamp(
    // split(...)[3])) to the scan — a single split per row, present in
    // the optimized r14 shape too. The regression this guards is the
    // REGION dispatch (two bounding boxes × 4 comparisons, each
    // re-deriving lon/lat from split) landing in a Filter: that shape
    // carries many split copies per condition, so the pin is "no Filter
    // evaluates split() more than once, and no Filter contains the box
    // constants".
    val df = TaxiEvents.regionHourly(spark, taxiDir)
    df.write.format("noop").mode("overwrite").save()
    val filters = physicalNodes(df).collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(filters.nonEmpty, "expected the post-agg null-drop Filter")
    filters.foreach { f =>
      val cond = f.condition.toString
      val splits = "split\\(".r.findAllIn(cond).size
      assert(splits <= 1,
        s"region dispatch re-inlined into a Filter ($splits split copies): " +
          cond.take(200))
      assert(!cond.contains(TaxiEvents.goldman._1.toString),
        s"bounding-box constant in a Filter: ${cond.take(200)}")
    }
  }

  test("streaming file-source ingestion equals the batch query (R2 production shape)") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.get(1).toString, r.getAs[Long]("cnt"))).toSeq
    val batch = rows(TaxiEvents.regionHourly(spark, taxiDir))
    val stream = rows(TaxiEvents.regionHourlyStream(spark, taxiDir))
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"drained stream diverged: stream=${stream.take(3)} batch=${batch.take(3)}")
  }

  test("chunked replay (24 hourly micro-batches) equals the batch query") {
    // the multi-batch structure itself is asserted inside the operator
    // (require on progress metrics); here the final emission must equal
    // the batch result row-for-row — state carried across 24 sequential
    // micro-batch boundaries must lose nothing
    val got = TaxiEvents.regionHourlyStreamChunked(spark, taxiDir).collect()
      .map(r => (r.getString(0), r.get(1)) -> r.getLong(2)).toMap
    val want = TaxiEvents.regionHourly(spark, taxiDir).collect()
      .map(r => (r.getString(0), r.get(1)) -> r.getLong(2)).toMap
    assert(got == want, s"chunked drain diverged: ${got.size} vs ${want.size} rows")
  }

  test("compaction rewrite: per-bin file layout and row counts match the plan") {
    val out = java.nio.file.Files.createTempDirectory("graft-taxi-compact")
    try {
      val nBins = TaxiEvents.compactionRewrite(spark, taxiDir, out.toString)
      val plan = TaxiEvents.compactionPlan(spark, taxiDir).collect()
        .map(r => r.getAs[Long]("bin_id") -> r.getAs[Long]("n_rows")).toMap
      assert(plan.size.toLong == nBins)
      // one data file per planned bin (the rewrite's whole point), and
      // each bin directory holds exactly the planned row count
      plan.foreach { case (bin, nRows) =>
        val binDir = out.resolve(s"bin_id=$bin")
        val dataFiles = java.nio.file.Files.list(binDir).iterator()
        val names = new scala.collection.mutable.ArrayBuffer[String]
        while (dataFiles.hasNext) {
          val n = dataFiles.next().getFileName.toString
          if (!n.startsWith("_") && !n.startsWith(".")) names += n
        }
        assert(names.size == 1, s"bin $bin has files $names, expected 1")
        val gotRows = spark.read.text(binDir.toString).count()
        assert(gotRows == nRows, s"bin $bin: $gotRows rows vs plan $nRows")
      }
      // and the compacted layout answers the query identically
      val before = TaxiEvents.regionHourly(spark, taxiDir).collect().toSeq
      val after = TaxiEvents.parse(spark.read.text(out.toString))
        .groupBy(col("region"), window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("region"),
          col("w.start").cast("timestamp_ntz").as("hour_start"), col("cnt"))
        .orderBy("region", "hour_start").collect().toSeq
      assert(before == after)
    } finally graft.sources.FileSinkFs.deleteRecursively(out)
  }

  test("trend detector runs on the real stream (10-minute windows, ordered replay)") {
    implicit val sc = spark.sqlContext
    val windowMicros = 10L * 60 * 1000 * 1000
    val events = TaxiEvents.parse(spark.read.text(taxiDir))
      .select(col("region").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
      .as[KeyedEvent]
      .collect().sortBy(_.tsMicros)
    val input = MemoryStream[KeyedEvent]
    val q = StreamingJobs.detectTrends(input.toDS(), windowMicros)
      .writeStream.outputMode("append")
      .format("memory").queryName("taxi_trend_out")
      .start()
    input.addData(events.toSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("taxi_trend_out").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // batch truth: 10-minute bucket counts of the same parsed events
    val want = events.groupBy(e => (e.key, e.tsMicros - e.tsMicros % windowMicros))
      .map { case (k, es) => k -> es.length.toLong }
    val keys = want.keys.map(_._1).toSet
    // streaming emits every window except each key's final (still-open) one
    assert(got.size == want.size - keys.size,
      s"got ${got.size} closed windows, batch has ${want.size} (${keys.size} keys)")
    got.foreach { case (k, cur) =>
      assert(want.get(k).contains(cur), s"window $k: stream $cur vs batch ${want.get(k)}")
    }
  }
}
