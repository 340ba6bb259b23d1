package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The streaming half of the scale thesis, measured (r7 verdict #7):
  * drive the REGISTERED session-window aggregate (user_sessions_stream's
  * exact plan) from a file source over the sf1 events table with
  * bounded per-trigger admission, and record per-batch wall clock and
  * state-store size from the engine's own progress metrics.
  *
  * Fixture: the 1M-row sf1 events table split into N time-ordered chunk
  * files (mtimes spaced so FileStreamSource admits them oldest-first);
  * `maxFilesPerTrigger` bounds each micro-batch, so the run exercises
  * real incremental state growth + watermark advance across batches —
  * not the single-file drain the registered replay uses. Parity gate:
  * the chunked drain's watermark-closed session set must equal the
  * single-batch registered query's on the same data (chunking
  * invariance at sf1 — StreamingSpec:200 pins it for the MV at toy
  * scale; this is the at-scale leg).
  *
  * Run: sbt -batch "Test/runMain graft.StreamScaleProf [sfDir] [chunks] [perTrigger]"
  */
object StreamScaleProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graftscale/sf1")
    val chunks = if (args.length > 1) args(1).toInt else 32
    val perTrigger = if (args.length > 2) args(2).toInt else 4
    val work = "/tmp/streamscale"

    val spark = GraftSession.baseBuilder("32")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- fixture: time-ordered chunk files with increasing mtimes ----
    val chunkDir = java.nio.file.Paths.get(work, "chunks")
    graft.sources.FileSinkFs.deleteRecursively(java.nio.file.Paths.get(work))
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val n = raw.count()
    val bounds = raw.select(col("ts").cast("timestamp").cast("long").as("t"))
      .stat.approxQuantile("t", (1 to (chunks - 1)).map(_.toDouble / chunks).toArray, 0.001)
    val cuts = (Array(Long.MinValue.toDouble) ++ bounds :+ Long.MaxValue.toDouble)
    var written = 0L
    for (i <- 0 until chunks) {
      val slice = raw.filter(col("ts").cast("timestamp").cast("long") >= cuts(i) &&
        col("ts").cast("timestamp").cast("long") < cuts(i + 1))
      val tmp = s"$work/tmp_chunk"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = graft.sources.FileSinkFs
        .list(java.nio.file.Paths.get(tmp), "part-").head
      java.nio.file.Files.createDirectories(chunkDir)
      val dest = chunkDir.resolve(f"chunk_$i%03d.parquet")
      java.nio.file.Files.move(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
      written += slice.count()
    }
    require(written == n, s"chunking lost rows: $written != $n")
    println(s"[prof] fixture: $n rows in $chunks time-ordered chunks")

    // ---- the registered plan, chunk-fed --------------------------------
    val sinkName = "stream_scale_sink"
    spark.catalog.dropTempView(sinkName)
    val t0 = System.nanoTime()
    val q = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", perTrigger)
      .parquet(chunkDir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"${graft.operators.EventAnalytics.sessionWmDelayMin} minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    q.stop()

    println(f"[prof] total drain ${wallSec}%.2f s over ${progress.size} triggers")
    println("[prof] batch  rows_in  batch_s  state_rows  state_mem_mb  wm")
    progress.foreach { p =>
      val st = p.stateOperators.headOption
      val dur = p.durationMs.getOrDefault("triggerExecution", 0L).longValue.toDouble / 1000
      println(f"[prof] ${p.batchId}%5d ${p.numInputRows}%8d ${dur}%8.2f " +
        f"${st.map(_.numRowsTotal).getOrElse(0L)}%10d " +
        f"${st.map(_.memoryUsedBytes).getOrElse(0L).toDouble / 1048576}%12.1f " +
        s"${Option(p.eventTime.get("watermark")).getOrElse("-")}")
    }

    // ---- parity: chunked drain == the registered single-batch query ----
    val chunked: DataFrame = spark.table(sinkName)
      .select(col("user_id"), col("w.start").cast("timestamp_ntz").as("session_start"),
        col("w.end").cast("timestamp_ntz").as("session_end"), col("n_events"))
    val single = graft.operators.EventAnalytics.userSessionsStream(spark, sfDir)
    val cCnt = chunked.count(); val sCnt = single.count()
    val diff = chunked.exceptAll(single).count() + single.exceptAll(chunked).count()
    println(s"[prof] parity: chunked=$cCnt single-batch=$sCnt symmetric-diff=$diff")
    require(diff == 0, "chunked drain diverged from the registered single-batch result")
    println("[prof] PASS chunking-invariant at sf1")
    spark.stop()
  }
}
