package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State-store A/B profiler (PLANS.md round 11): the two heaviest
  * stateful shapes — session windows over every user and the hourly
  * windowed agg — drained once per provider (default HDFS-backed
  * in-memory vs RocksDB), reporting wall time and the state operator's
  * reported memory. The point at 100 TB: the default store holds every
  * partition's ENTIRE keyed state on-heap; RocksDB bounds memory by
  * spilling to local disk, and the price is per-batch get/put latency —
  * this measures that price at fixture scale.
  *
  *   sbt -batch "Test/runMain graft.StateStoreProf <dir> [runs]"
  */
object StateStoreProf extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val runs = if (args.length > 1) args(1).toInt else 3
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val provKey = "spark.sql.streaming.stateStore.providerClass"
  val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  val raw = spark.read.parquet(s"$dir/events.parquet")
  val schema = raw.schema
  def evStream = spark.readStream.schema(schema)
    .option("pathGlobFilter", "events.parquet").parquet(dir)

  def sessions = evStream
    .withColumn("ts", col("ts").cast("timestamp"))
    .withWatermark("ts", "2 minutes")
    .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
    .agg(count(lit(1)).as("n_events"))

  def hourly = graft.streaming.StreamingJobs.hourlyCounts(evStream)

  def once(name: String, df: => org.apache.spark.sql.DataFrame,
      mode: String): (Double, Long, Long) = {
    val t0 = System.nanoTime()
    val q = df.writeStream.format("memory")
      .queryName(name + System.nanoTime())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ssp-$name").toString)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val wall = (System.nanoTime() - t0) / 1e9
    val so = q.lastProgress.stateOperators.headOption
    val rows = so.map(_.numRowsTotal).getOrElse(-1L)
    val mem = so.map(_.memoryUsedBytes).getOrElse(-1L)
    q.stop()
    (wall, rows, mem)
  }

  Seq("default" -> (() => spark.conf.unset(provKey)),
      "rocksdb" -> (() => spark.conf.set(provKey, rocks))).foreach {
    case (label, setProv) =>
      setProv()
      Seq(("sessions", () => sessions, "append"),
          ("hourly", () => hourly, "complete")).foreach { case (leg, mk, mode) =>
        val rs = (1 to runs).map(_ => once(s"${label}_$leg", mk(), mode))
        val best = rs.map(_._1).min
        println(f"$label%-8s $leg%-9s best=$best%.2fs " +
          f"all=${rs.map(r => f"${r._1}%.2f").mkString(",")} " +
          f"stateRows=${rs.head._2} stateMemMB=${rs.head._3 / 1024.0 / 1024.0}%.1f")
      }
  }
  spark.stop()
}
