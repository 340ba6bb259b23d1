package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State-store A/B profiler (PLANS.md rounds 11-12): the two heaviest
  * stateful shapes — session windows over every user and the hourly
  * windowed agg — drained once per provider (default HDFS-backed
  * in-memory vs RocksDB), reporting wall time, the state operator's
  * reported memory, AND cross-provider result parity. The point at
  * 100 TB: the default store holds every partition's ENTIRE keyed state
  * on-heap; RocksDB bounds memory by spilling to local disk, and the
  * price is per-batch get/put latency — this measures that price.
  *
  * r12 (verdict item 3): takes a comma-separated dir list so the
  * memory/wall numbers form a CURVE over state size (sf0.1 → sf1 is
  * ~10× the keyed state: stateRows is the measured key count), instead
  * of the single fixture point the r11 "flip when state stops fitting"
  * rule extrapolated from; and the provider parity that StreamingSpec
  * pins at fixture scale is re-checked here at every scale point.
  *
  *   sbt -batch "Test/runMain graft.StateStoreProf <dir>[,<dir>...] [runs]"
  */
object StateStoreProf extends App {
  val dirs = args.headOption.getOrElse("/root/testdata/sf0.1").split(',').toSeq
  val runs = if (args.length > 1) args(1).toInt else 3
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val provKey = "spark.sql.streaming.stateStore.providerClass"
  val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def evStream(dir: String) = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
  }

  def sessions(dir: String) = evStream(dir)
    .withColumn("ts", col("ts").cast("timestamp"))
    .withWatermark("ts", "2 minutes")
    .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
    .agg(count(lit(1)).as("n_events"))

  def hourly(dir: String) = graft.streaming.StreamingJobs.hourlyCounts(evStream(dir))

  /** One drain: (wall, stateRows, stateMemBytes, canonicalized result). */
  def once(name: String, df: => org.apache.spark.sql.DataFrame,
      mode: String): (Double, Long, Long, Set[String]) = {
    val t0 = System.nanoTime()
    val qn = name + System.nanoTime()
    val q = df.writeStream.format("memory")
      .queryName(qn)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ssp-$name").toString)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(600000)
    val wall = (System.nanoTime() - t0) / 1e9
    val so = q.lastProgress.stateOperators.headOption
    val rows = so.map(_.numRowsTotal).getOrElse(-1L)
    val mem = so.map(_.memoryUsedBytes).getOrElse(-1L)
    val result = spark.table(qn).collect()
      .map(r => r.toSeq.map(String.valueOf).mkString("|")).toSet
    q.stop()
    spark.catalog.dropTempView(qn)
    (wall, rows, mem, result)
  }

  dirs.foreach { dir =>
    val results = scala.collection.mutable.Map.empty[(String, String), Set[String]]
    Seq("default" -> (() => spark.conf.unset(provKey)),
        "rocksdb" -> (() => spark.conf.set(provKey, rocks))).foreach {
      case (label, setProv) =>
        setProv()
        Seq(("sessions", () => sessions(dir), "append"),
            ("hourly", () => hourly(dir), "complete")).foreach { case (leg, mk, mode) =>
          val rs = (1 to runs).map(_ => once(s"${label}_$leg", mk(), mode))
          results((label, leg)) = rs.head._4
          val best = rs.map(_._1).min
          println(f"${new java.io.File(dir).getName}%-8s $label%-8s $leg%-9s " +
            f"best=$best%.2fs all=${rs.map(r => f"${r._1}%.2f").mkString(",")} " +
            f"stateRows=${rs.head._2} stateMemMB=${rs.head._3 / 1024.0 / 1024.0}%.1f " +
            f"resultRows=${rs.head._4.size}")
        }
    }
    // cross-provider parity at THIS scale point — the pin StreamingSpec
    // holds at fixture scale, re-checked where the state is 10-100x
    Seq("sessions", "hourly").foreach { leg =>
      val same = results(("default", leg)) == results(("rocksdb", leg))
      println(s"${new java.io.File(dir).getName} parity[$leg]=" +
        (if (same) "EXACT" else "BROKEN"))
      if (!same) sys.exit(1)
    }
  }
  spark.stop()
}
