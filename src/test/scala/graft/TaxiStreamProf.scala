package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import scala.jdk.CollectionConverters._

/** Where does taxi_region_hourly_stream's wall clock go? (r15 verdict
  * item 2: the entry is the most expensive timed query at ~4.7-5.75 s
  * while its batch twin runs ~0.9 s, and its 8-core ratio says the cost
  * is per-batch overhead, not data.) Drains the registered stream shape
  * N times and prints the engine's own durationMs breakdown per batch
  * (latestOffset = listing, addBatch = execution, walCommit/commitOffsets
  * = checkpoint I/O) plus the wall-clock segments around the engine:
  * start-to-first-progress (query planning + source init) and
  * awaitTermination-to-return.
  *
  *   sbt -batch "Test/runMain graft.TaxiStreamProf [runs]"
  */
object TaxiStreamProf extends App {
  val runs = args.headOption.map(_.toInt).getOrElse(3)
  val listThreshold = if (args.length > 1) args(1) else "32"
  val spark = GraftSession.baseBuilder("32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.sources.parallelPartitionDiscovery.threshold", listThreshold)
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val taxiDir = graft.operators.TaxiEvents.taxiDataDir

  for (r <- 1 to runs) {
    val t0 = System.nanoTime()
    val sinkName = s"taxi_prof_sink_$r"
    val c = col("c")
    val lon = when(c.getItem(0) === "yellow", c.getItem(10))
      .otherwise(c.getItem(8)).cast("double")
    val lat = when(c.getItem(0) === "yellow", c.getItem(11))
      .otherwise(c.getItem(9)).cast("double")
    val g = graft.operators.TaxiEvents.goldman
    val ci = graft.operators.TaxiEvents.citigroup
    val region = when(lon > g._1 && lon < g._2 && lat > g._3 && lat < g._4, lit("goldman"))
      .when(lon > ci._1 && lon < ci._2 && lat > ci._3 && lat < ci._4, lit("citigroup"))
    val agg = spark.readStream
      .option("pathGlobFilter", "part-*.csv")
      .option("maxFilesPerTrigger", 2000)
      .text(taxiDir)
      .select(split(col("value"), ",").as("c"))
      .select(region.as("region"),
        to_timestamp(c.getItem(3), "yyyy-MM-dd HH:mm:ss").as("ts"))
      .groupBy(col("region"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .filter(when(col("cnt") > 0,
        col("region").isNotNull && col("w").isNotNull).otherwise(lit(false)))
    val tBuilt = System.nanoTime()
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    val tStarted = System.nanoTime()
    try q.awaitTermination() finally q.stop()
    val tDone = System.nanoTime()
    val n = spark.table(sinkName).count()
    spark.catalog.dropTempView(sinkName)
    val tCollected = System.nanoTime()
    println(f"run $r: total=${(tCollected - t0) / 1e9}%.2fs " +
      f"build=${(tBuilt - t0) / 1e9}%.2fs start=${(tStarted - tBuilt) / 1e9}%.2fs " +
      f"drain=${(tDone - tStarted) / 1e9}%.2fs collect=${(tCollected - tDone) / 1e9}%.2fs rows=$n")
    q.recentProgress.foreach { p =>
      val d = p.durationMs.asScala.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }
      println(s"  batch ${p.batchId}: rows=${p.numInputRows} ${d.mkString(" ")}")
    }
  }
  spark.stop()
}
