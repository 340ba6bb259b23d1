package graft

import graft.operators.Lakehouse
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Layout A/B profiler for the z-order demonstration (PLANS.md round
  * 10): per scale dir, runs the SAME middle-decile 2-D box rollup over
  * the z-ordered layout and the hash-scattered control, reporting wall
  * time and the scan's output-row count (rows surviving parquet
  * row-group stats pruning).
  *
  *   sbt -batch "Test/runMain graft.ZorderProf <dir> [runs]"
  */
object ZorderProf extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val runs = if (args.length > 1) args(1).toInt else 3
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  val (zOut, flatOut) = Lakehouse.zorderDirsFor(spark, dir)
  val (tlo, thi, vlo, vhi) = Lakehouse.boxBounds(spark, dir)
  val total = graft.Tables.events(spark, dir).count()

  def once(path: String): (Long, Double) = {
    val t0 = System.nanoTime()
    val q = spark.read.parquet(path)
      .filter(col("ts_micros").between(tlo, thi) &&
        col("value_micro").between(vlo, vhi))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    q.collect()
    val wall = (System.nanoTime() - t0) / 1e9
    val nodes = new GraftSpec {}.physicalNodes(q)
    val scan = nodes.collectFirst { case f: FileSourceScanExec => f }.getOrElse {
      println(q.queryExecution.executedPlan.toString)
      sys.error("no FileSourceScanExec in the executed plan")
    }
    (scan.metrics("numOutputRows").value, wall)
  }

  println(s"dir=$dir totalRows=$total box=[$tlo,$thi]x[$vlo,$vhi]")
  Seq("z" -> zOut, "flat" -> flatOut).foreach { case (name, path) =>
    val obs = (1 to runs).map(_ => once(path))
    val scanned = obs.head._1
    val best = obs.map(_._2).min
    println(f"$name%5s: scannedRows=$scanned%d (${100.0 * scanned / total}%.1f%%) " +
      f"bestWall=${best}%.3f s")
  }

  // the honest 1-D tradeoff: a time-band-only query over each layout,
  // plus the pure ts-sorted layout (the 1-D optimum z-order gives up
  // locality against in exchange for the second dimension)
  val tsOut = s"target/graft-zorder/ts_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
  graft.Tables.events(spark, dir)
    .select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("ts_micros"),
      round(col("value") * 1e6).cast("long").as("value_micro"))
    .repartitionByRange(Lakehouse.zFiles, col("ts_micros"))
    .sortWithinPartitions("ts_micros")
    .write.mode("overwrite").parquet(tsOut)
  def onceTs(path: String): (Long, Double) = {
    val t0 = System.nanoTime()
    val q = spark.read.parquet(path)
      .filter(col("ts_micros").between(tlo, thi))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    q.collect()
    val wall = (System.nanoTime() - t0) / 1e9
    val scan = new GraftSpec {}.physicalNodes(q)
      .collectFirst { case f: FileSourceScanExec => f }.get
    (scan.metrics("numOutputRows").value, wall)
  }
  println("-- 1-D ts band only --")
  Seq("ts-sorted" -> tsOut, "z" -> zOut, "flat" -> flatOut).foreach { case (name, path) =>
    val obs = (1 to runs).map(_ => onceTs(path))
    println(f"$name%10s: scannedRows=${obs.head._1}%d " +
      f"(${100.0 * obs.head._1 / total}%.1f%%) bestWall=${obs.map(_._2).min}%.3f s")
  }
  spark.stop()
}
