package graft

import org.apache.spark.sql.functions.{col, count, lit, window}

/** Dev tool: measured before/after for the taxi small-file compaction
  * (r9 verdict item 8). Executes [[graft.operators.TaxiEvents
  * .compactionRewrite]] — the rewrite leg of the registered
  * `taxi_compaction_plan` — into a temp dir, then times the SAME
  * parse→hourly-count aggregation over (a) the original 1,440-file
  * per-minute layout and (b) the compacted one-file-per-bin layout,
  * min-of-N trials each, and checks the two results agree row-for-row.
  * Usage: runMain graft.CompactionAb [taxiDir] [trials]
  *
  * COLD-cache legs (the regime compaction exists for — per-file open
  * cost dominates a 1,440-small-file scan when nothing is cached):
  * each phase runs in its own JVM so the harness can drop the page
  * cache between them:
  *   runMain graft.CompactionAb <taxiDir> 1 <outDir> rewrite
  *   (drop caches)  runMain graft.CompactionAb <taxiDir> 1 <outDir> scan_before
  *   (drop caches)  runMain graft.CompactionAb <taxiDir> 1 <outDir> scan_after
  * Scan phases warm JIT/codegen on a tiny throwaway text file first, so
  * the timed number is the I/O, not the JVM.
  */
object CompactionAb {
  def main(args: Array[String]): Unit = {
    val taxiDir = args.headOption.getOrElse(
      graft.operators.TaxiEvents.taxiDataDir)
    val trials = if (args.length > 1) args(1).toInt else 3
    val fixedOut = if (args.length > 2) Some(args(2)) else None
    val phase = if (args.length > 3) args(3) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.baseBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def hourlyOf(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TaxiEvents.parse(df)
        .groupBy(col("region"), window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("region"), col("w.start").as("hour_start"), col("cnt"))
    def timeIt(body: => Unit): Double = {
      val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
    }
    def warmJit(): Unit = {
      val w = java.nio.file.Files.createTempDirectory("graft-ab-warm")
      try {
        java.nio.file.Files.write(w.resolve("part-warm.csv"),
          "yellow,,,2015-12-01 00:00:00,,,,,,,-74.0140,40.7140\n"
            .getBytes("UTF-8"))
        hourlyOf(spark.read.text(w.toString))
          .write.format("noop").mode("overwrite").save()
      } finally graft.sources.FileSinkFs.deleteRecursively(w)
    }

    phase match {
      case "rewrite" =>
        val t = timeIt(graft.operators.TaxiEvents.compactionRewrite(
          spark, taxiDir, fixedOut.get))
        println(f"""{"metric":"compaction_rewrite","rewrite_sec":$t%.3f}""")
        spark.stop(); return
      case "scan_before" =>
        warmJit()
        val t = (1 to trials).map(_ => timeIt(
          hourlyOf(spark.read.option("pathGlobFilter", "part-*.csv")
            .text(taxiDir)).write.format("noop").mode("overwrite").save()))
        println(f"""{"metric":"compaction_scan_before","sec":${t.min}%.3f}""")
        spark.stop(); return
      case "scan_after" =>
        warmJit()
        val t = (1 to trials).map(_ => timeIt(
          hourlyOf(spark.read.text(fixedOut.get))
            .write.format("noop").mode("overwrite").save()))
        println(f"""{"metric":"compaction_scan_after","sec":${t.min}%.3f}""")
        spark.stop(); return
      case _ => // "all": warm in-process A/B below
    }

    val out = java.nio.file.Files.createTempDirectory("graft-compact-ab")
    try {
      val t0 = System.nanoTime()
      val nBins = graft.operators.TaxiEvents.compactionRewrite(
        spark, taxiDir, out.toString)
      val rewriteSec = (System.nanoTime() - t0) / 1e9

      def original() = hourlyOf(spark.read
        .option("pathGlobFilter", "part-*.csv").text(taxiDir))
      def compacted() = hourlyOf(spark.read.text(out.toString))

      // parity first: the rewrite must not change the query's answer
      val diff = original().exceptAll(compacted())
        .unionAll(compacted().exceptAll(original())).count()
      require(diff == 0, s"compacted result diverged: $diff rows differ")

      val before = (1 to trials)
        .map(_ => timeIt(original().write.format("noop").mode("overwrite").save()))
      val after = (1 to trials)
        .map(_ => timeIt(compacted().write.format("noop").mode("overwrite").save()))
      println(f"""{"metric":"taxi_compaction_ab","n_bins":$nBins,""" +
        f""""rewrite_sec":$rewriteSec%.3f,""" +
        f""""scan_before_sec":${before.min}%.3f,""" +
        f""""scan_after_sec":${after.min}%.3f,""" +
        f""""trials":$trials,"parity_rows_diff":0}""")
    } finally graft.sources.FileSinkFs.deleteRecursively(out)
    spark.stop()
  }
}
