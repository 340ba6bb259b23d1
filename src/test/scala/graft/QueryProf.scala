package graft

/** Warm min-of-N A/B instrument: times a registered query's noop write
  * N times inside one JVM (family memos cleared between reps, like the
  * bench's between-run discipline), printing every rep plus min/median.
  * Cold-JVM numbers come from the filtered bench; this isolates plan
  * shape changes from JVM/box noise when the effect is smaller than the
  * cold spread.
  *
  *   sbt -batch "Test/runMain graft.QueryProf <query> [dir] [reps]"
  */
object QueryProf extends App {
  val name = args.headOption.getOrElse(sys.error("query name required"))
  val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
  val reps = if (args.length > 2) args(2).toInt else 5
  // keepmemos: reps after the first ride the family artifacts — isolates
  // a family query's MARGINAL cost (the bench's in-run position) from
  // the shared build the bench charges to *_family_build
  val keepMemos = args.length > 3 && args(3) == "keepmemos"
  val spark = GraftSession.baseBuilder("32")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")

  def clearMemos(): Unit = {
    graft.operators.Dedup.clearMemos()
    graft.operators.InvertedIndex.clearMemos()
    graft.operators.PageRank.clearMemos()
    graft.operators.Similarity.clearMemos()
    graft.operators.SpamClassifier.clearMemos()
    graft.sources.AvroQueries.clearMemos()
    graft.sources.OrcQueries.clearMemos()
    graft.sources.JsonlQueries.clearMemos()
    graft.operators.Lakehouse.clearMemos()
  }

  val times = (1 to reps).map { i =>
    if (!keepMemos) clearMemos()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val s = (System.nanoTime() - t0) / 1e9
    println(f"rep $i: $s%.3f")
    s
  }
  val sorted = times.sorted
  println(f"QPROF $name min=${sorted.head}%.3f median=${sorted(reps / 2)}%.3f")
  spark.stop()
}
