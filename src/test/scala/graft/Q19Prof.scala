package graft

/** Bucketed-vs-unbucketed A/B for the Q21 shape (PLANS.md round 11):
  * times [[graft.operators.Lakehouse.q19SoleDelayerBucketed]] against
  * [[graft.operators.Relational.q19SoleDelayer]] with the layout build
  * reported separately (it amortizes over every consumer). Run with
  * SPARK_GRAFT_BUCKETS to reproduce the bucket-width sizing rule the
  * Lakehouse scaladoc records (8 buckets win at sf0.1, cap parallelism
  * at sf1 on local[32]; 32 restore the win).
  *
  *   [SPARK_GRAFT_BUCKETS=N] sbt -batch "Test/runMain graft.Q19Prof <dir>"
  */
object Q19Prof extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  def timeIt(label: String)(body: => Unit): Unit = {
    val walls = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    println(f"$label%-12s best=${walls.min}%.2fs " +
      f"all=${walls.map(w => f"$w%.2f").mkString(",")}")
  }
  val tb0 = System.nanoTime()
  graft.operators.Lakehouse.q19BucketedTableFor(spark, dir)
  println(f"layout_build ${(System.nanoTime() - tb0) / 1e9}%.2fs " +
    f"buckets=${graft.operators.Lakehouse.bucketsFor(spark, dir, "lineitem")}")
  timeIt("bucketed")(
    graft.operators.Lakehouse.q19SoleDelayerBucketed(spark, dir).collect())
  timeIt("unbucketed")(
    graft.operators.Relational.q19SoleDelayer(spark, dir).collect())
  spark.stop()
}
