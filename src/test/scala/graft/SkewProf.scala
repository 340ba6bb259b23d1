package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skewed-join A/B profiler (PLANS.md round 11): the SAME engineered
  * hot-key join measured three ways —
  *
  *   off   AQE skew-join disabled: the hot partition rides one task
  *         (the straggler a 1000-executor cluster waits on)
  *   aqe   AQE skew-join enabled: OptimizeSkewedJoin splits the hot
  *         partition at map-output boundaries at runtime, zero rewrite
  *   salt  the manual rewrite the repo's salting twins document: left
  *         keys salted pmod(event_id, S), right replicated ×S
  *
  * Skew shape mirrors the ScaleDesignSpec pin: 15/16 of user_ids fold
  * onto one hot key, ×REP sha2-payload amplification (incompressible,
  * so shuffle partition sizes — the skew detector's input — reflect it).
  *
  *   sbt -batch "Test/runMain graft.SkewProf <dir> [runs] [rep]"
  */
object SkewProf extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val runs = if (args.length > 1) args(1).toInt else 3
  val rep = if (args.length > 2) args(2).toInt else 50
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

  def skewedLeft(s: SparkSession): DataFrame =
    Tables.events(s, dir)
      .select(when(pmod(col("user_id"), lit(16)) =!= 0, lit(0L))
        .otherwise(col("user_id")).as("k"), col("event_id"))
      .repartition(32)
      .withColumn("r", explode(array((0 until rep).map(lit(_)): _*)))
      .withColumn("payload", sha2(concat_ws("-", col("event_id"), col("r")), 256))

  val maxU = Tables.events(spark, dir).agg(max("user_id")).collect()(0).getLong(0)
  def rightDim(s: SparkSession): DataFrame =
    s.range(0, maxU + 1).select(col("id").as("k"),
      concat(lit("u"), col("id")).as("tag"))

  def plain(s: SparkSession): DataFrame =
    skewedLeft(s).join(rightDim(s), "k")
      .groupBy("tag").agg(count(lit(1)).as("n"), max("payload").as("mx"))

  /** The manual rewrite: salt the left key, replicate the right ×S. */
  def salted(s: SparkSession, salts: Int): DataFrame = {
    val l = skewedLeft(s)
      .withColumn("salt", pmod(col("event_id") + col("r"), lit(salts)))
    val r = rightDim(s)
      .withColumn("salt", explode(array((0 until salts).map(lit(_)): _*)))
    l.join(r, Seq("k", "salt"))
      .groupBy("tag").agg(count(lit(1)).as("n"), max("payload").as("mx"))
  }

  // per-run task-duration capture (r14, r13 verdict item 6): the
  // certification metric is the TAIL — the hot partition's straggler
  // task vs the median task. All stages' tasks are recorded; the max is
  // the join straggler by construction (every other task in this job is
  // a bounded slice).
  private val taskDurations = new java.util.concurrent.ConcurrentLinkedQueue[Long]
  spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      taskDurations.add(te.taskInfo.duration): Unit
  })

  def timeIt(label: String, skewOn: Boolean)(mk: SparkSession => DataFrame): Unit = {
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
    // thresholds sized so detection keys on the RATIO (hot ≈ 15× median)
    // at this fixture's absolute sizes; a cluster run keeps the defaults
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    val walls = (1 to runs).map { _ =>
      taskDurations.clear()
      val t0 = System.nanoTime()
      val df = mk(spark)
      val n = df.collect().map(_.getAs[Long]("n")).sum
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain the last task events
      val durs = {
        import scala.jdk.CollectionConverters._
        taskDurations.iterator().asScala.toArray.sorted
      }
      val maxT = if (durs.isEmpty) 0L else durs.last
      val p50 = if (durs.isEmpty) 0L else durs(durs.length / 2)
      val nodes = new GraftSpec {}.physicalNodes(df)
      val skewed = nodes.exists {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.isSkewJoin
        case _ => false
      }
      // split count: PartialReducerPartitionSpec entries are exactly the
      // pieces OptimizeSkewedJoin cut hot partitions into at map-output
      // boundaries (0 when the rule did not fire)
      val splits = nodes.collect {
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
          r.partitionSpecs.count(
            _.isInstanceOf[org.apache.spark.sql.execution.PartialReducerPartitionSpec])
      }.sum
      (wall, n, skewed, maxT, p50, splits)
    }
    val best = walls.minBy(_._1)
    println(f"$label%-6s best=${best._1}%.2fs " +
      f"all=${walls.map(w => f"${w._1}%.2f").mkString(",")} " +
      f"rows=${best._2} skewJoinFired=${best._3} " +
      f"taskMax=${best._4 / 1000.0}%.2fs taskP50=${best._5 / 1000.0}%.2fs " +
      f"tail=${if (best._5 > 0) f"${best._4.toDouble / best._5}%.1f" else "-"}x " +
      f"skewSplits=${best._6}")
  }

  timeIt("off", skewOn = false)(plain)
  timeIt("aqe", skewOn = true)(plain)
  timeIt("salt", skewOn = false)(salted(_, 32))
  spark.stop()
}
