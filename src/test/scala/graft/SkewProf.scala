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

  def timeIt(label: String, skewOn: Boolean)(mk: SparkSession => DataFrame): Unit = {
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
    // thresholds sized so detection keys on the RATIO (hot ≈ 15× median)
    // at this fixture's absolute sizes; a cluster run keeps the defaults
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    val walls = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val df = mk(spark)
      val n = df.collect().map(_.getAs[Long]("n")).sum
      val wall = (System.nanoTime() - t0) / 1e9
      val skewed = new GraftSpec {}.physicalNodes(df).exists {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.isSkewJoin
        case _ => false
      }
      (wall, n, skewed)
    }
    val best = walls.map(_._1).min
    println(f"$label%-6s best=$best%.2fs all=${walls.map(w => f"${w._1}%.2f").mkString(",")} " +
      f"rows=${walls.head._2} skewJoinFired=${walls.head._3}")
  }

  timeIt("off", skewOn = false)(plain)
  timeIt("aqe", skewOn = true)(plain)
  timeIt("salt", skewOn = false)(salted(_, 32))
  spark.stop()
}
