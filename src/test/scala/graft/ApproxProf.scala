package graft

import org.apache.spark.sql.functions._

/** One-off cost isolation for approx_distinct_users (r10): which leg of
  * the two-aggregate plan pays — the rsd-0.01 HLL++, the exact
  * countDistinct (Expand), or their combination.
  *
  *   sbt -batch "Test/runMain graft.ApproxProf <dir> [runs]"
  */
object ApproxProf extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val runs = if (args.length > 1) args(1).toInt else 3
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val ev = graft.Tables.events(spark, dir)
  ev.count() // warm the scan

  def time(name: String)(body: => Unit): Unit = {
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    println(f"$name%28s  min=${ts.min}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
  }

  time("hll rsd=0.01 alone") {
    ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("a")).collect()
  }
  time("hll rsd=0.05 alone") {
    ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.05).as("a")).collect()
  }
  time("countDistinct alone") {
    ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e")).collect()
  }
  time("both (registered shape)") {
    ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("a"),
        countDistinct(col("user_id")).as("e")).collect()
  }
  time("two-pass join") {
    val a = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("a"))
    val e = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
    a.join(e, "event_type").collect()
  }
  spark.stop()
}
