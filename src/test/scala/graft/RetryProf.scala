package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fault-tolerance semantics certification (round 12 continuation): at
  * 1000-executor scale tasks FAIL routinely (preemption, OOM kills, bad
  * hosts), so "exact results" has to mean exact UNDER RETRY — an
  * operator that leaks nondeterminism into retried partitions (rand
  * without a seed, monotonically_increasing_id crossing a shuffle,
  * first() over an unordered input) produces silently different output
  * on a bad day. The suite's shared session cannot pin this: local[n]
  * defaults to maxFailures=1 (any task failure fails the job), so this
  * prof owns a local[32,3] context (3 attempts per task).
  *
  * Legs, each over three aggregation shapes (grouped sum, distinct
  * count, join+agg) with the fault spliced at the scan side:
  *  1. retry_once — partition 0's first attempt throws; the retry must
  *     recompute from the immutable scan and partial aggregation must
  *     not double-count the failed attempt's output. Digest EXACT.
  *  2. retry_twice — attempts 0 AND 1 throw; success lands on the last
  *     allowed attempt. Digest EXACT.
  *  3. exhausted — every attempt throws: the JOB must fail (no partial
  *     result can masquerade as success), and the session must stay
  *     healthy — the same clean query re-run immediately after returns
  *     the exact digest (a poisoned-executor/jammed-scheduler check).
  *
  * Speculative execution is deliberately NOT certified here: Spark's
  * speculation scheduler never launches the twin on the host the
  * original runs on, and local mode has exactly one host — a
  * "speculation" leg would pass vacuously with zero speculative tasks.
  * Recorded as out of local-mode reach, not as covered.
  *
  *   sbt -batch "Test/runMain graft.RetryProf <dir>"
  */
object RetryProf {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.baseBuilder("32")
      .master("local[32,3]") // override: allow 3 task attempts
      .appName("graft-retryprof")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(spark.sparkContext.master == "local[32,3]",
      "retry context did not take local[32,3]")

    def digest(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    // throws while attemptNumber < failUpTo on partition 0; passes every
    // row afterwards (and on every other partition)
    def failGate(failUpTo: Int) = udf { () =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() < failUpTo)
        throw new RuntimeException(
          s"injected task failure, attempt ${tc.attemptNumber()} (RetryProf)")
      true
    }.asNondeterministic() // keep Catalyst from folding or reordering it

    val docs = graft.Tables.documents(spark, dir)
    val li = graft.Tables.lineitem(spark, dir)
    val orders = graft.Tables.orders(spark, dir)

    def groupedSum(gate: org.apache.spark.sql.Column): DataFrame =
      li.filter(gate)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("qty"),
          count(lit(1)).as("n"))
    def distinctCount(gate: org.apache.spark.sql.Column): DataFrame =
      docs.filter(gate)
        .select(explode(graft.functions.TextFunctions.tokenize(col("text"))).as("w"))
        .agg(countDistinct("w").as("vocab"))
    def joinAgg(gate: org.apache.spark.sql.Column): DataFrame =
      li.filter(gate).join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

    val shapes = Seq[(String, org.apache.spark.sql.Column => DataFrame)](
      ("grouped_sum", groupedSum), ("distinct_count", distinctCount),
      ("join_agg", joinAgg))

    shapes.foreach { case (name, mk) =>
      val clean = digest(mk(lit(true)))
      require(clean.nonEmpty, s"$name: vacuous — clean plan returned 0 rows")
      Seq(1 -> "retry_once", 2 -> "retry_twice").foreach { case (k, leg) =>
        val retried = digest(mk(failGate(k)()))
        require(retried == clean,
          s"$name/$leg: digest diverged under task retry " +
            s"(${retried.length} vs ${clean.length} rows)")
        println(s"[$leg] $name: partition-0 failed $k time(s), " +
          s"digest EXACT (${clean.length} rows)")
      }
      // exhausted: all 3 attempts throw -> the job must FAIL, and the
      // session must serve the clean plan exactly right afterwards
      val failed =
        try { mk(failGate(Int.MaxValue)()).collect(); false }
        catch { case e: Throwable =>
          // the injected fault must be the reason, wherever Spark wrapped it
          Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
            .exists(_.toString.contains("injected task failure"))
        }
      require(failed, s"$name/exhausted: job SUCCEEDED past maxFailures — " +
        "a partial result masqueraded as success")
      val after = digest(mk(lit(true)))
      require(after == clean, s"$name/exhausted: session poisoned — clean " +
        "re-run after the failed job diverged")
      println(s"[exhausted] $name: job failed after 3 attempts as required; " +
        "clean re-run EXACT")
    }

    spark.stop()
    println("RetryProf: ALL EXACT")
  }
}
