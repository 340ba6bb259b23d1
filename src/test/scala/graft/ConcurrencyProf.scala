package graft

import graft.operators.InvertedIndex
import org.apache.spark.sql.functions._

/** Mixed-workload concurrency profiler (round 12 continuation): the two
  * service-shaped behaviors a shared 1000-executor deployment lives on,
  * neither measurable from single-query bench lines:
  *
  *  1. THROUGHPUT SCALING — N analyst threads driving the same session:
  *     does aggregate queries/sec scale with thread count, or does the
  *     driver (one DAGScheduler event loop, shared memo locks) serialize
  *     them? Protocol: a fixed mixed set of light registry queries, same
  *     total work serial vs 4 vs 8 threads, noop sink.
  *
  *  2. INTERACTIVE LATENCY UNDER BATCH LOAD — point lookups while heavy
  *     batch queries saturate the task slots, FIFO default vs FAIR
  *     scheduler pools (`spark.scheduler.mode=FAIR`, probes in pool
  *     "interactive", load in pool "batch"). FIFO schedules stages in
  *     submission order, so a probe lands behind a 32-task-wide batch
  *     stage; FAIR offers freed slots to the starved pool first. The
  *     scheduler mode is a context conf, so each mode runs in its own
  *     sequential SparkContext within this one JVM.
  *
  * Latency probes reuse the LookupProf surface (term-pruned scans of the
  * persisted inverted index — the engine's interactive path, p50/p95
  * brackets). CPU canaries bracket each phase so a degraded box cannot
  * masquerade as scheduler starvation.
  *
  *   sbt -batch "Test/runMain graft.ConcurrencyProf <dir>"
  */
object ConcurrencyProf {

  private val analystSet = Seq(
    "q1_shipdate_count", "q3_part_supplier", "q6_pricing_summary",
    "q8_semi_join", "q13_running_revenue", "topk_by_group",
    "wordcount", "lang_id", "token_stats", "boolean_retrieval",
    "knn_brute_cosine", "event_count_hourly")

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, (p * s.length).toInt))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    Seq("FIFO", "FAIR").foreach(mode => phase(mode, dir))
  }

  private def phase(mode: String, dir: String): Unit = {
    // the FAIR leg exercises the SHIPPED mixed-workload builder, so the
    // measurement certifies the code path users get, not a prof-local conf
    val base =
      if (mode == "FAIR") GraftSession.serviceBuilder("32")
      else GraftSession.baseBuilder("32").config("spark.scheduler.mode", mode)
    val spark = base
      .appName(s"graft-concprof-$mode")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(spark.sparkContext.getConf.get("spark.scheduler.mode") == mode,
      s"stale context leaked across phases (wanted $mode)")

    def canary(): Double = {
      val t0 = System.nanoTime()
      graft.operators.Relational.q1ShipdateCount(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def runNoop(name: String): Unit =
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()

    // ---- leg 1: analyst throughput scaling --------------------------
    analystSet.foreach(runNoop) // warm: memos, codegen, page cache
    val reps = 3
    val work: Seq[String] = Seq.fill(reps)(analystSet).flatten
    def drive(threads: Int): Double = {
      val queue = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      scala.util.Random.shuffle(work).foreach(queue.add) // de-phase the mix
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { i =>
        new Thread(() => {
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"analyst$i")
          var n = queue.poll()
          while (n != null) { runNoop(n); n = queue.poll() }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val c0 = canary()
    val serialWall = drive(1)
    val wall4 = drive(4)
    val wall8 = drive(8)
    val n = work.size.toDouble
    println(f"[$mode] throughput: serial ${n / serialWall}%.1f q/s, " +
      f"4thr ${n / wall4}%.1f q/s (${serialWall / wall4}%.1fx), " +
      f"8thr ${n / wall8}%.1f q/s (${serialWall / wall8}%.1fx)  " +
      f"[walls $serialWall%.1f/$wall4%.1f/$wall8%.1f s, ${n.toInt} queries each]")

    // ---- leg 2: interactive p50 under batch load --------------------
    val terms = (InvertedIndex.retrievalQueries.values.flatten.toSeq
      .filterNot(t => t == "AND" || t == "OR") ++ InvertedIndex.bm25Terms)
      .distinct.sorted
    val idx = InvertedIndex.persistedIndex(spark, dir)
    idx.filter(col("term") === "warmup").collect()
    val rng = new scala.util.Random(42)
    def probes(k: Int): Seq[Double] = (1 to k).map { _ =>
      val t = terms(rng.nextInt(terms.length))
      val t0 = System.nanoTime()
      idx.filter(col("term") === t).collect()
      (System.nanoTime() - t0) / 1e6
    }
    spark.sparkContext.setLocalProperty("spark.scheduler.pool",
      GraftSession.interactivePool)
    val quiet = probes(60)

    // two load shapes: a REALISTIC one (a registry heavy query, whose
    // stages at fixture scale are exactly shuffle.partitions=32 tasks
    // wide, so the slot queue never exceeds the slot count) and a
    // WIDE-STAGE one (2048 pending ~0.5 s tasks — the shape every stage
    // has at 100 TB, where pending tasks outnumber slots by orders of
    // magnitude and FIFO hands each freed slot to the earliest job)
    def withLoad(runLoad: () => Unit)(body: => Seq[Double]): Seq[Double] = {
      @volatile var stop = false
      val threads = (1 to 2).map { _ =>
        new Thread(() => {
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", "batch")
          // job group set HERE so teardown's cancelJobGroup covers BOTH
          // load shapes — the first cut set it only inside wideStageLoad,
          // leaving the realistic leg's teardown to join a full in-flight
          // query (review r12c)
          spark.sparkContext.setJobGroup("concprof-load", "batch load", true)
          while (!stop)
            try runLoad()
            catch {
              case e: Throwable => // teardown kills the in-flight job
                if (!stop) { System.err.println(s"[batch] ${e.getMessage}"); stop = true }
            }
        })
      }
      threads.foreach(_.start())
      Thread.sleep(2000) // let the load reach a wide stage
      try body
      finally { stop = true; spark.sparkContext.cancelJobGroup("concprof-load"); threads.foreach(_.join()) }
    }
    def realisticLoad(): Unit = runNoop("pmi_pairs")
    def wideStageLoad(): Unit = {
      spark.sparkContext.setJobGroup("concprof-load", "wide-stage batch load", true)
      // 2048 partitions x ~40M xxhash evals ~ 0.5 s/task, no shuffle
      spark.range(0L, 2048L * 40000000L, 1L, 2048)
        .select(xxhash64(col("id")).as("h"))
        // max, not sum: summing 80 G hashes overflows Long and ANSI mode
        // (Spark 4 default) fails the job — the load must outlive probes
        .agg(max("h")).write.format("noop").mode("overwrite").save()
    }
    val loaded = withLoad(realisticLoad _)(probes(60))
    val loadedWide = withLoad(wideStageLoad _)(probes(60))
    val c1 = canary()

    println(f"[$mode] lookup p50 quiet ${pct(quiet, 0.5)}%6.1f ms " +
      f"p95 ${pct(quiet, 0.95)}%6.1f ms | 32-task-stage load " +
      f"p50 ${pct(loaded, 0.5)}%6.1f ms (${pct(loaded, 0.5) / pct(quiet, 0.5)}%.1fx) | " +
      f"2048-task-stage load p50 ${pct(loadedWide, 0.5)}%8.1f ms " +
      f"p95 ${pct(loadedWide, 0.95)}%8.1f ms " +
      f"(${pct(loadedWide, 0.5) / pct(quiet, 0.5)}%.1fx) " +
      f"canaries $c0%.2f/$c1%.2f s")

    // release the phase's memoized checkpoints BEFORE the context dies —
    // the maps would otherwise pin blocks of a stopped context into the
    // next phase (keys are (session, dir), so the FAIR phase rebuilds)
    graft.operators.Dedup.clearMemos()
    graft.operators.InvertedIndex.clearMemos()
    graft.operators.Similarity.clearMemos()
    graft.operators.SpamClassifier.clearMemos()
    spark.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
  }
}
