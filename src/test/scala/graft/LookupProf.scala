package graft

import graft.operators.InvertedIndex
import org.apache.spark.sql.functions._

/** Point-lookup latency profiler (PLANS.md round 11): per-term probes of
  * the persisted inverted index, p50/p95 over the GRADED term set — the
  * one instrumentation surface of the reference without a direct
  * artifact (it times each boolean lookup,
  * `BooleanRetrievalCompressed.java:220-222`). The index is built once
  * (memoized, like every retrieval query); each probe is a term-pruned
  * scan + bounded collect, i.e. the engine's interactive-lookup path.
  * CPU canary (the bench's warm trivial query) brackets the record so a
  * degraded box cannot masquerade as a slow lookup path.
  *
  *   sbt -batch "Test/runMain graft.LookupProf <dir> [reps]"
  */
object LookupProf extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val reps = if (args.length > 1) args(1).toInt else 20
  // r13 (r12 verdict item 7): the profiler runs the DEPLOYMENT posture —
  // the FAIR service session with the probe thread in the interactive
  // pool, exactly how Verify now submits the registered probe family
  val spark = GraftSession.serviceBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  spark.sparkContext.setLocalProperty("spark.scheduler.pool",
    GraftSession.interactivePool)

  // the graded vocabulary: every term the reference-analog postfix
  // queries evaluate, plus the bm25 terms (the full interactive surface)
  val terms = (InvertedIndex.retrievalQueries.values.flatten.toSeq
    .filterNot(t => t == "AND" || t == "OR") ++ InvertedIndex.bm25Terms)
    .distinct.sorted

  def canary(): Double = {
    val t0 = System.nanoTime()
    graft.operators.Relational.q1ShipdateCount(spark, dir).collect()
    (System.nanoTime() - t0) / 1e9
  }

  val idx = InvertedIndex.persistedIndex(spark, dir)
  idx.filter(col("term") === "warmup").collect() // build + JIT warm
  val c0 = canary()

  val lat = for (_ <- 1 to reps; t <- terms) yield {
    val t0 = System.nanoTime()
    val n = idx.filter(col("term") === t).collect().length
    (t, (System.nanoTime() - t0) / 1e6, n)
  }
  val c1 = canary()

  def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, (p * s.length).toInt))
  }
  terms.foreach { t =>
    val xs = lat.filter(_._1 == t).map(_._2)
    val n = lat.find(_._1 == t).get._3
    println(f"$t%-8s p50=${pct(xs, 0.5)}%6.1fms p95=${pct(xs, 0.95)}%6.1fms " +
      f"postings=$n%5d reps=${xs.length}")
  }
  val all = lat.map(_._2)
  println(f"ALL      p50=${pct(all, 0.5)}%6.1fms p95=${pct(all, 0.95)}%6.1fms " +
    f"probes=${all.length} canary_start=$c0%.2fs canary_end=$c1%.2fs " +
    f"pool=${GraftSession.interactivePool}")

  // parity across pools: the interactive-pool probes must fetch exactly
  // what a default-pool batch recount of the same artifact says — the
  // scheduler pool is an isolation knob, never a semantics knob
  locally {
    val pooled = lat.groupBy(_._1).map { case (t, xs) => t -> xs.head._3 }
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
    val batch = idx.filter(col("term").isin(terms: _*))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    spark.sparkContext.setLocalProperty("spark.scheduler.pool",
      GraftSession.interactivePool)
    val diverged = terms.filter(t => pooled.getOrElse(t, 0) != batch.getOrElse(t, 0))
    require(diverged.isEmpty,
      s"pool parity broke for terms $diverged: pooled=${diverged.map(pooled.get)} " +
        s"batch=${diverged.map(batch.get)}")
    println(s"pool parity OK: ${terms.length} terms, interactive == default-pool recount")
  }

  // ---- throughput under concurrency (r12, verdict item 4) ------------
  // The r11 record showed single-probe p50 is job-launch floor (~60 ms);
  // the claim that a distributed index's value is PROBE THROUGHPUT needs
  // a measured probes/sec under concurrent load. N driver threads fire
  // independent probe jobs at the shared session (Spark schedules
  // concurrent actions; each probe is a term-pruned scan + bounded
  // collect) for a fixed window — rate = completed probes / wall. The
  // term sequence is deterministic per thread (seeded), so runs compare.
  val durSec = if (args.length > 2) args(2).toDouble else 10.0
  Seq(1, 8, 32).foreach { n =>
    val probes = new java.util.concurrent.atomic.AtomicLong
    val t0 = System.nanoTime()
    val threads = (1 to n).map { tid =>
      new Thread(() => {
        // each probe thread tags itself into the interactive pool —
        // Spark clones the parent's local properties at thread CREATION
        // time, so the explicit set keeps the serving contract
        // independent of when the parent applied its own tag
        spark.sparkContext.setLocalProperty("spark.scheduler.pool",
          GraftSession.interactivePool)
        val rnd = new scala.util.Random(tid)
        while ((System.nanoTime() - t0) / 1e9 < durSec) {
          val t = terms(rnd.nextInt(terms.length))
          idx.filter(col("term") === t).collect()
          probes.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"threads=$n%2d probes=${probes.get}%5d wall=$wall%5.1fs " +
      f"rate=${probes.get / wall}%7.1f probes/s")
  }
  val c2 = canary()
  println(f"throughput canary_end=$c2%.2fs")
  spark.stop()
}
