package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Canonical order-independent result digest for SAME-ENGINE parity
  * checks (spill-path certification, provider A/Bs): xxhash64 over every
  * column string-casted in name-sorted order, summed, plus the row
  * count. Order-independent by construction (sum is commutative), and
  * string-casting is deterministic within one engine — this is NOT the
  * cross-engine oracle (selfcheck.py is), it is "the same engine, under
  * different physical conditions, produced byte-identical values". */
object ResultHash {
  def of(df: DataFrame): (String, Long) = {
    // decimal(38,0) sum: a long sum of 64-bit hashes overflows under
    // ANSI mode; the wide decimal keeps the digest exact and total
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val r = df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
      .agg(sum(col("h")), count(lit(1))).collect()(0)
    (if (r.isNullAt(0)) "0" else r.getDecimal(0).toBigInteger.toString,
      r.getLong(1))
  }
}

/** Cumulative spill-bytes listener (memory + disk task metrics). Events
  * arrive async; [[settled]] polls until the counter stops moving so a
  * read taken right after an action cannot under-count. */
class SpillCounter extends SparkListener {
  val bytes = new AtomicLong
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) bytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
  }
  def settled(): Long = {
    var cur = bytes.get; var stable = 0
    while (stable < 3) {
      Thread.sleep(100)
      val next = bytes.get
      if (next == cur) stable += 1 else { stable = 0; cur = next }
    }
    cur
  }
}

/** Spill-path certification under REAL memory pressure (r11 verdict
  * item 1 — the one 100 TB behavior never demonstrated): the heavy
  * families run twice in this JVM, first on a session whose
  * MemoryManager is capped via spark.testing.memory (the same knob
  * Spark's own suites cap execution memory with) so sort/agg/join
  * genuinely run out and engage Tungsten spilling, then on an
  * unconstrained session — asserting spill bytes > 0 under pressure AND
  * the ResultHash digests identical across both. This is the engine's
  * analog of the reference tuning 3 GB heaps for exactly these jobs
  * (`PairsPMI.java:300-304`): at real scale these operators WILL spill,
  * and an operator that has only ever run in-memory is unproven.
  *
  *   sbt -batch "Test/runMain graft.SpillProf <dir> [capMb] [queriesCsv]"
  *
  * Results table goes to stdout; PLANS.md records the round's capture.
  */
object SpillProf extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val capMb = if (args.length > 1) args(1).toLong else 512L
  val queries: Seq[String] =
    if (args.length > 2) args(2).split(',').toSeq
    else Seq("pmi_pairs", "pmi_stripes", "wordcount", "dedup_jaccard_prefix",
      "inverted_index_packed", "q19_sole_delayer")
  val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")

  def clearAllMemos(): Unit = {
    graft.operators.Dedup.clearMemos()
    graft.operators.InvertedIndex.clearMemos()
    graft.operators.PageRank.clearMemos()
    graft.operators.Similarity.clearMemos()
    graft.operators.SpamClassifier.clearMemos()
    graft.operators.Lakehouse.clearMemos()
    graft.sources.AvroQueries.clearMemos()
    graft.sources.OrcQueries.clearMemos()
    graft.sources.JsonlQueries.clearMemos()
  }

  case class Leg(wall: Double, spill: Long, hash: (String, Long))

  def phase(label: String, constrained: Boolean): Map[String, Leg] = {
    val b = GraftSession.baseBuilder(cpus)
    if (constrained) {
      // two pressure sources, calibrated against each other (measured
      // while building this prof):
      //  - spark.testing.memory caps the MemoryManager's view of the
      //    heap (not the real heap — acquisition failures become
      //    spills). The cap must stay MODERATE: at 192 MB the genuine
      //    starvation regime appears (dedup spilled 1.26 GB at sf1) but
      //    hash-map INITIALIZATION starts failing hard
      //    (UNABLE_TO_ACQUIRE_MEMORY from BytesToBytesMap.<init> —
      //    init allocations cannot cooperatively spill), killing jobs
      //    instead of spilling them.
      //  - the force-spill threshold makes every sorter-backed consumer
      //    (sort, shuffle write, agg fallback, SMJ/window buffers)
      //    spill deterministically once it holds 128k elements — the
      //    spill PATH engages in every query even where the cap alone
      //    would not starve that particular operator.
      // reservedMemory 0 keeps the cap honest (default reserves 300 MB
      // off the top); 1 MB pages so 16 tasks can each get a page.
      b.config("spark.testing.memory", (capMb << 20).toString)
        .config("spark.testing.reservedMemory", "0")
        .config("spark.buffer.pageSize", "1m")
        .config("spark.shuffle.spill.numElementsForceSpillThreshold", "131072")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counter = new SpillCounter
    spark.sparkContext.addSparkListener(counter)
    val out = queries.map { q =>
      val before = counter.settled()
      val t0 = System.nanoTime()
      val hash = ResultHash.of(SparkEntry.queries(q)(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      val spill = counter.settled() - before
      println(f"[$label] $q%-24s wall=$wall%7.2fs spill=${spill / 1024.0 / 1024.0}%9.1fMB " +
        s"hash=${hash._1} rows=${hash._2}")
      q -> Leg(wall, spill, hash)
    }.toMap
    // clear BEFORE stopping: releasing the families' checkpointed blocks
    // needs the live context (an after-stop clear NPEs in the block
    // manager), and the next phase must re-pay every family build
    clearAllMemos()
    spark.stop()
    out
  }

  println(s"== constrained: spark.testing.memory=${capMb}MB, local[$cpus], $dir ==")
  val pressured = phase("capped", constrained = true)
  println("== unconstrained ==")
  val free = phase("free", constrained = false)

  var ok = true
  queries.foreach { q =>
    val p = pressured(q); val f = free(q)
    val parity = p.hash == f.hash
    if (!parity) ok = false
    println(f"$q%-24s spill_capped=${p.spill / 1024.0 / 1024.0}%9.1fMB " +
      f"spill_free=${f.spill / 1024.0 / 1024.0}%7.1fMB " +
      f"wall ${p.wall}%6.2f vs ${f.wall}%6.2f s parity=$parity")
  }
  val spilledAny = pressured.values.map(_.spill).sum
  println(f"TOTAL spill under cap: ${spilledAny / 1024.0 / 1024.0}%.1f MB; " +
    s"parity=${if (ok) "EXACT" else "BROKEN"}")
  if (!ok || spilledAny == 0) sys.exit(1)
}
