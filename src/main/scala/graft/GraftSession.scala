package graft

import org.apache.spark.sql.SparkSession

/** The ONE place the library's driver sessions get their deployment
  * confs — Bench, Verify, and the test session all start from
  * [[baseBuilder]], so a builder refactor cannot silently drop a pinned
  * conf from one of them (the r7 verdict's concern: the bypass-merge
  * pin lived in three copy-pasted builders and one spec that only
  * covered the test session).
  *
  * Pinned confs and why:
  *  - `spark.shuffle.sort.bypassMergeThreshold` = core count: below the
  *    threshold Spark's bypass shuffle writer opens mappers × reducers
  *    files per exchange; an iterative loop with a few hundred explicit
  *    partitions lands squarely in the trap (measured r7: PPR at sf3
  *    width 163 took 40 s vs 4.4 s with the threshold at core count —
  *    the 200 default is tuned for ETL shuffles, not
  *    repartition-heavy iteration). GraftSessionSpec pins presence.
  *  - `spark.sql.shuffle.partitions` = core count: the local-mode
  *    right-size (the 200 default is a cluster width).
  *  - UTC session timezone: DuckDB oracle comparisons are
  *    timezone-naive; any other zone drifts every timestamp hash.
  *  - graft.plans.GraftExtensions: the TopK rewrite + MV rewrite rules
  *    under test ride every session.
  */
object GraftSession {

  def baseBuilder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Pool name for latency-sensitive queries under [[serviceBuilder]];
    * submit with `spark.sparkContext.setLocalProperty("spark.scheduler
    * .pool", interactivePool)` on the serving thread. */
  val interactivePool = "interactive"

  /** The MIXED-WORKLOAD session: [[baseBuilder]] plus FAIR scheduler
    * pools. A session serving interactive probes alongside batch jobs
    * must not run the default FIFO scheduler: FIFO hands every freed
    * task slot to the earliest submitted job, so a probe submitted
    * behind a wide batch stage waits for that stage's whole pending-task
    * queue. Measured (ConcurrencyProf, round 12): with a 2048-pending-
    * task batch stage in flight, probe p95 is 8.3 s under FIFO vs 82 ms
    * with the probe thread in its own FAIR pool — p50 is unaffected
    * either way, so the cliff is invisible until stages outnumber slots
    * (i.e. invisible at fixture scale, guaranteed at corpus scale).
    * Unnamed pools are created on demand with equal weight; callers tag
    * latency-sensitive threads with [[interactivePool]]. */
  def serviceBuilder(cpus: String): SparkSession.Builder =
    baseBuilder(cpus)
      .config("spark.scheduler.mode", "FAIR")
}
