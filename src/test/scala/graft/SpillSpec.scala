package graft


/** Durable spill-path pins (r11 verdict item 1): the suite-level half of
  * the certification. SpillProf (its own JVM) proves the families spill
  * under a REAL MemoryManager cap; this spec pins the mechanism on every
  * `sbt test` run using the runtime-settable per-operator buffer
  * thresholds — the window and sort-merge-join buffers are forced to
  * spill after a handful of rows, spill bytes are observed via task
  * metrics, and the results stay byte-identical to the unconstrained
  * plan. At 100 TB these buffers WILL cross their thresholds; the pin is
  * that crossing them changes the I/O path, never the answer. */
class SpillSpec extends GraftSpec {

  private def query(name: String) = SparkEntry.queries(name)(spark, sfDir)

  /** Run `body` with confs set, restoring previous values after. */
  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def spillOf(body: => Unit): Long = {
    val c = new SpillCounter
    spark.sparkContext.addSparkListener(c)
    try { body; c.settled() }
    finally spark.sparkContext.removeSparkListener(c)
  }

  test("WindowExec spills to disk under forced buffer thresholds and the " +
      "running-revenue result is byte-identical") {
    val want = ResultHash.of(query("q13_running_revenue"))
    val baseline = spillOf(ResultHash.of(query("q13_running_revenue")))
    assert(baseline == 0L, s"unconstrained window run should not spill, got $baseline")
    var got: (String, Long) = ("", 0L)
    var spilled = 0L
    withConfs(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "2",
      "spark.sql.windowExec.buffer.spill.threshold" -> "2") {
      spilled = spillOf { got = ResultHash.of(query("q13_running_revenue")) }
    }
    assert(spilled > 0L, "forced window thresholds must engage the spill path")
    assert(got == want, "window spill path changed the result")
  }

  test("SortMergeJoin buffered side spills under forced thresholds and the " +
      "supplier-keyed dim-fact merge join is byte-identical") {
    import org.apache.spark.sql.functions._
    // the buffered-side shape that actually spills at 100 TB: a
    // high-multiplicity join key (supplier) whose buffered match group
    // is hundreds of fact rows, probed ONCE per key. The two inverse
    // shapes both degenerate (measured while building this pin, both
    // OOM-ing an 8 GB suite heap): thousands of 2-row groups each
    // instantiate their own sorter (page-allocation churn), and a
    // many-row probe side re-opens every spill reader per probe row
    // (read-ahead buffer churn) — spill tuning belongs on few, large,
    // once-iterated groups
    def dimFactMerge() = {
      val li = graft.Tables.lineitem(spark, sfDir)
        .select(col("l_suppkey"), col("l_quantity"))
      val sup = li.select(col("l_suppkey").as("s_key")).distinct()
      sup.hint("merge")
        .join(li.hint("merge"), col("s_key") === col("l_suppkey"))
        .groupBy(col("s_key"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("qty_sum"))
    }
    val want = ResultHash.of(dimFactMerge())
    var got: (String, Long) = ("", 0L)
    var spilled = 0L
    withConfs(
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "64") {
      spilled = spillOf { got = ResultHash.of(dimFactMerge()) }
    }
    assert(spilled > 0L, "forced SMJ thresholds must engage the spill path")
    assert(got == want, "SMJ spill path changed the result")
  }

  test("hash aggregate's sort-based fallback path is byte-identical " +
      "(wordcount + pmi_pairs under testFallbackStartsAt)") {
    // the agg fallback (hash map hits its memory bound → switch to
    // sort-based aggregation) is the spill seam SpillProf drives with a
    // real memory cap; here the runtime fallback conf pins that the
    // SORT-BASED path — the one that runs at 100 TB key cardinalities —
    // produces the identical answer on every sbt test run
    val wantWc = ResultHash.of(query("wordcount"))
    val wantPmi = ResultHash.of(query("pmi_pairs"))
    // fallback after a few thousand map keys: low enough that the
    // corpus vocabularies cross it (both queries' agg maps exceed it),
    // high enough that the KV sorter holds a handful of spill runs — a
    // "2, 3" fallback makes one spill file per 2 keys and the merge
    // phase OOMs on read-ahead buffers before any result
    withConfs("spark.sql.TungstenAggregate.testFallbackStartsAt" -> "2000, 4000") {
      assert(ResultHash.of(query("wordcount")) == wantWc,
        "sort-based agg fallback changed wordcount")
      assert(ResultHash.of(query("pmi_pairs")) == wantPmi,
        "sort-based agg fallback changed pmi_pairs")
    }
  }
}
