package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{name:sec,...},"sf":dir}
  *
  * Each query is warmed once on sf0.001 (JIT + codegen cache + file
  * listing) and then timed on the target scale factor with a noop-sink
  * write, which executes the FULL physical plan — `count()` would let
  * Catalyst eliminate top-level sorts and undercount the real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B hook for custom rewrites (e.g. graft.plans.TopKRewrite)
    sys.env.get("SPARK_GRAFT_EXCLUDE_RULES")
      .foreach(spark.conf.set("spark.sql.optimizer.excludedRules", _))

    def exec(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // explicit failure sentinel — a broken query must not
               // read as a fast query in the JSON line
      }
    }

    // the dedup/index/PPR families memoize shared prefixes (shingle
    // table, pair graph, persisted index, pre-partitioned graph) per
    // (session, dir); clearing between runs keeps min-of-two honest —
    // run 2 must re-pay the shared build, not report a memo hit as the
    // query's cost. Within a run the first family query carries the
    // shared-prefix cost and the rest reuse it, which is the intended
    // production shape (build once, consume many).
    def clearMemos(): Unit = {
      graft.operators.Dedup.clearMemos()
      graft.operators.InvertedIndex.clearMemos()
      graft.operators.PageRank.clearMemos()
    }

    // _csv queries are the dual-format parity surface — same logical
    // plans as their parquet twins over a text re-materialization — and
    // the two all-pairs baselines are the size-guarded quadratic
    // correctness anchors behind the banded near-dup defaults; timing
    // either family would double-count the workload and bloat the JSON
    // line. The baselines are excluded by NAME: r4's endsWith("_exact")
    // also matched dedup_exact — the production md5 dedup — and silently
    // dropped it from the bench.
    // SPARK_GRAFT_BENCH_FILTER (regex) narrows the set for local
    // iteration; the driver runs unfiltered.
    val allPairsBaselines = Set("dedup_embedding_exact", "doc_embedding_exact")
    // trending_arrivals_late is the streaming operator's registered
    // parity harness: a driver-fed MemoryStream replay whose cost is
    // ~10 micro-batch state-store round-trips, not engine throughput —
    // the batch semantics it must reproduce are already timed as
    // trending_arrivals. Like the _csv twins it would double-count a
    // workload the bench already measures.
    val parityHarnesses = Set("trending_arrivals_late")
    val nameFilter = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILTER", ".*")
    val names = SparkEntry.queries.keys.toSeq
      .filterNot(n => n.endsWith("_csv") || allPairsBaselines(n) || parityHarnesses(n))
      .filter(_.matches(nameFilter)).sorted
    // each family's shared artifacts are timed as their OWN metric
    // (dedup_family_build / ppr_family_build) at the head of each run, so
    // family queries report marginal cost instead of whichever member
    // runs first absorbing the shared build (per-query numbers stop
    // depending on bench order). Gating is on the families' declared
    // member sets, not name prefixes.
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try { body; (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }
    val families: Seq[(String, Set[String], String => Double)] = Seq(
      ("dedup_family_build", graft.operators.Dedup.familyMembers,
        (dir: String) => timed(graft.operators.Dedup.buildFamilyArtifacts(spark, dir))),
      ("ppr_family_build", graft.operators.PageRank.familyMembers,
        (dir: String) => timed(graft.operators.PageRank.buildFamilyArtifacts(spark, dir))))
      .collect { case f @ (_, members, _) if names.exists(members) => f }

    names.foreach(exec(_, warmDir)) // warm-up at the smallest SF
    clearMemos()
    // two timed runs, keep the min — absorbs GC/JIT noise between queries
    val builds1 = families.map { case (m, _, run) => m -> run(sfDir) }
    val run1 = names.map(n => n -> exec(n, sfDir)).toMap
    clearMemos()
    val builds2 = families.map { case (m, _, run) => m -> run(sfDir) }.toMap
    def fold(a: Double, b: Double): Double =
      if (a < 0 || b < 0) -1.0 else math.min(a, b)
    val run2 = names.map { n => n -> exec(n, sfDir) }.toMap
    val results0 = names.map { n => n -> fold(run1(n), run2(n)) }
    val results =
      builds1.map { case (m, b1) => m -> fold(b1, builds2(m)) } ++ results0
    // per-query spread between the two runs (|t1 − t2|), reported only
    // above a 50 ms noise floor so the JSON line stays inside the
    // harness's stdout tail window: a future regression adjudication
    // (like r3's stripes flag) can tell run-to-run noise from a real
    // movement without a re-run. The per-query numbers stay on min.
    val spread = names
      .map(n => n -> math.abs(run1(n) - run2(n)))
      .filter { case (n, d) => run1(n) >= 0 && run2(n) >= 0 && d >= 0.05 }
    // millisecond precision: keeps the full line under the harness's
    // 2000-char stdout tail window so every per-query number is parseable
    // (9-dp doubles pushed the 60+-query line past it); if the query set
    // grows the line past the window even at 3dp, degrade to 2dp rather
    // than let the tail truncate the JSON
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma-decimal locale (de_DE, fr_FR) would emit invalid JSON
    def line(dp: Int): String = {
      def fmt(v: Double): String =
        if (v < 0) "-1"
        else String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
      def obj(kvs: Seq[(String, Double)]): String =
        kvs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${obj(results)},""" +
        s""""spread":${obj(spread)},"sf":"$sfDir"}"""
    }
    val out = line(3)
    println(if (out.length <= 1990) out else line(2))
    spark.stop()
  }
}
