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

    // the dedup/index families memoize shared prefixes (shingle table,
    // pair graph, persisted index) per (session, dir); clearing between
    // runs keeps min-of-two honest — run 2 must re-pay the shared build,
    // not report a memo hit as the query's cost. Within a run the first
    // family query carries the shared-prefix cost and the rest reuse it,
    // which is the intended production shape (build once, consume many).
    def clearMemos(): Unit = {
      graft.operators.Dedup.clearMemos()
      graft.operators.InvertedIndex.clearMemos()
    }

    // _csv queries are the dual-format parity surface — same logical
    // plans as their parquet twins over a text re-materialization — and
    // _exact queries are the size-guarded quadratic correctness baselines
    // behind the banded near-dup defaults; timing either family would
    // double-count the workload and bloat the JSON line.
    // SPARK_GRAFT_BENCH_FILTER (regex) narrows the set for local
    // iteration; the driver runs unfiltered.
    val nameFilter = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILTER", ".*")
    val names = SparkEntry.queries.keys.toSeq
      .filterNot(n => n.endsWith("_csv") || n.endsWith("_exact"))
      .filter(_.matches(nameFilter)).sorted
    // the dedup family's shared artifacts are timed as their OWN metric
    // (dedup_family_build) at the head of each run, so family queries
    // report marginal cost instead of whichever member runs first
    // absorbing the shared build (per-query numbers stop depending on
    // bench order)
    def execBuild(dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        graft.operators.Dedup.buildFamilyArtifacts(spark, dir)
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }
    val timeFamily = names.exists(_.startsWith("dedup"))

    names.foreach(exec(_, warmDir)) // warm-up at the smallest SF
    clearMemos()
    // two timed runs, keep the min — absorbs GC/JIT noise between queries
    val build1 = if (timeFamily) execBuild(sfDir) else -1.0
    val run1 = names.map(n => n -> exec(n, sfDir)).toMap
    clearMemos()
    val build2 = if (timeFamily) execBuild(sfDir) else -1.0
    val results0 = names.map { n =>
      val t2 = exec(n, sfDir)
      n -> (if (run1(n) < 0 || t2 < 0) -1.0 else math.min(run1(n), t2))
    }
    val results =
      if (timeFamily)
        ("dedup_family_build" ->
          (if (build1 < 0 || build2 < 0) -1.0 else math.min(build1, build2))) +: results0
      else results0
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
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    val out = line(3)
    println(if (out.length <= 1990) out else line(2))
    spark.stop()
  }
}
