package graft

import graft.operators.EventAnalytics
import graft.plans.MaterializedViews
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Pins the transparent materialized-view rewrite (plans/MaterializedView
  * .scala): substitution on exact canonical match, composition of
  * operators above the matched subtree, non-matching plans untouched,
  * and clean restore on clear(). */
class MaterializedViewSpec extends GraftSpec {

  private def mvScans(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten.filter(_.contains("graft-mvspec"))

  private def withMv[A](body: String => A): A = {
    val path = java.nio.file.Files.createTempDirectory("graft-mvspec").toString + "/hourly"
    MaterializedViews.register("spec_hourly",
      EventAnalytics.eventCountHourlyDef(spark, sfDir), path)
    try body(path) finally MaterializedViews.clear()
  }

  test("an exactly re-stated query is answered from the materialization") {
    val base = EventAnalytics.eventCountHourly(spark, sfDir).collect().toSeq
    withMv { _ =>
      val rewritten = EventAnalytics.eventCountHourly(spark, sfDir)
      assert(mvScans(rewritten).nonEmpty, "expected the MV scan in the plan")
      assert(rewritten.collect().toSeq == base,
        "the rewrite must be row-identical to the base plan")
    }
    // clear() restores the ordinary plan
    assert(mvScans(EventAnalytics.eventCountHourly(spark, sfDir)).isEmpty)
  }

  test("non-intrusive operators above the match (sort, limit) compose over it") {
    val base = EventAnalytics.eventCountHourlyDef(spark, sfDir)
      .orderBy(desc("cnt"), col("hour_start")).limit(5).collect().toSeq
    withMv { _ =>
      val df = EventAnalytics.eventCountHourlyDef(spark, sfDir)
        .orderBy(desc("cnt"), col("hour_start")).limit(5)
      assert(mvScans(df).nonEmpty,
        "the definition subtree under sort+limit must still match")
      assert(df.collect().toSeq == base)
    }
  }

  test("non-matching plans are untouched — including pushed-into subtrees") {
    withMv { _ =>
      // different window width → different canonical subtree
      val sliding = EventAnalytics.eventCountSliding(spark, sfDir)
      assert(mvScans(sliding).isEmpty, "sliding-window query must not match")
      // a predicate INSIDE the subtree (on the base table) breaks the
      // match: the pushed filter changes the canonical form
      val narrowed = Tables.events(spark, sfDir)
        .filter(col("event_type") === "error")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("hour_start"), col("cnt"))
      assert(mvScans(narrowed).isEmpty, "narrowed aggregate must not match")
      // a CONSUMING filter gets pushed into the subtree by the main
      // optimizer before the rule runs — same outcome, exactness wins
      // over coverage (the documented trade)
      val consuming = EventAnalytics.eventCountHourlyDef(spark, sfDir)
        .filter(col("cnt") > 1)
      assert(mvScans(consuming).isEmpty,
        "a pushed consuming filter must break the exact match")
      assert(consuming.count() > 0, "and the ordinary plan still answers it")
    }
  }

  test("the SQL entry path rewrites too (same canonical plan, same MV)") {
    // a spark.sql user re-stating the view definition gets the same
    // substitution — the parser lowers to the same canonical subtree
    Tables.events(spark, sfDir).createOrReplaceTempView("mv_events")
    // queryExecution memoizes, so build a FRESH frame per inspection
    def sql() = spark.sql(
      """SELECT window.start AS hour_start, count(*) AS cnt
         FROM (SELECT window(ts, '1 hour') AS window FROM mv_events)
         GROUP BY window ORDER BY hour_start""")
    val base = EventAnalytics.eventCountHourly(spark, sfDir)
    // precondition: both entries really share one optimized plan
    assert(sql().queryExecution.optimizedPlan.canonicalized ==
      base.queryExecution.optimizedPlan.canonicalized,
      "SQL and DataFrame forms must converge for this pin to be meaningful")
    withMv { _ =>
      val rewritten = sql()
      assert(mvScans(rewritten).nonEmpty, "the SQL-stated query must rewrite")
      assert(rewritten.collect().toSeq == base.collect().toSeq)
    }
  }

  test("a join-shaped definition (not just aggregates) substitutes too") {
    // matching is plan-shape-agnostic: any canonical subtree works.
    // Definition: the customer→nation dimension join q4/q9 use.
    def dims() = Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_nationkey")
      .join(Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name")
    val path = java.nio.file.Files.createTempDirectory("graft-mvspec").toString + "/dims"
    MaterializedViews.register("spec_dims", dims(), path)
    try {
      val q = dims().orderBy("c_custkey").limit(10)
      assert(mvScans(q).nonEmpty, "the join subtree must substitute")
      MaterializedViews.clear()
      assert(q.collect().toSeq ===
        dims().orderBy("c_custkey").limit(10).collect().toSeq)
    } finally MaterializedViews.clear()
  }

  test("register materializes before publishing; refresh is re-register") {
    withMv { path =>
      // the parquet exists and holds exactly the definition's rows
      val mv = spark.read.parquet(path)
      assert(mv.count() ==
        EventAnalytics.eventCountHourlyDef(spark, sfDir).count())
    }
  }

  test("re-register (refresh) with the same name and path succeeds " +
       "and serves the NEW definition") {
    // The failure mode this pins: with the old entry still published
    // during the refresh write, MVRewrite rewrote the write's own plan
    // to scan the files being overwritten → FAILED_READ_FILE on a
    // same-path refresh, silent staleness on a different path.
    val path = java.nio.file.Files
      .createTempDirectory("graft-mvspec").toString + "/refresh"
    def defn() = EventAnalytics.eventCountHourlyDef(spark, sfDir)
    try {
      MaterializedViews.register("spec_refresh", defn(), path)
      val v1 = spark.read.parquet(path).count()
      // refresh: same name, same path, same canonical — must not read
      // the files it deletes, must repopulate completely
      MaterializedViews.register("spec_refresh", defn(), path)
      assert(spark.read.parquet(path).count() == v1,
        "refresh must rematerialize the full definition")
      // and the refreshed entry still matches user queries (the
      // canonical must be captured in BASE-TABLE form, not from a
      // rewritten plan)
      val q = EventAnalytics.eventCountHourly(spark, sfDir)
      assert(mvScans(q).nonEmpty, "post-refresh query must still rewrite")
      // refresh under a DIFFERENT name with the same canonical: the
      // same-canonical sibling entry must not hijack the write either
      val path2 = java.nio.file.Files
        .createTempDirectory("graft-mvspec").toString + "/refresh2"
      MaterializedViews.register("spec_refresh_b", defn(), path2)
      assert(spark.read.parquet(path2).count() == v1,
        "sibling registration must materialize from base tables")
    } finally MaterializedViews.clear()
  }

  test("pre-filter soundness: canonicalization preserves the root class " +
       "of every node the optimizer emits") {
    // The class+arity pre-filter compares the query node's OWN class
    // against the entry's CANONICAL class (MaterializedView.scala Entry
    // scaladoc). That is sound iff doCanonicalize never changes a node's
    // root class in optimizer output. Verify it over a corpus spanning
    // the shapes the registry exercises: aggregate+window (MV
    // definition), join chain, window function, sort+limit, union,
    // distinct, expand (cube).
    import graft.operators.{EventAnalytics, Relational}
    val corpus = Seq(
      EventAnalytics.eventCountHourlyDef(spark, sfDir),
      Relational.q4NationCount(spark, sfDir),
      Relational.q13RunningRevenue(spark, sfDir),
      Tables.events(spark, sfDir).select("event_type").distinct().limit(3),
      Tables.events(spark, sfDir).select("event_type")
        .union(Tables.events(spark, sfDir).select("props"))
        .orderBy("event_type").limit(5),
      Tables.events(spark, sfDir)
        .cube(col("event_type"), col("user_id")).agg(count(lit(1)).as("c")))
    val violations = corpus.flatMap { df =>
      df.queryExecution.optimizedPlan.collect {
        case n if n.canonicalized.getClass != n.getClass =>
          s"${n.getClass.getSimpleName} -> ${n.canonicalized.getClass.getSimpleName}"
      }
    }
    assert(violations.isEmpty,
      s"doCanonicalize changed a root class — the MVRewrite pre-filter " +
      s"would skip valid rewrites for: ${violations.mkString(", ")}")
  }

  test("matching cost is bounded: a walk with no shape-compatible node " +
       "performs ZERO canonicalizations") {
    withMv { _ =>
      val entryShapes = MaterializedViews.all
        .map(e => (e.rootClass, e.rootArity)).toSet
      // a probe whose every node fails the class+arity pre-filter —
      // verified against the registered entries, not assumed
      val probe = Tables.events(spark, sfDir)
        .select("ts", "event_type", "user_id")
      val nodes = probe.queryExecution.analyzed.collect { case n => n }
      MaterializedViews.canonicalizeAttempts.reset()
      val opt = probe.queryExecution.optimizedPlan // forces the rule
      assert(opt.collect { case n
          if entryShapes.contains((n.getClass, n.output.size)) => n }.isEmpty,
        "probe invalid: a node passes the pre-filter; pick another probe")
      assert(MaterializedViews.canonicalizeAttempts.sum() == 0,
        s"expected zero canonicalizations on a shape-incompatible walk " +
        s"(${nodes.size} nodes)")
      // sanity: a genuinely matching query does pay (bounded) attempts
      MaterializedViews.canonicalizeAttempts.reset()
      val hit = EventAnalytics.eventCountHourly(spark, sfDir)
      assert(mvScans(hit).nonEmpty)
      assert(MaterializedViews.canonicalizeAttempts.sum() > 0,
        "instrument must count the real match attempt")
    }
  }
}
