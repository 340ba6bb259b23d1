package graft

/** Pins the shared session builder's deployment confs on a LIVE session
  * built from it (r7 verdict #8: the bypass-merge lesson must survive a
  * builder refactor — since Bench, Verify, and TestSession all start
  * from GraftSession.baseBuilder, asserting here covers all three). */
class GraftSessionSpec extends GraftSpec {

  test("bypassMergeThreshold is pinned to the session's core count " +
       "(the r7 sf3 shuffle-cliff fix)") {
    assert(spark.conf.get("spark.shuffle.sort.bypassMergeThreshold") == "4",
      "the bypass-merge pin fell out of GraftSession.baseBuilder — " +
      "iterative repartition loops will hit the mappers×reducers " +
      "file-open cliff again (r7: PPR sf3 40s vs 4.4s)")
  }

  test("shuffle partitions match core count and the session runs UTC") {
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "non-UTC session: every timestamp hash vs the DuckDB oracle drifts")
  }

  test("the graft extensions ride the shared builder") {
    assert(spark.conf.get("spark.sql.extensions")
      .contains("graft.plans.GraftExtensions"))
  }

  test("serviceBuilder layers FAIR pools on the base confs (mixed-workload rule)") {
    // inspect the builder's conf map WITHOUT building a second context:
    // getOrCreate on a live-context JVM would silently return the
    // existing session and vacuously pass
    val builder = GraftSession.serviceBuilder("4")
    def optionMaps(obj: AnyRef): Seq[scala.collection.Map[String, String]] = {
      def fields(c: Class[_]): Seq[java.lang.reflect.Field] =
        if (c == null) Nil else c.getDeclaredFields.toSeq ++ fields(c.getSuperclass)
      fields(obj.getClass).flatMap { f =>
        f.setAccessible(true)
        f.get(obj) match {
          case m: scala.collection.Map[_, _] =>
            Some(m.asInstanceOf[scala.collection.Map[String, String]])
          case _ => None
        }
      }
    }
    val maps = optionMaps(builder)
    assert(maps.nonEmpty, "no conf map found on SparkSession.Builder — " +
      "Spark internals moved; re-anchor this pin")
    val opts: scala.collection.Map[String, String] =
      maps.find(_.contains("spark.scheduler.mode")).getOrElse(maps.head)
    assert(opts.get("spark.scheduler.mode").contains("FAIR"),
      "serviceBuilder lost the FAIR pin — interactive p95 under a wide " +
      "batch stage regresses 100x (ConcurrencyProf, round 12)")
    assert(opts.get("spark.sql.session.timeZone").contains("UTC") &&
      opts.get("spark.sql.extensions").exists(_.contains("GraftExtensions")),
      "serviceBuilder no longer starts from baseBuilder")
  }

  test("Verify runs the service posture and the probe family is registered " +
       "(r12 verdict item 7)") {
    // the gate's builder IS serviceBuilder: same reflection probe as
    // above, on the builder Verify.main actually constructs
    val maps = {
      def fields(c: Class[_]): Seq[java.lang.reflect.Field] =
        if (c == null) Nil else c.getDeclaredFields.toSeq ++ fields(c.getSuperclass)
      val b = Verify.builder("4")
      fields(b.getClass).flatMap { f =>
        f.setAccessible(true)
        f.get(b) match {
          case m: scala.collection.Map[_, _] =>
            Some(m.asInstanceOf[scala.collection.Map[String, String]])
          case _ => None
        }
      }
    }
    assert(maps.exists(_.get("spark.scheduler.mode").contains("FAIR")),
      "Verify dropped the FAIR service session — the interactive pool " +
        "is no longer exercised on gate runs")
    // every declared interactive probe must be a REGISTERED query, or
    // the pool tagging silently covers nothing (the stale-exclusion
    // lesson from BenchFormatSpec)
    val missing = graft.operators.InvertedIndex.interactiveProbeNames
      .filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"interactive probe names not in the registry: $missing")
    assert(graft.operators.InvertedIndex.interactiveProbeNames.nonEmpty)
  }
}
