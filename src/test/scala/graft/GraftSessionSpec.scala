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
}
