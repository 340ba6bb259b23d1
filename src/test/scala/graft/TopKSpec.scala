package graft

import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: TopKRewrite + GraftTopKExec
  * (bounded-PQ top-k, SURVEY O5 / mandate rung (c)). */
class TopKSpec extends GraftSpec {

  private val excludeKey = "spark.sql.optimizer.excludedRules"

  test("rewrite plants the two-phase bounded-PQ operator under rank filters") {
    val plan = graft.operators.PageRank.topkByGroup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPartial"), plan)
    assert(plan.contains("GraftTopKFinal"), plan)
    // the partial pass runs BEFORE the exchange: at scale each task
    // forwards at most k rows per key into the shuffle
    val partialIdx = plan.indexOf("GraftTopKPartial")
    val exchangeIdx = plan.lastIndexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      s"partial must sit below the shuffle:\n$plan")
  }

  test("rank equality (argmax-per-group) also lowers to the bounded PQ") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("a", 3L), ("a", 7L), ("b", 5L), ("a", 1L)).toDF("g", "v")
      .withColumn("rnk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(desc("v"))))
      .filter(col("rnk") === 1)
    assert(df.queryExecution.executedPlan.toString.contains("GraftTopK"))
    assert(df.select("g", "v").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == Set(("a", 7L), ("b", 5L)))
  }

  test("global (unpartitioned) rank filters are not rewritten and still run") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("a", 3L), ("b", 7L), ("c", 5L)).toDF("g", "v")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(desc("v"))))
      .filter(col("rnk") <= 2)
    assert(!df.queryExecution.executedPlan.toString.contains("GraftTopK"))
    assert(df.select("g").collect().map(_.getString(0)).toSet == Set("b", "c"))
  }

  test("windows without a rank bound are left untouched") {
    val plan = graft.operators.Relational.q13RunningRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("GraftTopK"), plan)
  }

  test("rewritten plan returns exactly the stock plan's rows") {
    def run() = graft.operators.PageRank.topkByGroup(spark, sfDir).collect().toSeq
    val rewritten = run()
    spark.conf.set(excludeKey, "graft.plans.TopKRewrite")
    try {
      val stockPlan = graft.operators.PageRank.topkByGroup(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!stockPlan.contains("GraftTopK"), "exclusion did not disable the rule")
      assert(run() == rewritten)
    } finally spark.conf.unset(excludeKey)
  }

  test("partial-pass key-cardinality overflow degrades gracefully, stays exact") {
    val sp = spark
    import sp.implicits._
    val prev = graft.plans.GraftTopKExec.maxPartialRows
    // key cap = maxPartialRows / k = 6/3 = 2 — force overflow: >2 keys/task
    graft.plans.GraftTopKExec.maxPartialRows = 6L
    try {
      val df = (0 until 400).map(i => (s"g${i % 20}", i.toLong)).toDF("g", "v")
        .withColumn("rnk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(desc("v"))))
        .filter(col("rnk") <= 3)
      assert(df.queryExecution.executedPlan.toString.contains("GraftTopKPartial"))
      val got = df.select("g", "v").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // note: .toSeq before flatMap — Map.flatMap over pair results
      // rebuilds a Map and collapses the 3 rows per key to 1
      val want = (0 until 400).map(i => (s"g${i % 20}", i.toLong))
        .groupBy(_._1).toSeq.flatMap { case (_, rs) => rs.sortBy(-_._2).take(3) }.toSet
      assert(got == want)
    } finally graft.plans.GraftTopKExec.maxPartialRows = prev
  }

  test("randomized differential: bounded PQ == driver reference over 20 seeded shapes") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(4242)
    for (trial <- 1 to 20) {
      val nRows = 1 + rng.nextInt(500)
      val nKeys = 1 + rng.nextInt(12)
      val k = 1 + rng.nextInt(6)
      val rows = (0 until nRows).map { i =>
        (s"k${rng.nextInt(nKeys)}", rng.nextInt(40).toLong, i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
        .withColumn("rnk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(desc("v"), col("id"))))
        .filter(col("rnk") <= k)
      assert(df.queryExecution.executedPlan.toString.contains("GraftTopK"),
        s"trial $trial not lowered")
      val got = df.select("g", "v", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(k)
      }.toSet
      assert(got == want, s"trial $trial (n=$nRows keys=$nKeys k=$k) diverged")
    }
  }

  test("randomized differential: rank-equality filter + duplicate sort keys") {
    // the rank = k rewrite (argmax-per-group generalized) is only
    // correct on TOTAL orders — ties broken by id here, with heavy
    // duplicate pressure on the primary sort key so the tiebreak is
    // load-bearing in most groups
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(20250813)
    for (trial <- 1 to 20) {
      val nRows = 1 + rng.nextInt(400)
      val nKeys = 1 + rng.nextInt(10)
      val k = 1 + rng.nextInt(5)
      val rows = (0 until nRows).map { i =>
        (s"k${rng.nextInt(nKeys)}", rng.nextInt(5).toLong, i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
        .withColumn("rnk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(desc("v"), col("id"))))
        .filter(col("rnk") === k)
      assert(df.queryExecution.executedPlan.toString.contains("GraftTopK"),
        s"trial $trial not lowered")
      assert(df.queryExecution.sparkSession.sessionState.conf
        .getConfString(excludeKey, "") == "", "rule must be active for this test")
      val got = df.select("g", "v", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // groups smaller than k contribute nothing — slice handles that
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._2, r._3)).slice(k - 1, k)
      }.toSet
      assert(got == want, s"trial $trial (n=$nRows keys=$nKeys k=$k) diverged")
    }
  }

  test("bounded-PQ agrees with a driver-side reference on adversarial groups") {
    val sp = spark
    import sp.implicits._
    // skewed groups, duplicate order values (ties broken by id — total
    // order), one singleton group, one group smaller than k
    val rows = (0 until 2000).map { i =>
      val g = if (i < 1500) "hot" else if (i < 1999) s"g${i % 7}" else "solo"
      (g, (i * 37 % 101).toDouble, i.toLong)
    }
    val df = rows.toDF("g", "v", "id")
    val k = 5
    val got = df.withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(desc("v"), col("id"))))
      .filter(col("rnk") <= k)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(df.queryExecution.sparkSession.sessionState.conf
      .getConfString(excludeKey, "") == "", "rule must be active for this test")
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(k).zipWithIndex
        .map { case ((_, v, id), i) => (g, v, id, i + 1) }
    }.toSet
    assert(got == want)
  }
}
