package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Pins the DataSourceV2 generator source (graft.sources) — the three
  * scale behaviors a custom source must get right (partition planning,
  * filter-pushdown partition pruning, column pruning) plus value
  * parity with the closed-form Lehmer derivation the oracle uses. */
class SourcesSpec extends GraftSpec {

  private def synth(rows: Long, partitions: Int) =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", partitions).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    df.write.format("noop").mode("overwrite").save()
    physicalNodes(df).collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
  }

  test("values match the closed-form Lehmer derivation") {
    val got = synth(1000, 4).filter(col("id") < 20).orderBy("id").collect()
    assert(got.length == 20)
    got.foreach { r =>
      val id = r.getLong(0)
      val x = id * 48271L % 2147483647L
      assert(r.getInt(1) == (x % 100).toInt, "bucket")
      assert(r.getInt(2) == (x % 1000).toInt, "score")
      assert(r.getDouble(3) == x.toDouble / 2147483647L, "value")
      assert(r.getString(4) == "t" + (x % 7), "tag")
    }
  }

  test("partition planning: slices are contiguous, equal-width, complete") {
    val df = synth(100000, 10)
    assert(df.rdd.getNumPartitions == 10)
    assert(df.count() == 100000)
    // per-partition row counts are balanced (equal width by design)
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.toSet == Set(10000))
  }

  test("filter pushdown prunes whole partitions, residual keeps results exact") {
    // id < 1000 over 10 slices of 10,000 -> only slice 0 is planned
    val pruned = synth(100000, 10).filter(col("id") < 1000)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 1000)
    // equality predicate -> a single one-row slice
    val point = synth(100000, 10).filter(col("id") === 54321L)
    assert(point.rdd.getNumPartitions == 1)
    assert(point.collect().map(_.getLong(0)).toSeq == Seq(54321L))
    // a range crossing a slice boundary keeps exactly the two slices
    val two = synth(100000, 10).filter(col("id") >= 9990L && col("id") <= 10009L)
    assert(two.rdd.getNumPartitions == 2)
    assert(two.count() == 20)
    // predicates on DERIVED columns don't prune (they're residual-only):
    // results stay exact against a brute recompute on the driver
    val derived = synth(1000, 4).filter(col("bucket") === 7)
    assert(derived.rdd.getNumPartitions == 4)
    val expected = (0L until 1000L).count(id => id * 48271L % 2147483647L % 100 == 7)
    assert(derived.count() == expected)
  }

  test("column pruning reaches the scan: only requested fields are computed") {
    val df = synth(10000, 4).select("bucket")
    assert(scanOf(df).output.map(_.name) == Seq("bucket"))
    // and the pushed id-filter is visible on the scan while pruning holds
    val both = synth(10000, 4).filter(col("id") < 100).select("tag")
    val scan = scanOf(both)
    assert(scan.output.map(_.name).forall(Set("tag", "id")),
      s"unexpected scan columns: ${scan.output.map(_.name)}")
    assert(!scan.output.map(_.name).contains("value"))
  }

  test("limit pushdown truncates the planned interval; residual filters block it") {
    val bare = synth(100000, 10).limit(7)
    assert(bare.collect().length == 7)
    assert(scanOf(bare).scan.description().contains("range=[0,7)"))
    // limit composes with a CONSUMED id-range filter (interval first
    // narrows to [5000,100000), then truncates to its first 7 ids)
    val ranged = synth(100000, 10).filter(col("id") >= 5000L).limit(7)
    assert(ranged.collect().map(_.getLong(0)).toSeq == (5000L until 5007L))
    assert(scanOf(ranged).scan.description().contains("range=[5000,5007)"))
    // a derived-column predicate stays residual -> its FilterExec
    // blocks the limit push and the scan keeps the full interval
    val blocked = synth(100000, 10).filter(col("bucket") === 7).limit(3)
    assert(blocked.collect().length == 3)
    assert(scanOf(blocked).scan.description().contains("range=[0,100000)"))
  }

  test("complete COUNT(*)/MIN(id)/MAX(id) pushdown answers at planning time") {
    val counted = synth(100000, 10).filter(col("id") < 1234L).groupBy().count()
    assert(counted.collect().map(_.getLong(0)).toSeq == Seq(1234L))
    assert(scanOf(counted).scan.description().contains("agg=count"),
      "COUNT(*) was not completely pushed")
    // min/max of the monotone id column compose with a consumed range
    // filter; the whole answer comes from the pruned interval
    val mm = synth(100000, 10).filter(col("id") >= 500L && col("id") < 2000L)
      .agg(min("id").as("mn"), max("id").as("mx"), count(lit(1)).as("n"))
    val r = mm.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((500L, 1999L, 1500L)))
    assert(scanOf(mm).scan.description().contains("agg=min_id,max_id,count"))
    // empty interval: count 0, min/max NULL — one row, like any SQL agg
    val empty = synth(1000, 4).filter(col("id") < 0L)
      .agg(count(lit(1)).as("n"), min("id").as("mn"))
    val e = empty.collect().head
    assert(e.getLong(0) == 0L && e.isNullAt(1))
    // grouped aggregates and min/max of DERIVED columns are declined:
    // computed from generated rows, still exact
    val grouped = synth(1000, 4).groupBy("tag").count()
    assert(grouped.collect().map(_.getLong(1)).sum == 1000L)
    assert(!scanOf(grouped).scan.description().contains("agg="))
    val derived = synth(1000, 4).agg(min("bucket"))
    assert(derived.collect().head.getInt(0) ==
      (0L until 1000L).map(id => (id * 48271L % 2147483647L % 100).toInt).min)
    assert(!scanOf(derived).scan.description().contains("agg="))
  }

  test("generation partitions read columnar; the pushed-count partition stays row-based") {
    // normal scans take the vectorized path (values cross into codegen
    // via ColumnarToRow, like parquet's vectorized reader) — the
    // derivation test above already value-checks this path end-to-end
    val scan = scanOf(synth(10000, 4).filter(col("id") < 5000L))
    assert(scan.supportsColumnar, "generation scan should be columnar")
    // batch boundaries (4096) must not show at row level: exact count
    // and exact sum across a 3-batch partition
    val df = synth(10000, 1)
    assert(df.count() == 10000) // count pushdown: single row-based partition
    val agg = df.agg(sum("score")).collect().head.getLong(0)
    val brute = (0L until 10000L).map(id => id * 48271L % 2147483647L % 1000).sum
    assert(agg == brute)
    val counted = synth(10000, 4).groupBy().count()
    assert(!scanOf(counted).supportsColumnar, "count(*) scan should be row-based")
  }

  test("SQL DDL entry: CREATE TABLE ... USING graft-synth resolves and pushes down") {
    spark.sql("DROP TABLE IF EXISTS synth_sql")
    spark.sql(
      "CREATE TABLE synth_sql USING `graft-synth` OPTIONS (rows '1000', partitions '4')")
    try {
      // count(*) + id-range WHERE through the SQL surface: both pushes
      // compose exactly like the DataFrame path
      val got = spark.sql("SELECT count(*) AS n FROM synth_sql WHERE id < 100").collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(100L))
      val rows = spark.sql(
        "SELECT tag, count(*) AS n FROM synth_sql GROUP BY tag ORDER BY tag").collect()
      assert(rows.map(_.getLong(1)).sum == 1000L)
    } finally spark.sql("DROP TABLE synth_sql")
  }

  test("micro-batch streaming read: AvailableNow drains in paced batches, batch parity") {
    val qn = "synth_stream_spec"
    val q = spark.readStream.format("graft-synth")
      .option("rows", 30000).option("partitions", 4).option("rowsPerBatch", 10000)
      .load()
      .writeStream.format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(qn)
    assert(got.count() == 30000)
    // admission control paced the drain: three 10k-row micro-batches,
    // not one 30k gulp
    assert(q.recentProgress.count(_.numInputRows > 0) == 3,
      q.recentProgress.map(_.numInputRows).mkString(","))
    assert(q.recentProgress.filter(_.numInputRows > 0).forall(_.numInputRows == 10000))
    // exact parity with the batch scan (sum over the exact int column)
    val batch = synth(30000, 4).agg(sum("score")).collect().head.getLong(0)
    assert(got.agg(sum("score")).collect().head.getLong(0) == batch)
  }

  test("ReadLimit round trip: pacing comes from the engine-passed limit, " +
       "and a covering limit drains in one gulp") {
    // rowsPerBatch is declared via getDefaultReadLimit and honored only
    // when latestOffset receives it back (possibly composed with
    // AvailableNow's limit) — there is no side-channel pacing left, so
    // the paced test above AND this one-gulp case together pin the
    // round trip through Spark's admission control.
    val qn = "synth_stream_gulp"
    val q = spark.readStream.format("graft-synth")
      .option("rows", 20000).option("partitions", 4)
      .option("rowsPerBatch", 20000) // covers the table -> allAvailable
      .load()
      .writeStream.format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(qn).count() == 20000)
    assert(q.recentProgress.count(_.numInputRows > 0) == 1,
      q.recentProgress.map(_.numInputRows).mkString(","))
  }

  test("grouped partial aggregate pushdown: scan emits per-group partials") {
    // the JDBC-style DSv2 contract: GROUP BY bucket,tag folds inside the
    // generation pass and the scan ships ≤ |groups|×|slices| partial
    // rows instead of the interval's rows; Spark merges (COUNT is
    // rewritten to SUM over the pushed counts)
    val df = synth(50000, 8)
      .groupBy("bucket", "tag")
      .agg(count(lit(1)).as("cnt"), sum("score").as("s"),
        min("value").as("mn"), max("value").as("mx"))
    val scan = scanOf(df)
    assert(scan.toString.contains("groupedAgg=[bucket,tag]"), scan.toString)
    // the scan's output is the partial schema, not generated rows
    assert(scan.schema.fieldNames.toSeq ==
      Seq("bucket", "tag", "count_0", "sum_1", "mm_2", "mm_3"))
    // partial-merge reproduces the brute per-group values exactly
    val got = df.orderBy("bucket", "tag").collect()
    assert(got.length == 700)
    val brute = (0L until 50000L).map(_ * 48271L % 2147483647L)
      .groupBy(x => ((x % 100).toInt, "t" + (x % 7)))
    got.foreach { r =>
      val g = brute((r.getInt(0), r.getString(1)))
      assert(r.getLong(2) == g.size)
      assert(r.getLong(3) == g.map(x => (x % 1000)).sum)
      assert(r.getDouble(4) == g.map(_.toDouble / 2147483647L).min)
      assert(r.getDouble(5) == g.map(_.toDouble / 2147483647L).max)
    }
  }

  test("grouped pushdown composes with consumed id-range filters") {
    // the filter narrows the PLANNED interval (consumed, no residual),
    // and the grouped fold then runs over the pruned slices only — the
    // registered synth_bucket_agg shape, pinned explicitly
    val df = synth(60000, 8).filter(col("id") >= 10000 && col("id") < 30000)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val scan = scanOf(df)
    assert(scan.toString.contains("groupedAgg=[bucket]"), scan.toString)
    assert(scan.toString.contains("range=[10000,30000)"), scan.toString)
    val got = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val brute = (10000L until 30000L).map(_ * 48271L % 2147483647L)
      .groupBy(x => (x % 100).toInt).view.mapValues(_.size.toLong).toMap
    assert(got == brute)
  }

  test("grouped pushdown declines float sums and distincts; results stay exact") {
    // a double SUM's value depends on fold order, so the source refuses
    // to claim it — the whole push declines and the plan aggregates
    // generated rows as usual
    val dbl = synth(10000, 4).groupBy("bucket").agg(sum("value").as("sv"))
    assert(!scanOf(dbl).toString.contains("groupedAgg"), scanOf(dbl).toString)
    assert(dbl.count() == 100)
    val dist = synth(10000, 4).groupBy("bucket")
      .agg(countDistinct("tag").as("nt"))
    assert(!scanOf(dist).toString.contains("groupedAgg"))
    assert(dist.collect().forall(_.getLong(1) == 7))
  }

  test("the registered aggregate matches a driver-side brute recompute") {
    val got = graft.sources.Synthetic.synthBucketAgg(spark, sfDir).collect()
    val brute = (0L until graft.sources.Synthetic.idCap)
      .map(id => id * 48271L % 2147483647L)
      .groupBy(x => ((x % 100).toInt, "t" + (x % 7)))
      .map { case ((b, t), xs) =>
        (b, t, xs.size.toLong, xs.map(x => (x % 1000).toInt.toLong).sum,
          xs.map(_.toDouble / 2147483647L).min, xs.map(_.toDouble / 2147483647L).max)
      }.toSeq.sortBy(r => (r._1, r._2))
    assert(got.length == brute.length)
    got.zip(brute).foreach { case (r, (b, t, cnt, sum, mn, mx)) =>
      assert(r.getInt(0) == b && r.getString(1) == t)
      assert(r.getLong(2) == cnt && r.getLong(3) == sum)
      assert(r.getDouble(4) == mn && r.getDouble(5) == mx)
    }
  }

  test("runtime filtering: broadcast-join key values narrow the scan " +
       "interval at EXECUTION time (DSv2 dynamic pruning)") {
    import spark.implicits._
    graft.sources.SynthSource.runtimeNarrowed.reset()
    // big generated fact, tiny dim whose keys cluster at [5000, 5004] —
    // plan-time pruning CANNOT see them (no static predicate on id);
    // only the runtime hand-off can
    val fact = synth(1000000, 10)
    // the dim must be a REAL scan with a surviving selective predicate —
    // a local relation's filter constant-folds away and DPP declines
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft-dpp").toString + "/dim"
    ((5000L to 5004L).map((_, 1)) ++ (900000L to 900049L).map((_, 0)))
      .toDF("k", "m").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("m") === 1).select("k")
    val joined = fact.join(broadcast(dim), fact("id") === dim("k"))
    val rows = joined.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (5000L to 5004L))
    assert(graft.sources.SynthSource.runtimeNarrowed.sum() > 0,
      "the runtime filter never reached SynthScan.filter — the scan ran unpruned")
    // and the narrowing is an optimization only: equal result without it
    val unpruned = fact.filter(col("id").between(4000, 6000))
      .join(broadcast(dim), fact("id") === dim("k")).count()
    assert(unpruned == 5)
  }

  // ---- graft-filesink: the DSv2 WRITE contract ----

  private def sinkDir(): String =
    java.nio.file.Files.createTempDirectory("graft-filesink").toString

  private def readSink(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(path))
    val parts = try s.iterator().asScala.toSeq.filter(
      _.getFileName.toString.startsWith("part-")) finally s.close()
    parts.flatMap(p =>
      java.nio.file.Files.readAllLines(p).asScala).sorted.toSeq
  }

  test("filesink end-to-end: append publishes rows, overwrite truncates") {
    import spark.implicits._
    val path = sinkDir()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag")
    df.write.format("graft-filesink").option("path", path).mode("append").save()
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "_SUCCESS")))
    assert(readSink(path) == Seq("1\ta", "2\tb", "3\tc"))
    // append accumulates (second job's queryId keeps file names disjoint)
    df.write.format("graft-filesink").option("path", path).mode("append").save()
    assert(readSink(path) == Seq("1\ta", "1\ta", "2\tb", "2\tb", "3\tc", "3\tc"))
    // overwrite lowers to SupportsTruncate: old parts swept, one copy left
    df.write.format("graft-filesink").option("path", path).mode("overwrite").save()
    assert(readSink(path) == Seq("1\ta", "2\tb", "3\tc"))
    // no staging residue after any of the three commits
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_temp")))
  }

  test("filesink commit protocol: a retried task attempt does NOT " +
       "duplicate rows, and the failed attempt leaves zero residue") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val path = sinkDir()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("tag", StringType)))
    val bw = new graft.sources.FileSinkBatchWrite(path, "q-retry", schema,
      truncate = false)
    val factory = bw.createBatchWriterFactory(null)
    def row(id: Long, tag: String) =
      InternalRow(id, UTF8String.fromString(tag))
    // ATTEMPT 0 of partition 0: writes a row, then the task dies before
    // its commit message is produced (executor crash — abort() may never
    // run). Its staged file must be invisible forever.
    val attempt0 = factory.createWriter(0, 100L)
    attempt0.write(row(1L, "lost"))
    // no commit, no abort: the orphan temp file stays staged
    // ATTEMPT 1 (the retry) writes the SAME logical rows and commits.
    val attempt1 = factory.createWriter(0, 101L)
    attempt1.write(row(1L, "kept"))
    val msg1 = attempt1.commit()
    // a second partition completes normally on its first attempt
    val p1 = factory.createWriter(1, 102L)
    p1.write(row(2L, "p1"))
    val msgP1 = p1.commit()
    // the driver publishes ONLY the delivered messages (Spark's commit
    // coordinator guarantees one per partition)
    bw.commit(Array(msg1, msgP1))
    assert(readSink(path) == Seq("1\tkept", "2\tp1"),
      "published rows must be exactly the committed attempts'")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_temp")),
      "job commit must sweep the failed attempt's staged file")
  }

  test("filesink streaming write: per-epoch publish, and a REPLAYED epoch " +
       "commit is idempotent (no duplicate rows after driver restart)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = sinkDir()
    // e2e: two micro-batches through a real streaming query
    val input = MemoryStream[Long]
    val q = input.toDS().toDF("id")
      .writeStream.format("graft-filesink")
      .option("path", path)
      .option("checkpointLocation", sinkDir() + "/ckpt")
      .start()
    try {
      input.addData(1L, 2L); q.processAllAvailable()
      input.addData(3L); q.processAllAvailable()
    } finally q.stop()
    assert(readSink(path) == Seq("1", "2", "3"))
    // idempotence: re-commit of an already-committed epoch must not
    // publish twice (Structured Streaming replays the last epoch after
    // a driver restart; the marker makes the second commit a no-op)
    import org.apache.spark.sql.types._
    val sw = new graft.sources.FileSinkStreamingWrite(path, "q-replay",
      StructType(Seq(StructField("id", LongType))))
    val factory = sw.createStreamingWriterFactory(null)
    def stageEpoch7(taskId: Long) = {
      val w = factory.createWriter(0, taskId, 7L)
      w.write(org.apache.spark.sql.catalyst.InternalRow(99L))
      w.commit()
    }
    sw.commit(7L, Array(stageEpoch7(1L)))
    val afterFirst = readSink(path)
    assert(afterFirst.count(_ == "99") == 1)
    // the replay: same epoch re-staged (new task ids) and re-committed
    sw.commit(7L, Array(stageEpoch7(2L)))
    assert(readSink(path) == afterFirst,
      "replayed epoch commit must be a no-op, not a duplicate publish")
    // torn-commit heal: files published but the marker write crashed —
    // the replay (here planning FEWER partitions) must sweep the torn
    // epoch's parts before publishing its own complete set
    def stage(pid: Int, taskId: Long, v: Long) = {
      val w = factory.createWriter(pid, taskId, 9L)
      w.write(org.apache.spark.sql.catalyst.InternalRow(v))
      w.commit()
    }
    sw.commit(9L, Array(stage(0, 10L, 90L), stage(1, 11L, 91L)))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(path, "_epoch-q-replay-9")) // simulate the crash
    sw.commit(9L, Array(stage(0, 12L, 90L))) // replay plans only pid 0
    val after9 = readSink(path)
    assert(after9.count(_ == "90") == 1 && !after9.contains("91"),
      s"torn epoch must be swept before republish, got $after9")
    val tempDir = java.nio.file.Paths.get(path, "_temp")
    assert(!java.nio.file.Files.exists(tempDir) || {
      val s = java.nio.file.Files.list(tempDir)
      try !s.iterator().hasNext finally s.close()
    }, "replayed staging must be swept")
  }

  test("filesink streaming truncate (complete mode): each epoch REPLACES " +
       "the previous snapshot instead of accumulating one per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = sinkDir()
    // e2e: a complete-mode aggregation — Spark lowers complete output
    // mode through SupportsTruncate, so every epoch must sweep the
    // query's prior snapshot before publishing its own
    val input = MemoryStream[String]
    val q = input.toDS().toDF("tag").groupBy("tag")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .writeStream.format("graft-filesink")
      .outputMode("complete")
      .option("path", path)
      .option("checkpointLocation", sinkDir() + "/ckpt")
      .start()
    try {
      input.addData("a", "b"); q.processAllAvailable()
      input.addData("a"); q.processAllAvailable()
    } finally q.stop()
    // were prior epochs not swept, "a\t1"/"b\t1" from epoch 0 would
    // still sit beside epoch 1's snapshot, duplicating the result
    assert(readSink(path) == Seq("a\t2", "b\t1"),
      "complete-mode sink must hold exactly the LATEST snapshot")
    // unit: a replayed truncate epoch stays idempotent too
    import org.apache.spark.sql.types._
    val sw = new graft.sources.FileSinkStreamingWrite(path, "q-trunc",
      StructType(Seq(StructField("id", LongType))), truncate = true)
    val factory = sw.createStreamingWriterFactory(null)
    def stage(taskId: Long, epoch: Long, v: Long) = {
      val w = factory.createWriter(0, taskId, epoch)
      w.write(org.apache.spark.sql.catalyst.InternalRow(v))
      w.commit()
    }
    sw.commit(1L, Array(stage(1L, 1L, 10L)))
    sw.commit(2L, Array(stage(2L, 2L, 20L)))
    val afterTwo = readSink(path).filter(s => s == "10" || s == "20")
    assert(afterTwo == Seq("20"), "epoch 2 must replace epoch 1's snapshot")
    sw.commit(2L, Array(stage(3L, 2L, 20L))) // replay after restart
    assert(readSink(path).count(_ == "20") == 1,
      "replayed truncate epoch must remain a no-op")
  }

  private def readManifestSink(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    graft.sources.FileSinkManifest.visibleFiles(path)
      .flatMap(p => java.nio.file.Files.readAllLines(p).asScala)
      .sorted
  }

  test("filesink commit=manifest: visibility is the manifest, not the " +
       "file listing — append accumulates, overwrite swaps and sweeps") {
    import spark.implicits._
    val path = sinkDir()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    def write(mode: String) = df.write.format("graft-filesink")
      .option("path", path).option("commit", "manifest").mode(mode).save()
    write("append")
    assert(readManifestSink(path) == Seq("1\ta", "2\tb"))
    write("append")
    assert(readManifestSink(path) == Seq("1\ta", "1\ta", "2\tb", "2\tb"),
      "append must carry the previous manifest's files forward")
    write("overwrite")
    assert(readManifestSink(path) == Seq("1\ta", "2\tb"))
    // the truncate publish also GCs the now-unreferenced generations
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(path))
    val dataFiles = try s.iterator().asScala.toSeq
      .map(_.getFileName.toString).filter(_.startsWith("data-"))
      finally s.close()
    val live = graft.sources.FileSinkManifest.visibleFiles(path)
      .map(_.getFileName.toString).toSet
    assert(dataFiles.toSet == live,
      s"truncate publish must sweep unreferenced data files, " +
      s"found ${dataFiles.size} on disk vs ${live.size} live")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_temp")))
  }

  test("filesink commit=manifest: a publish torn between placement and " +
       "manifest exposes NOTHING, and a retry completes exactly-once") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val path = sinkDir()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("tag", StringType)))
    def row(id: Long, tag: String) =
      InternalRow(id, UTF8String.fromString(tag))
    def stage(bw: graft.sources.FileSinkManifestBatchWrite, pid: Int,
              taskId: Long, id: Long, tag: String) = {
      val w = bw.createBatchWriterFactory(null).createWriter(pid, taskId)
      w.write(row(id, tag))
      w.commit()
    }
    // ATTEMPT 1 places its data files but dies before the manifest
    // write — the non-atomic window rename-commit tears in. Here the
    // partial state is a PARTIAL placed set (one of two partitions)
    // and no manifest at all.
    val torn = new graft.sources.FileSinkManifestBatchWrite(
      path, "q-torn", schema, truncate = false)
    torn.place(Array(stage(torn, 0, 1L, 1L, "lost")))
    // ... second partition's temp file stays staged, never placed
    stage(torn, 1, 2L, 2L, "also-lost")
    assert(readManifestSink(path).isEmpty,
      "a torn publish (files placed, no manifest) must expose nothing")
    // THE RETRY is a fresh write (new queryId, as Spark reruns the job)
    val retry = new graft.sources.FileSinkManifestBatchWrite(
      path, "q-retry2", schema, truncate = false)
    retry.commit(Array(
      stage(retry, 0, 3L, 1L, "kept"), stage(retry, 1, 4L, 2L, "kept2")))
    assert(readManifestSink(path) == Seq("1\tkept", "2\tkept2"),
      "the retry must publish exactly-once; torn garbage stays invisible")
    // and a truncate publish sweeps the torn attempt's garbage for good
    val trunc = new graft.sources.FileSinkManifestBatchWrite(
      path, "q-trunc2", schema, truncate = true)
    trunc.commit(Array(stage(trunc, 0, 5L, 9L, "fresh")))
    assert(readManifestSink(path) == Seq("9\tfresh"))
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(path))
    val onDisk = try s.iterator().asScala.toSeq
      .map(_.getFileName.toString).filter(_.startsWith("data-"))
      finally s.close()
    assert(onDisk.forall(_.contains("q-trunc2")),
      s"truncate GC must sweep torn placements, disk holds $onDisk")
  }

  test("filesink commit=manifest: concurrent appends linearize via the " +
       "version CAS — the stale publish loses, the retry folds both in") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val path = sinkDir()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("tag", StringType)))
    def stage(bw: graft.sources.FileSinkManifestBatchWrite, q: String,
              pid: Int, taskId: Long, id: Long, tag: String) = {
      val w = bw.createBatchWriterFactory(null).createWriter(pid, taskId)
      w.write(InternalRow(id, UTF8String.fromString(tag)))
      w.commit()
    }
    val M = graft.sources.FileSinkManifest
    val a = new graft.sources.FileSinkManifestBatchWrite(
      path, "q-a", schema, truncate = false)
    val b = new graft.sources.FileSinkManifestBatchWrite(
      path, "q-b", schema, truncate = false)
    // A places its files and reads the head — then B commits first:
    // the exact interleaving the r8 advice called a lost-update under
    // the old blind-replace publish (both read prev=[], second publish
    // dropped the first's files)
    val aPlaced = a.place(Array(stage(a, "q-a", 0, 1L, 1L, "from-a")))
    val staleVer = M.currentVersion(path)
    val stalePrev = M.visibleFiles(path).map(_.getFileName.toString)
    b.commit(Array(stage(b, "q-b", 0, 2L, 2L, "from-b")))
    // A's publish from the stale read must LOSE the CAS and expose nothing
    assert(!M.tryPublish(path, stalePrev ++ aPlaced, staleVer + 1),
      "a stale-version publish must be rejected, not replace the head")
    assert(readManifestSink(path) == Seq("2\tfrom-b"),
      "the losing CAS must publish nothing")
    // the commit loop's retry leg: re-read the head (now B's) and CAS
    // again — both writers' files land
    val prev2 = M.visibleFiles(path).map(_.getFileName.toString)
    assert(M.tryPublish(path, prev2 ++ aPlaced, M.currentVersion(path) + 1))
    assert(readManifestSink(path) == Seq("1\tfrom-a", "2\tfrom-b"),
      "the retry must fold BOTH appends into the head manifest")
  }

  test("filesink commit=manifest on a STREAMING write fails loudly " +
       "instead of silently downgrading the commit protocol") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val ex = intercept[Exception] {
      val q = input.toDS().toDF("id")
        .writeStream.format("graft-filesink")
        .option("path", sinkDir())
        .option("commit", "manifest")
        .option("checkpointLocation", sinkDir() + "/ckpt")
        .start()
      try { input.addData(1L); q.processAllAvailable() } finally q.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) && chain(ex).exists(t =>
      t.getMessage != null && t.getMessage.contains("batch writes only")),
      s"expected the loud manifest/streaming rejection, got $ex")
  }

  test("filesink abort publishes nothing and cleans all staged attempts") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    val path = sinkDir()
    val schema = StructType(Seq(StructField("id", LongType)))
    val bw = new graft.sources.FileSinkBatchWrite(path, "q-abort", schema,
      truncate = false)
    val factory = bw.createBatchWriterFactory(null)
    val w = factory.createWriter(0, 1L)
    w.write(InternalRow(42L))
    val msg = w.commit()
    bw.abort(Array(msg))
    assert(readSink(path).isEmpty, "aborted job must publish nothing")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_temp")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "_SUCCESS")))
  }
}
