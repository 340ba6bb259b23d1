package graft

import graft.operators.Lakehouse
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

class LakehouseSpec extends GraftSpec {

  test("bucketed_join: SMJ with zero join-side exchanges, values match direct join") {
    val df = Lakehouse.bucketedJoin(spark, sfDir)
    val got = df.collect()

    // values: same rollup straight off the parquet (no bucketing)
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), sum(col("q")).as("sum_qty"))
      .orderBy("o_orderpriority").collect()
    assert(got.toSeq == want.toSeq)

    // plan: the join is a SortMergeJoin and NOTHING under it shuffles —
    // the bucketed layout satisfies the join's required distribution
    val smjs = physicalNodes(df).collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, "bucketed join must plan as SortMergeJoin (merge hint)")
    val under = smjs.flatMap(_.collect { case e: ShuffleExchangeExec => e })
    assert(under.isEmpty,
      s"join-side shuffle found — bucketing failed to co-locate: $under")
    val scans = smjs.flatMap(_.collect { case f: FileSourceScanExec => f })
    assert(scans.size == 2 && scans.forall(_.bucketedScan),
      "both join inputs must be bucketed scans")
  }

  test("q19_sole_delayer_bucketed: the Q21 semi+anti self-joins plan with " +
      "zero exchanges under BOTH probes; values match the unbucketed q19") {
    val df = Lakehouse.q19SoleDelayerBucketed(spark, sfDir)
    val got = df.collect()

    // values: identical to the unbucketed q19 (layout never changes the
    // answer), and non-trivial at this sf
    val want = graft.operators.Relational.q19SoleDelayer(spark, sfDir).collect()
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty, "sf0.001 must yield sole-delayer suppliers")

    // plan: both self-probes are SortMergeJoins (LeftSemi + LeftAnti)
    // and NOTHING under either shuffles — the bucketed scan's
    // HashPartitioning(l_orderkey, N) satisfies the DISTINCTs'
    // clustered distribution AND both joins' required distribution
    val smjs = physicalNodes(df).collect { case j: SortMergeJoinExec => j }
    val types = smjs.map(_.joinType.toString).toSet
    assert(types == Set("LeftSemi", "LeftAnti"),
      s"expected a LeftSemi and a LeftAnti SortMergeJoin, got $types")
    smjs.foreach { j =>
      val under = physicalNodes(j).collect { case e: ShuffleExchangeExec => e }
      assert(under.isEmpty,
        s"${j.joinType} self-probe shuffles — bucketing failed to co-locate: $under")
    }
    // and every leaf feeding the joins is the bucketed layout
    val scans = smjs.flatMap(j =>
      physicalNodes(j).collect { case f: FileSourceScanExec => f })
    assert(scans.nonEmpty && scans.forall(_.bucketedScan),
      "all join inputs must be bucketed scans")
  }

  test("snapshot_diff_bucketed: the CDC full-outer diff plans with zero " +
      "join-side exchanges on the co-bucketed snapshot pair") {
    val df = Lakehouse.snapshotDiffBucketed(spark, sfDir)
    val got = df.collect()

    // values: identical to the unbucketed CDC diff
    val want = graft.operators.Relational.snapshotDiff(spark, sfDir).collect()
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty, "the engineered evolution must produce changes")
    assert(got.map(_.getAs[String]("change")).toSet ==
      Set("insert", "delete", "update"), "all three change kinds present")

    // plan: a FullOuter SortMergeJoin with nothing under it shuffling —
    // both snapshot versions arrive co-partitioned off the layout
    val smjs = physicalNodes(df).collect { case j: SortMergeJoinExec => j }
    assert(smjs.map(_.joinType.toString) == Seq("FullOuter"),
      s"expected one FullOuter SMJ, got ${smjs.map(_.joinType)}")
    val under = physicalNodes(smjs.head).collect { case e: ShuffleExchangeExec => e }
    assert(under.isEmpty,
      s"diff-side shuffle found — co-bucketing failed: $under")
    val scans = physicalNodes(smjs.head).collect { case f: FileSourceScanExec => f }
    assert(scans.size == 2 && scans.forall(_.bucketedScan),
      "both snapshot versions must read as bucketed scans")
  }

  test("zorder_box_agg: values match the original table; z layout skips most " +
      "row groups where the scattered control reads everything") {
    val got = Lakehouse.zorderBoxAgg(spark, sfDir).collect()

    // values: the same box rollup straight off the original events
    val (tlo, thi, vlo, vhi) = Lakehouse.boxBounds(spark, sfDir)
    val want = Tables.events(spark, sfDir)
      .select(col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("ts_micros"),
        round(col("value") * 1e6).cast("long").as("value_micro"))
      .filter(col("ts_micros").between(tlo, thi) &&
        col("value_micro").between(vlo, vhi))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("value_micro").as("value_micro_sum"))
      .orderBy("event_type").collect()
    assert(got.toSeq == want.toSeq)
    assert(got.map(_.getAs[Long]("n_events")).sum > 0, "the box must not be empty")

    // the layout A/B: identical box query over the z-ordered layout and
    // the hash-scattered control; parquet row-group stats skipping shows
    // up as the scan's output-row count
    val (zOut, flatOut) = Lakehouse.zorderDirsFor(spark, sfDir)
    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("ts_micros").between(tlo, thi) &&
          col("value_micro").between(vlo, vhi))
        .groupBy("event_type").count()
      q.collect()
      physicalNodes(q).collectFirst { case f: FileSourceScanExec => f }
        .get.metrics("numOutputRows").value
    }
    val total = Tables.events(spark, sfDir).count()
    val zRows = scannedRows(zOut)
    val flatRows = scannedRows(flatOut)
    assert(flatRows >= (total * 8) / 10,
      s"scattered control should survive stats pruning (read $flatRows of $total)")
    assert(zRows * 2 <= flatRows && zRows * 2 <= total,
      s"z layout must skip most row groups: scanned $zRows vs control $flatRows of $total")
  }

  test("dynamic partition pruning: a filtered dim narrows the partitioned " +
      "scan at RUNTIME (the subquery-predicate complement of the literal pin)") {
    // partitioned_prune pins PLANNING-time pruning (literal day). The
    // other half of the 100 TB story is a day predicate that only
    // exists at runtime — "days some dimension flags" — where Hive-style
    // DPP injects the broadcast join's key set into the scan's
    // partition filters. SourcesSpec pins the DSv2 analog on
    // SynthSource; this pins it on the REAL partitioned parquet layout.
    import spark.implicits._
    val out = Lakehouse.partitionedDirFor(spark, sfDir)
    val part = spark.read.parquet(out)
    // a real dim scan with a surviving selective predicate (a local
    // relation's filter would constant-fold and DPP declines): 2 of the
    // 30 days flagged
    val days = part.select("day").distinct().orderBy("day")
      .limit(2).collect().map(_.getDate(0))
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft-dpp-day").toString + "/dim"
    val allDays = part.select("day").distinct().collect().map(_.getDate(0))
    allDays.map(d => (d, if (days.contains(d)) 1 else 0)).toSeq
      .toDF("day", "m").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("m") === 1).select("day")
    val q = part.join(broadcast(dim), Seq("day"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // values: the same two-day rollup with a static predicate
    val want = part.filter(col("day").isin(days.map(_.toString): _*))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.values.sum > 0)
    // plan: the partitioned scan carries a dynamicpruning partition
    // filter and read only the flagged days' files
    val scan = physicalNodes(q)
      .collectFirst { case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("graft-part-events")) => f }
      .getOrElse(fail("partitioned scan not found"))
    assert(scan.partitionFilters.exists(_.toString.toLowerCase.contains("dynamicpruning")),
      s"no runtime partition filter on the scan: ${scan.partitionFilters}")
    val root = new java.io.File(out)
    val filesFor = root.listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
    }.toMap
    val expectFiles = days.map(d => filesFor(s"day=$d")).sum
    val totalFiles = filesFor.values.sum
    assert(scan.metrics("numFiles").value == expectFiles.toLong,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"expected the $expectFiles in the two flagged days (of $totalFiles)")
  }

  test("partitioned_prune: literal day prunes to one partition of thirty") {
    val df = Lakehouse.partitionedPrune(spark, sfDir)
    val got = df.collect()

    // values: same one-day rollup off the unpartitioned original
    val minDay = Tables.events(spark, sfDir)
      .agg(min(to_date(col("ts")))).collect()(0).getDate(0)
    val want = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) === lit(minDay.toString).cast("date"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1e6).cast("long")).as("value_micro"))
      .orderBy("event_type").collect()
    assert(got.toSeq == want.toSeq)

    // plan: the scan carries partitionFilters (planning-time pruning,
    // not a post-scan Filter) and reads only the one day's files
    val scan = physicalNodes(df)
      .collectFirst { case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("graft-part-events")) => f }
      .getOrElse(fail("partitioned scan not found"))
    assert(scan.partitionFilters.nonEmpty, "day predicate must prune at the scan")
    val root = new java.io.File(Lakehouse.partitionedDirFor(spark, sfDir))
    val dayDirs = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("day="))
    assert(dayDirs.length == 30, s"expected 30 day partitions, got ${dayDirs.length}")
    val oneDayFiles = dayDirs.find(_.getName == s"day=$minDay").get
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value == oneDayFiles.toLong,
      "scan must read exactly the pruned day's files")
  }

  test("bucket width derives from table stats: parallelism floor at fixture " +
      "scale, bytes term at 100 TB — never below the cluster width (r11 curve)") {
    // the r11 sizing curve's lesson as a computed contract: bucket count
    // caps scan/join parallelism, so the derived width can never sit
    // below defaultParallelism — at ANY dir, including sf1 (where the
    // 8-bucket fixture default measurably inverted the q19 win)
    val par = spark.sparkContext.defaultParallelism
    for (d <- Seq(sfDir, "/root/testdata/sf0.01", "/tmp/graftscale/sf1")
         if new java.io.File(d).isDirectory) {
      assert(Lakehouse.bucketsFor(spark, d, "lineitem") >= par,
        s"derived width under the parallelism floor for $d")
    }
    // pure-math regimes: floor below one row group per core; bytes term
    // above it (100 TB on a 1000-wide floor ≈ 800k buckets of ~128 MB)
    assert(Lakehouse.deriveBuckets(0L, 32) == 32)
    assert(Lakehouse.deriveBuckets(10L << 30, 32) == 80,  // 10 GiB/128 MiB
      "bytes term must take over once buckets would exceed a row group")
    assert(Lakehouse.deriveBuckets(100L << 40, 1000) == 819200L.toInt)
    // artifact names carry the derived width, so widths coexist on disk
    val (liT, _) = Lakehouse.bucketedTablesFor(spark, sfDir)
    assert(liT.endsWith(s"_b${Lakehouse.bucketsFor(spark, sfDir, "lineitem")}"))
    // the unbucketed-layout writer sizes row groups from the same stats,
    // clamped to [1 MB, 128 MB]
    assert(Lakehouse.layoutBlockBytes(spark, 0L) == (1L << 20))
    assert(Lakehouse.layoutBlockBytes(spark, 100L << 40) == (128L << 20))
  }
}
