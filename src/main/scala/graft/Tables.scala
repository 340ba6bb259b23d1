package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table loaders for the harness testdata (`/root/testdata/sf*`).
  *
  * The reference engine (ShadongLiu/Hadoop-and-Spark) reads every relational
  * table twice — as pipe-delimited text parsed by positional index
  * (`Q1.scala:53-56`) and as parquet immediately downgraded to `RDD[Row]`
  * (`Q1.scala:59-62`) — and is graded on the two paths agreeing. Here both
  * paths stay `DataFrame`s with one explicit schema per table, so Catalyst
  * keeps column pruning + predicate pushdown on either encoding
  * (`.explain` shows `PushedFilters`/`ReadSchema` reaching the scan).
  *
  * At 100 TB the parquet path is the primary one: scans are vectorized,
  * filters hit row-group statistics, and only projected columns are read.
  * The csv path exists for the reference's dual-format contract and for
  * landing raw feeds; convert to parquet before heavy querying.
  */
object Tables {

  /** Release a localCheckpoint'd dataset's blocks deterministically —
    * the Dataset API has no direct handle (unpersist() only serves
    * CacheManager entries, and a checkpoint registers none). Without
    * this, every invocation of a checkpoint-using query parks its blocks
    * in the MemoryStore until a driver GC lets the ContextCleaner notice
    * the dead RDD — across a full bench run that is GBs of dead storage
    * occupancy and sporadic eviction stalls.
    *
    * SHARING HAZARD: lineage is truncated, so a released checkpoint can
    * never be recomputed — releasing one that another live plan still
    * embeds makes that plan permanently unreadable. The helper therefore
    * accepts ONLY the checkpointed frame itself (analyzed root must be
    * the checkpoint's LogicalRDD) and refuses composed plans, where a
    * plan walk could silently unpersist checkpoints shared with other
    * live frames (r5 shape; flagged by the r5 advisor). */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case other => throw new IllegalArgumentException(
        "releaseCheckpoint requires the checkpointed frame itself " +
          s"(root LogicalRDD), not a composed plan: ${other.nodeName}")
    }

  /** Run independent Spark jobs from a bounded thread pool and wait for
    * all of them (guide §2.6 "overlap independent jobs"): actions are
    * only sequential because driver code calls them sequentially, so a
    * family build whose artifact writes are independent consumers of one
    * checkpoint can let each job's task tail back-fill the slots the
    * others free, instead of leaving the cluster idle once per write.
    * FIFO scheduling (the session default) gives exactly that back-fill.
    * The FIRST failure is rethrown after every job settles — no write is
    * left running against a torn-down sibling's temp dirs. */
  private[graft] def runConcurrently(poolName: String,
      jobs: Seq[() => Unit]): Unit = {
    if (jobs.sizeIs <= 1) { jobs.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      jobs.size,
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"$poolName-${n.incrementAndGet()}")
          t.setDaemon(true); t
        }
      })
    try {
      val futures = jobs.map(j => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = j()
      }))
      var firstFailure: Throwable = null
      // drain EVERY future before rethrowing, including across an
      // interrupt (r15, advisor): an InterruptedException from f.get()
      // must not skip the remaining gets — the daemon jobs would keep
      // running after the caller's finally releases shared state (e.g.
      // InvertedIndex releasing the tf checkpoint under a live write).
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure == null) firstFailure = e.getCause
          case e: InterruptedException =>
            if (firstFailure == null) firstFailure = e
        }
      }
      if (firstFailure != null) throw firstFailure
    } finally pool.shutdown()
  }

  /** Explicit schemas (see FIXTURES.md §1). Declaring them — rather than
    * relying on inference — is what makes the csv path type-identical to
    * the parquet path, mirroring the reference's graded text/parquet parity.
    */
  val schemas: Map[String, StructType] = Map(
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
  )

  /** Dir prefix that routes a load through the pipe-text path: the table
    * is materialized once per real dir as pipe-delimited text (from the
    * parquet canonical copy) and then parsed back with the explicit
    * schema — the reference's dual-format grading surface (S2,
    * `assignment5_marks.md` tests 2–27: text and parquet runs must
    * agree). A `_csv`-suffixed registry query is its parquet twin run
    * through this prefix and hash-checked against the SAME oracle. */
  val CsvDirPrefix = "csv:"

  /** Relational tables only: `events` needs the nanos-as-long parquet
    * shim and `documents`/`embeddings` carry free text / float arrays
    * that a delimiter round-trip is the wrong surface for. */
  private val csvTables =
    Set("lineitem", "orders", "customer", "supplier", "part", "nation", "region")

  /** Collision-free local artifact path for a source dir: readable
    * sanitized prefix + md5 digest (the prefix alone can collide after
    * sanitization, "sf0.1" vs "sf0_1"). Shared by the csv
    * materialization here and InvertedIndex.persistedIndex. */
  private[graft] def artifactPath(base: String, dir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    s"$base/${dir.replaceAll("[^A-Za-z0-9.]", "_")}-$digest"
  }

  /** One option set for the pipe-text surface — writer and readers must
    * agree or the parity path silently parses nulls. `nullValue` is an
    * explicit sentinel (not the "" default): with the default, a written
    * empty string reads back as NULL — harmless on current TPC-H data
    * where string fields are non-empty, but a silent parity breaker the
    * moment a table carries "" values. With `\N`, NULL → `\N` → NULL and
    * `""` → `""` (quoted by the writer, not the null sentinel) → `""`. */
  private val csvOptions =
    Map("sep" -> "|", "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss",
      "nullValue" -> "\\N")

  private val csvMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]
  private def csvCopy(spark: SparkSession, realDir: String, name: String): String =
    csvMemo.synchronized {
      csvMemo.getOrElseUpdate((spark, realDir, name), {
        val path = s"${artifactPath("target/graft-csv", realDir)}/$name"
        spark.read.parquet(s"$realDir/$name.parquet")
          .write.mode("overwrite")
          .options(csvOptions)
          .csv(path)
        path
      })
    }

  /** Parquet scan (primary path). Kept as a DataFrame so pushdown/pruning
    * survive — the reference defeats both by calling `.rdd` (`Q1.scala:59`).
    * A `csv:`-prefixed dir reads the pipe-text materialization instead.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (dir.startsWith(CsvDirPrefix)) {
      require(csvTables(name), s"no csv path for table $name")
      val realDir = dir.stripPrefix(CsvDirPrefix)
      readCsvPath(spark, csvCopy(spark, realDir, name), name)
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Pipe-delimited text scan with the same explicit schema — the
    * reference's `.tbl` surface (`Q1.scala:53`, S2 in SURVEY §2.1).
    */
  def loadCsv(spark: SparkSession, dir: String, name: String): DataFrame =
    readCsvPath(spark, s"$dir/$name.csv", name)

  private def readCsvPath(spark: SparkSession, path: String, name: String): DataFrame =
    spark.read
      .schema(schemas(name))
      .options(csvOptions)
      .csv(path)

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.parquet` stores TIMESTAMP(NANOS) which the vectorized reader
    * rejects; read nanos as long and convert to microsecond NTZ (the
    * sub-microsecond tail is irrelevant to windowing and dropped the same
    * way by DuckDB comparisons at µs granularity). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) parquet encoding (pre-r6 testdata): read nanos
      // as long and convert to microsecond NTZ. `div` (integral) — `/`
      // on longs is double division and truncates 1µs low for ~1.5% of
      // real nano timestamps.
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000"))
            .cast(TimestampNTZType))
      // TIMESTAMP(MICROS) encoding (r6 testdata regeneration): reads
      // natively; just pin the NTZ type every consumer expects.
      case _ => raw.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast(TimestampNTZType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every testdata table as a temp view, so `spark.sql` users
    * query by name — the SQL-first entry into the library (paired with
    * the SQL-registered custom functions in GraftExtensions). Views are
    * lazy name bindings: registering all ten costs no I/O, and each
    * query still plans scans only for the tables it names, with the
    * usual pushdown/pruning (the audits cover the SQL-entry twin). */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    csvTables.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
    documents(spark, dir).createOrReplaceTempView("documents")
    embeddings(spark, dir).createOrReplaceTempView("embeddings")
  }
}
