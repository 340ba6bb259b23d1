package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The gate runs under the SERVICE posture (FAIR pools, r13 — r12
    * verdict item 7): sequential gate queries are scheduling-neutral, so
    * the oracle compare is unaffected, but the deployment-shaped session
    * plus the interactive-pool tagging below exercises the mixed-workload
    * rule on every Verify run instead of only in ConcurrencyProf.
    * Exposed for GraftSessionSpec's pin. */
  private[graft] def builder(cpus: String): SparkSession.Builder =
    GraftSession.serviceBuilder(cpus)

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: regex filter over query names, for fast local
    // iteration on a single family (the driver always runs unfiltered)
    val (sfDir, outDir, nameFilter) = args match {
      case Array(s, o)    => (s, o, ".*")
      case Array(s, o, f) => (s, o, f)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // deployment confs (bypass-merge pin, UTC, partitions) come from the
    // ONE shared builder — see GraftSession's scaladoc
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // surface every df.observe metric (e.g. Dedup's stop_shingle_guard
    // drop counts) in the verify log: if a capped plan ever diverges from
    // its oracle at a larger scale, the dropped volume is in the log next
    // to the failure instead of silently absorbed
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    ns: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          System.err.println(s"[verify] observed $name: $row")
        }
      def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    e: Exception): Unit = ()
    })
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(_._1.matches(nameFilter)).foreach { case (name, fn) =>
      // the latency-sensitive probe family runs in its declared FAIR
      // pool — the tag a serving layer sets on its probe threads; the
      // thread-local is cleared after so batch queries stay in the
      // default pool
      val interactive =
        graft.operators.InvertedIndex.interactiveProbeNames(name)
      if (interactive)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool",
          GraftSession.interactivePool)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch {
        case e: ScaleEnvelopeExceeded =>
          // a DECLARED refusal, not a failure: record it machine-readably
          // so the at-scale sweep resolves the row via its sample twin
          // (a crashed query writes nothing and fails the sweep's
          // completeness check instead)
          new java.io.File(s"$outDir/$name").mkdirs()
          val esc = e.getMessage.replace("\\", "\\\\").replace("\"", "\\\"")
            .replace("\n", "\\n")
          Files.writeString(Paths.get(s"$outDir/$name/_ENVELOPE.json"),
            s"""{"reason": "$esc"}""")
          System.err.println(s"[verify] $name out of declared envelope: ${e.getMessage}")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally if (interactive)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the declared at-scale contract (r14) — consumed by
    // tools/selfcheck.py --scale; the sf0.01 gate ignores it
    def mj(m: Map[String, String]): String =
      m.toSeq.sorted.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/scale_contract.json"),
      s"""{"float_rollups": ${mj(SparkEntry.floatRollupContracts)}, """ +
        s""""brute_delegates": ${mj(SparkEntry.bruteOracleDelegates)}}""")
    spark.stop()
  }
}
