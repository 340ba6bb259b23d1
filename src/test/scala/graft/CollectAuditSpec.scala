package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanizes the per-round driver-side `collect()` sweep: every
  * `.collect()` in PRODUCT source is either a bounded scalar/key fetch,
  * a broadcast-bound model read, or a documented replay/differential
  * harness — an UNDOCUMENTED one is the classic way a distributed
  * operator quietly becomes a driver bottleneck at 100 TB. The
  * allowance below is per-file with a rationale; adding a `.collect()`
  * anywhere in src/main fails this test until the new site is
  * re-justified here (count bumps are deliberate friction, exactly like
  * the UDF whitelist in ScaleDesignSpec).
  */
class CollectAuditSpec extends AnyFunSuite {

  // ALL of src/main/scala, not just graft/ — the org.apache.spark.sql
  // bridge package is product source too (review r12c: a walk rooted at
  // graft/ left it unenforced)
  private val root = java.nio.file.Paths.get("src/main/scala")

  /** file (relative to src/main/scala/) → (expected `.collect()` count,
    * why those sites are driver-safe). Counts re-audited when bumped. */
  private val allowance: Map[String, (Int, String)] = Map(
    "graft/operators/EventAnalytics.scala" -> (6,
      "down from 7 in r14 (15 in r12): events_anomaly_stream — the LAST " +
        "MemoryStream replay — ported to a chunked FileStreamSource " +
        "drain, removing its driver-side input collect. Remaining: " +
        "limit(maxSeries+1)-bounded series-key fetch, MV-rewrite " +
        "materialization over an already-aggregated frame, and four " +
        "memory-sink result reads bounded by aggregated outputs " +
        "(sessions/windows, not events)"),
    "graft/operators/Similarity.scala" -> (2,
      "query-set fetches bounded by nQueries/limit for the ANN probe side"),
    "graft/operators/PageRank.scala" -> (2,
      "single-row scalar bounds: max partkey offset and the graph-stats " +
        "width derivation"),
    "graft/operators/Lakehouse.scala" -> (2,
      "4-scalar layout bounds (min/max day, z-order ranges) for writer sizing"),
    "graft/operators/Bpe.scala" -> (2,
      "1-row argmax fetch per merge iteration and the bounded vocab read"),
    "graft/streaming/StreamingJobs.scala" -> (1,
      "memory-sink drain of a watermark-bounded test stream"),
    "graft/operators/TaxiEvents.scala" -> (1,
      "bounded batch-manifest listing keyed by input_file_name"),
    "graft/operators/SpamClassifier.scala" -> (1,
      "broadcast model read: weight vector bounded by the feature space"))

  test("every driver-side collect() in product source is documented") {
    import scala.jdk.CollectionConverters._
    val found = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map { p =>
        val rel = root.relativize(p).toString
        val n = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          .sliding(10).count(_.startsWith(".collect()"))
        rel -> n
      }
      .filter(_._2 > 0)
      .toMap
    val undocumented = found.filterNot { case (f, n) =>
      allowance.get(f).exists(_._1 == n)
    }
    assert(undocumented.isEmpty,
      "collect() sites changed without re-justification:\n" +
        undocumented.map { case (f, n) =>
          val expected = allowance.get(f).map(_._1).getOrElse(0)
          s"  $f: found $n, documented $expected"
        }.mkString("\n"))
    val stale = allowance.keys.filterNot(found.contains)
    assert(stale.isEmpty,
      s"allowance entries with no remaining collect(): ${stale.mkString(", ")} " +
        "— shrink the allowance")
  }
}
