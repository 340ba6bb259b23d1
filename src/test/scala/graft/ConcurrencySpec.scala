package graft

/** Shared-session concurrency: a deployed engine serves many analysts
  * through ONE SparkSession (pooled notebooks, a JDBC gateway, the
  * streaming drains' foreachBatch callbacks), so concurrent query
  * execution against the shared session — including concurrent FIRST
  * touch of the memoized family artifacts (shingle table, pair graph,
  * persisted index, ANN codes) — must produce exactly the results a
  * serial run produces. The reference never faces this (each MapReduce/
  * RDD program is its own JVM, e.g. one `main` per query class); a
  * long-lived Spark service does, and the memo maps' first-build
  * synchronization (`Dedup.shinglesMemo` et al.) is load-bearing only
  * under this test's access pattern.
  *
  * Deterministic by construction: digests are canonical (rows rendered
  * and sorted), and every query below is a batch plan — the one flake
  * source would be a genuine thread-safety defect, which is the point.
  */
class ConcurrencySpec extends GraftSpec {

  private def digest(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).sorted.toSeq

  test("concurrent execution over the shared session matches serial digests") {
    // spread across the memoized families so concurrent FIRST builds of
    // each shared artifact race: dedup (shingles+pairs+bands memos),
    // retrieval (persisted index memo), ANN (codes memo), spam (model
    // artifact), plus plain relational/text plans. Two members per
    // family by design — both threads contend for the same memo.
    val names = Seq(
      "dedup_exact", "dedup_minhash_lsh", "dedup_clusters",
      "boolean_retrieval", "bm25_retrieval",
      "ann_ivf_cosine", "knn_brute_cosine",
      "spam_apply",
      "wordcount", "pmi_stripes",
      "q5_monthly_nation", "doc_quality")

    // serial ground truth on a COLD memo state
    graft.operators.Dedup.clearMemos()
    graft.operators.InvertedIndex.clearMemos()
    graft.operators.Similarity.clearMemos()
    graft.operators.SpamClassifier.clearMemos()
    val serial = names.map(n => n -> digest(n)).toMap

    // concurrent run, memos cold again, all queries in flight at once
    graft.operators.Dedup.clearMemos()
    graft.operators.InvertedIndex.clearMemos()
    graft.operators.Similarity.clearMemos()
    graft.operators.SpamClassifier.clearMemos()
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(names.length)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = names.map(n => Future(n -> digest(n)))
      val concurrent = Await.result(Future.sequence(futures), 10.minutes).toMap
      names.foreach { n =>
        assert(concurrent(n) == serial(n),
          s"$n: concurrent digest diverged from serial " +
            s"(${concurrent(n).length} vs ${serial(n).length} rows)")
        assert(serial(n).nonEmpty, s"$n: vacuous digest — fixture produced 0 rows")
      }
    } finally pool.shutdown()
  }
}
