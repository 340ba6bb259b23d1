package graft

import graft.functions.TextFunctions._
import graft.operators.InvertedIndex
import org.apache.spark.sql.functions._

/** Hand-verifiable postings on the classic tiny corpus (FIXTURES §3). */
class InvertedIndexSpec extends GraftSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "one fish two fish"),
    (1L, "red fish blue fish"),
    (2L, "one red bird"),
    (3L, "blue bird blue sky"))

  test("postings match hand-computed term frequencies") {
    val got = corpus.toDF("doc_id", "text")
      .select(col("doc_id"), explode(tokenize(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Map(
      ("fish", 0L) -> 2L, ("fish", 1L) -> 2L,
      ("one", 0L) -> 1L, ("one", 2L) -> 1L,
      ("two", 0L) -> 1L,
      ("red", 1L) -> 1L, ("red", 2L) -> 1L,
      ("blue", 1L) -> 1L, ("blue", 3L) -> 2L,
      ("bird", 2L) -> 1L, ("bird", 3L) -> 1L,
      ("sky", 3L) -> 1L)
    assert(got == want)
  }

  test("postfix boolean evaluation on the tiny corpus") {
    // (one AND fish) OR sky → docs: 0 (one∧fish), 3 (sky)
    def termDocs(t: String) =
      corpus.toDF("doc_id", "text")
        .select(col("doc_id"), explode(tokenize(col("text"))).as("term"))
        .filter(col("term") === t).select("doc_id").distinct()
    val result = Seq("one", "fish", "AND", "sky", "OR")
      .foldLeft(List.empty[org.apache.spark.sql.DataFrame]) {
        case (a :: b :: rest, "AND") => b.intersect(a) :: rest
        case (a :: b :: rest, "OR") => b.union(a).distinct() :: rest
        case (stack, term) => termDocs(term) :: stack
      }.head
    assert(result.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 3L))
  }

  test("term lookup hits the persisted index with the filter pushed to the scan (S6)") {
    val lookup = InvertedIndex.indexTermLookup(spark, sfDir)
    val plan = lookup.queryExecution.executedPlan.toString
    // the lookup must read the on-disk artifact, not rebuild the index...
    assert(plan.contains("FileScan parquet"), s"no parquet scan in:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(term"),
      "lookup rebuilt the index instead of reading the persisted artifact")
    // ...with the term predicate pushed down so row groups prune on the
    // term min/max written by the range-partitioned sort
    assert(plan.contains("PushedFilters: [In(term"), s"term filter not pushed:\n$plan")
    // and the artifact must agree with a fresh in-memory build
    val want = InvertedIndex.invertedIndexPacked(spark, sfDir)
      .filter(col("term").isin("spark", "data", "dup")).orderBy("term")
      .collect().toSeq
    assert(lookup.collect().toSeq == want)
  }

  test("packed index df equals postings length (A13 invariant) on testdata") {
    val rows = InvertedIndex.invertedIndexPacked(spark, sfDir).collect()
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val postings = r.getAs[String]("postings").split(",")
      assert(postings.length.toLong == df, s"term ${r.getString(0)}")
      // postings sorted by docno
      val docnos = postings.map(_.split(":")(0).toLong)
      assert(docnos.sameElements(docnos.sorted))
    }
  }
}
