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
    // and the fetched posting rows must agree with a fresh corpus build
    val want = corpusFlatIndex()
      .filter { case (term, _, _, _) => Set("spark", "data", "dup")(term) }
    assert(lookup.collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))) == want)
  }

  /** Fresh (term, df, docno, tf) build straight from the corpus — the
    * independent witness the artifact-probing queries are checked
    * against, ordered by (term, docno). */
  private def corpusFlatIndex(): Seq[(String, Long, Long, Long)] = {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), explode(tokenize(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val df = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    rows.map { case (t, d, f) => (t, df(t), d, f) }.sortBy(r => (r._1, r._3)).toSeq
  }

  test("boolean retrieval probes the persisted index, not the corpus") {
    val q = InvertedIndex.booleanRetrieval(InvertedIndex.retrievalQuery)(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    // no tokenize/explode anywhere: the doc sets come from the artifact
    assert(!plan.contains("Generate explode"),
      s"retrieval re-tokenized the corpus:\n$plan")
    assert(plan.contains("graft-index"), s"no index artifact scan in:\n$plan")
  }

  test("bm25 matches a driver-side recompute with identical arithmetic") {
    val flat = corpusFlatIndex()
    val dl = flat.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
    val nDocs = dl.size.toLong
    val totalDl = dl.values.sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val k1 = 1.2; val b = 0.75
    val byTerm = flat.groupBy(_._1)
    val contribs = InvertedIndex.bm25Terms.flatMap { t =>
      val postings = byTerm.getOrElse(t, Seq.empty)
      val df = postings.length.toLong
      val idf6 = r6(math.log10(1 + (nDocs - df + 0.5) / (df + 0.5)))
      postings.map { case (_, _, docno, tf) =>
        val c = (idf6 * (tf * (k1 + 1))) /
          (tf + k1 * (1 - b + b * dl(docno) / (totalDl.toDouble / nDocs)))
        docno -> BigDecimal(r6(c) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
    val want = contribs.groupBy(_._1).view
      .mapValues(cs => (cs.length.toLong, cs.map(_._2).sum)).toMap
      .toSeq.map { case (d, (n, s)) => (d, n, s) }
      .sortBy { case (d, _, s) => (-s, d) }.take(15)
    val got = InvertedIndex.bm25Retrieval(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("phrase retrieval probes the positional artifact and matches a token recompute") {
    val q = InvertedIndex.phraseRetrieval(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    // term-pruned artifact scans, no corpus re-tokenization
    assert(plan.contains("FileScan parquet"), s"no parquet scan in:\n$plan")
    assert(plan.contains("EqualTo(term"), s"term filter not pushed:\n$plan")
    assert(!plan.contains("documents.parquet"),
      "phrase retrieval re-read the corpus instead of the positional artifact")
    // independent witness: sliding-window phrase count over raw text
    val terms = InvertedIndex.phraseTerms
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val ws = r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val n = ws.sliding(terms.length).count(w => w.sameElements(terms))
        if (n > 0) Some((r.getLong(0), n)) else None
      }.sortBy(_._1).toSeq
    assert(q.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq == want)
  }

  test("incremental index merge equals the full index restricted to batch terms") {
    val inc = InvertedIndex.indexIncremental(spark, sfDir)
    // the standing side must be an artifact probe: the only corpus
    // (documents.parquet) scans are the batch tf subtree's two
    // evaluations (touched-term set + union side — the documented
    // batch≪index trade); the standing postings come from the artifact
    val plan = inc.queryExecution.executedPlan.toString
    val corpusScans = "documents\\.parquet".r.findAllIn(plan).size
    assert(corpusScans == 2,
      s"expected the 2 batch-slice scans only, saw $corpusScans:\n$plan")
    assert(plan.contains("graft-index"), s"standing side is not an artifact probe:\n$plan")
    // semantics: merged == full flat index restricted to batch-touched terms
    val full = InvertedIndex.invertedIndexFlat(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batchTerms = full.collect {
      case (t, _, docno, _)
        if docno % InvertedIndex.indexBatchMod == InvertedIndex.indexBatchRem => t
    }.toSet
    val want = full.filter(r => batchTerms(r._1)).sortBy(r => (r._1, r._3)).toSeq
    val got = inc.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("positional artifact agrees with the flat index: tf == |positions|, sorted, in-range") {
    val pos = InvertedIndex.positionalIndex(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Int](2)).toMap
    val flat = InvertedIndex.persistedIndex(spark, sfDir)
      .select("term", "docno", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pos.keySet == flat.keySet, "artifacts disagree on the posting set")
    pos.foreach { case (k, ps) =>
      assert(ps.length.toLong == flat(k), s"tf mismatch at $k")
      assert(ps == ps.sorted && ps.distinct == ps, s"positions unsorted/duplicated at $k")
      assert(ps.forall(_ >= 0), s"negative position at $k")
    }
  }

  test("hybrid RRF fusion: ranks come from real legs, the score is exactly the " +
      "reciprocal-rank sum, and leg-winners dominate") {
    val rows = InvertedIndex.hybridRetrievalRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bm25 = InvertedIndex.bm25Retrieval(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    rows.foreach { r =>
      val (bRank, dRank) = (r.getAs[Int]("bm25_rank"), r.getAs[Int]("dense_rank"))
      // every output doc was retrieved by at least one leg
      assert(bRank > 0 || dRank > 0)
      // bm25 ranks are exactly the bm25 query's own ordering
      if (bRank > 0) assert(bm25(bRank - 1) == r.getAs[Long]("doc_id"))
      // fusion math: rrf6 is the 6dp reciprocal-rank sum of the two legs
      val want = BigDecimal(
        (if (bRank > 0) 1.0 / (InvertedIndex.rrfK + bRank) else 0.0) +
          (if (dRank > 0) 1.0 / (InvertedIndex.rrfK + dRank) else 0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf6") - want) < 1e-9,
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[Double]("rrf6")} vs $want")
    }
    // output is sorted by fused score
    val scores = rows.map(_.getAs[Double]("rrf6")).toSeq
    assert(scores == scores.sortBy(-_))
    // the fused winner scores at least what a single-leg rank-1 doc earns
    // (the bm25 top doc is always in the fusion set, so the max can never
    // fall below 1/(k+1))
    assert(scores.head >= 1.0 / (InvertedIndex.rrfK + 1) - 1e-9)
  }

  test("tfidf top terms: ranks are per-source dense, scores match a driver " +
      "recompute, and the per-source top-k lowers to the bounded-PQ exec") {
    val df = InvertedIndex.tfidfTopTerms(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // dense ranks 1..k per source, scores non-increasing within a source
    rows.groupBy(_.getAs[String]("source")).foreach { case (s, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to rs.length).toSeq, s)
      val scores = sorted.map(_.getAs[Long]("score_micro")).toSeq
      assert(scores == scores.sortBy(-(_: Long)), s)
      assert(rs.length <= InvertedIndex.tfidfK)
    }
    // driver recompute of one source's scores from raw text
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)))
    val n = docs.length.toDouble
    val dfMap = docs.flatMap(d => d._3.distinct.map(_ -> d._1)).groupBy(_._1)
      .map { case (t, xs) => t -> xs.length }
    val src0 = docs.head._2
    val tf0 = docs.filter(_._2 == src0).flatMap(_._3)
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = tf0.map { case (t, tf) =>
      t -> BigDecimal(r6(math.log10(n / dfMap(t))) * tf * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    rows.filter(_.getAs[String]("source") == src0).foreach { r =>
      assert(r.getAs[Long]("score_micro") == want(r.getAs[String]("term")),
        s"term ${r.getAs[String]("term")}")
    }
    // the row_number+filter pattern must lower through TopKRewrite
    val nodes = physicalNodes(df).map(_.getClass.getSimpleName)
    assert(nodes.contains("GraftTopKExec"), nodes.mkString(","))
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
