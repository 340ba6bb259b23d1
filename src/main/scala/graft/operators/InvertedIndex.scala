package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's a3 surface: compressed inverted indexing
  * (`BuildInvertedIndexCompressed.java`) and boolean AND/OR retrieval
  * (`BooleanRetrievalCompressed.java`), re-expressed relationally.
  *
  * The reference hand-builds the postings byte format — d-gap + VInt
  * (`BuildInvertedIndexCompressed.java:127-133`) — and a secondary sort so
  * each reducer streams `(term, docno)` in order (`:75-80,156-161`). On
  * Spark the logical structure (`term → sorted postings`) is what we keep:
  * `groupBy(term).agg(sort_array(collect_list(struct(docno, tf))))`
  * replaces the secondary sort (SURVEY A12/O6), and parquet's dictionary/
  * RLE/delta encodings replace the hand-rolled compression when the index
  * is persisted (S6 → parquet). Point lookups become partition-pruned
  * filters on the term column.
  *
  * Boolean retrieval keeps the reference's postfix stack evaluator
  * (`BooleanRetrievalCompressed.java:73-92`) as a driver-side fold over
  * doc-set DataFrames — the "query planner" runs on the driver, the sets
  * never leave the cluster (T1/T2/T3).
  */
object InvertedIndex {

  /** Postfix boolean query over the documents corpus — the testdata analog
    * of the reference's graded `big data AND hadoop spark OR AND`
    * (assignment3.md Q3): (key AND value) AND (spark OR stream). */
  val retrievalQuery: Seq[String] = Seq("key", "value", "AND", "spark", "stream", "OR", "AND")

  /** Additional graded query shapes (the reference evaluates several
    * postfix forms interactively, `BooleanRetrievalCompressed.java:73-92`):
    * the direct `big data AND hadoop spark OR AND` analog on testdata
    * vocabulary, a rare-term AND over an OR, and a 3-way OR chain. */
  val retrievalQueries: Map[String, Seq[String]] = Map(
    "boolean_retrieval" -> retrievalQuery,
    "boolean_retrieval_graded" ->
      Seq("big", "data", "AND", "hash", "spark", "OR", "AND"),
    "boolean_retrieval_rare_and" ->
      Seq("dup", "fast", "OR", "slow", "AND"),
    "boolean_retrieval_or_chain" ->
      Seq("query", "window", "OR", "sort", "OR"))

  /** (doc_id, term, tf) — term frequencies per document. Build-side only:
    * every retrieval query probes the PERSISTED index instead of
    * re-running this corpus scan (the r6 change — rebuilding tf per query
    * re-reads the whole corpus, which is exactly what an index exists to
    * avoid at 100 TB; the reference's retrieval likewise re-opens the
    * index MapFile, `BooleanRetrievalCompressed.java:140-147`, it never
    * re-tokenizes the collection). */
  private def termFreqs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokenize(col("text"))).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))

  /** The index family's standing artifacts, memoized per (session,
    * corpus) and persisted under target/ (reference S6: the MapFile the
    * index job WRITES and every retrieval re-opens):
    *
    *  1. the flat posting index `(term, df, docno, tf)` — term-range-
    *     partitioned and sorted by (term, docno), so a term predicate
    *     prunes to the row groups holding that term's postings (the
    *     MapFile `get(term)` analog) and parquet dictionary/RLE/delta
    *     encodings replace the reference's hand-rolled d-gap+VInt
    *     compression (`BuildInvertedIndexCompressed.java:127-133`).
    *     Columnar posting ROWS, not packed strings, are the artifact: a
    *     hot term's postings then split across row groups/tasks instead
    *     of arriving as one giant string value.
    *  2. the doc-length table `(docno, dl)` — the per-document token
    *     count every length-normalized scorer (BM25 here) needs; built
    *     from the same single tf pass, docno-sorted.
    *
    * Bench times this build as its own `index_build` metric (same
    * discipline as the dedup/PPR families), so the per-query numbers
    * report marginal PROBE cost — the production shape: build the index
    * once, query it many times. */
  private val indexMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String),
      (DataFrame, DataFrame, DataFrame)]
  private def familyArtifacts(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    // synchronized: single evaluation per key (a doubled thunk would race
    // two overwrites of the same artifact paths)
    indexMemo.synchronized {
      indexMemo.getOrElseUpdate((spark, dir), {
        val idxPath = graft.Tables.artifactPath("target/graft-index", dir)
        val statsPath = graft.Tables.artifactPath("target/graft-index-docstats", dir)
        val posPath = graft.Tables.artifactPath("target/graft-index-positions", dir)
        // one corpus pass feeds all three artifacts: checkpoint tf (which
        // carries positions since r6e), write the projections, release
        // the blocks deterministically
        val tf = termFreqs(spark, dir).localCheckpoint(true)
        try {
          // The three artifact writes are INDEPENDENT consumers of the
          // tf checkpoint, and each runs 4-8 write tasks — run serially
          // they leave most of the cluster idle three times over. They
          // are submitted from a small thread pool so each write's tail
          // back-fills the others' freed slots (guide §2.6 "overlap
          // independent jobs"; Spark's FIFO scheduler gives exactly the
          // back-fill behaviour). Each job is labelled for the UI.
          def job(desc: String)(body: => Unit): () => Unit = () => {
            spark.sparkContext.setJobDescription(desc)
            try body finally spark.sparkContext.setJobDescription(null)
          }
          val writes: Seq[() => Unit] = Seq(
            // range-partition FIRST, window second: RangePartitioning(term)
            // already satisfies the window's ClusteredDistribution(term)
            // (a term never straddles range partitions) and the (term,
            // docno) sort satisfies its required sort, so the df count
            // rides the write layout's exchange instead of adding a
            // hash exchange of the full postings payload before it
            job("index_build: flat posting index") {
              tf.select(col("term"), col("doc_id").as("docno"), col("tf"))
                .repartitionByRange(8, col("term"))
                .sortWithinPartitions("term", "docno")
                .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
                .select(col("term"), col("df"), col("docno"), col("tf"))
                .write.mode("overwrite").parquet(idxPath)
            },
            job("index_build: doc-length table") {
              tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
                .select(col("doc_id").as("docno"), col("dl"))
                .repartitionByRange(4, col("docno"))
                .sortWithinPartitions("docno")
                .write.mode("overwrite").parquet(statsPath)
            },
            // positional postings (term, docno, positions) — same
            // term-range layout as the flat index, so a phrase query's
            // term predicate prunes to its row groups
            job("index_build: positional postings") {
              tf.select(col("term"), col("doc_id").as("docno"), col("positions"))
                .repartitionByRange(8, col("term"))
                .sortWithinPartitions("term", "docno")
                .write.mode("overwrite").parquet(posPath)
            })
          graft.Tables.runConcurrently("graft-index-build", writes)
        } finally graft.Tables.releaseCheckpoint(tf)
        (spark.read.parquet(idxPath), spark.read.parquet(statsPath),
          spark.read.parquet(posPath))
      })
    }

  /** The persisted flat index (artifact 1). */
  def persistedIndex(spark: SparkSession, dir: String): DataFrame =
    familyArtifacts(spark, dir)._1

  /** The persisted doc-length table (artifact 2). */
  private[graft] def docStats(spark: SparkSession, dir: String): DataFrame =
    familyArtifacts(spark, dir)._2

  /** The persisted positional postings (artifact 3). */
  private[graft] def positionalIndex(spark: SparkSession, dir: String): DataFrame =
    familyArtifacts(spark, dir)._3

  /** See [[Dedup.clearMemos]] — static-data assumption, Bench calls this
    * between timed runs for honest min-of-two measurement. The build's
    * checkpoint is already released inside [[familyArtifacts]]; the
    * artifacts themselves live on disk. */
  def clearMemos(): Unit = indexMemo.clear()

  /** Registered queries that probe the persisted index artifacts. Bench
    * gates its `index_build` metric on THIS set. */
  val familyMembers: Set[String] = Set(
    "inverted_index_flat", "inverted_index_packed", "index_term_lookup",
    "bm25_retrieval", "phrase_retrieval", "index_incremental",
    "retrieval_hybrid_rrf", "tfidf_top_terms") ++
    retrievalQueries.keySet

  /** The LATENCY-SENSITIVE subset: the point/term probes a serving layer
    * would answer while batch jobs run. Verify submits these under
    * [[graft.GraftSession.interactivePool]] (FAIR service session since
    * r13), so the mixed-workload posture — probe pool isolated from wide
    * batch stages (ConcurrencyProf: p95 82 ms vs 8.3 s FIFO) — is
    * exercised on every gate run, not just in the profiler. Index BUILDS
    * (inverted_index_*, index_incremental) stay batch: they are the wide
    * stages the pool isolates probes FROM. */
  val interactiveProbeNames: Set[String] = Set(
    "index_term_lookup", "bm25_retrieval", "phrase_retrieval",
    "retrieval_hybrid_rrf", "tfidf_top_terms") ++ retrievalQueries.keySet

  /** Force-materialize the index artifacts — Bench's `index_build`
    * metric. */
  def buildFamilyArtifacts(spark: SparkSession, dir: String): Unit = {
    familyArtifacts(spark, dir); ()
  }

  /** Flattened index: one row per posting with the term's document
    * frequency (A13) — the oracle-friendly projection of the index. This
    * IS the persisted artifact's content (plus the presentation sort), so
    * Bench lists it as subsumed by `index_build` — timing both
    * would double-count the build (the `value_percentiles` rationale). */
  def invertedIndexFlat(spark: SparkSession, dir: String): DataFrame =
    persistedIndex(spark, dir).orderBy("term", "docno")

  /** Packed index: `term → df, "docno:tf,…"` with postings sorted by docno
    * — the logical MapFile record (A12), string-serialized so the DuckDB
    * oracle can hash-match it exactly (integers only, no float formatting).
    * Derived from the persisted flat index; its timed cost is the
    * re-pack aggregation, not the corpus scan. */
  def invertedIndexPacked(spark: SparkSession, dir: String): DataFrame =
    persistedIndex(spark, dir)
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("docno"), col("tf")))),
            p => concat_ws(":", p.getField("docno"), p.getField("tf"))),
          ",").as("postings"))
      .orderBy("term")

  /** Postfix stack evaluation, parameterized on the query: terms push
    * doc-id sets fetched from the PERSISTED index (each is a term-pruned
    * artifact scan — the reference's `fetchDocumentSet` MapFile probe);
    * AND intersects, OR unions. Returns matching docs with a text excerpt
    * (the S11 "seek the collection at docno" analog is a join back to
    * documents). The query plan is assembled driver-side (it IS the query
    * planner), but the doc-id sets never leave the cluster. */
  def booleanRetrieval(query: Seq[String])(spark: SparkSession, dir: String): DataFrame = {
    val idx = persistedIndex(spark, dir)
    def termDocs(t: String) = idx.filter(col("term") === t).select(col("docno").as("doc_id"))
    val result = query.foldLeft(List.empty[DataFrame]) {
      case (a :: b :: rest, "AND") => b.intersect(a) :: rest
      case (a :: b :: rest, "OR") => b.union(a).distinct() :: rest
      case (stack, term) => termDocs(term) :: stack
    }.head
    result
      .join(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), substring(col("text"), 1, 60).as("excerpt"))
      .orderBy("doc_id")
  }

  /** Mirror of the postfix fold in DuckDB set SQL — generated from the
    * same query list so the Spark evaluator and the oracle can never
    * drift. */
  private def booleanRetrievalSql(query: Seq[String]): String = {
    val docSet = query.foldLeft(List.empty[String]) {
      case (a :: b :: rest, "AND") => s"($b INTERSECT $a)" :: rest
      case (a :: b :: rest, "OR") => s"($b UNION $a)" :: rest
      // escape single quotes: terms are currently hardcoded, but the
      // generator must stay injection-safe if queries become data-driven
      case (stack, term) =>
        s"(SELECT doc_id FROM tf WHERE term = '${term.replace("'", "''")}')" :: stack
    }.head
    s"""WITH $tfSql
        SELECT d.doc_id, substr(d.text, 1, 60) AS excerpt
        FROM documents d
        WHERE d.doc_id IN (SELECT doc_id FROM $docSet)
        ORDER BY d.doc_id"""
  }

  /** S6: the MapFile `get(term)` point lookup — a predicate pushed into
    * the PERSISTED index scan (row-group pruning via the term min/max the
    * range-partitioned sort wrote). Returns the fetched posting rows —
    * what the reference's `fetchPostings(term)` hands back — with no
    * shuffle in the plan (the pruned scan + sort only). */
  def indexTermLookup(spark: SparkSession, dir: String): DataFrame =
    persistedIndex(spark, dir)
      .filter(col("term").isin("spark", "data", "dup"))
      .orderBy("term", "docno")

  /** BM25 ranked retrieval — beyond the reference's boolean-only
    * retrieval: the standard Okapi scorer (Robertson et al.; the Lucene
    * `+1` idf form, always non-negative) over the same persisted index,
    * k1 = 1.2, b = 0.75. Top-[[bm25K]] docs by score with doc_id
    * tiebreak.
    *
    * Cross-engine exactness (the doc_logprob discipline): the only
    * transcendental, `log10`, rounds to 6dp; each posting's contribution
    * — whose remaining arithmetic is plain IEEE ops written in the
    * identical order on both engines — rounds to 6dp and integerizes as
    * micro-units, so the per-document SUM is an order-free long sum. The
    * oracle SQL is generated from the same constants ([[bm25K1]],
    * [[bm25B]], [[bm25Terms]]) so the two formulas can never drift.
    *
    * Scale shape: term-pruned index probe (|terms| ~ 4 of the whole
    * index), equi-join to the docno-keyed length table, idf arrives as a
    * |terms|-row broadcast, corpus totals as a single broadcast row; the
    * only wide exchange is the final per-doc grouped sum, and the top-k
    * lowers to TakeOrdered. Nothing rescans or re-tokenizes the corpus. */
  val bm25Terms: Seq[String] = Seq("spark", "data", "window", "dup")
  private val bm25K1 = 1.2
  private val bm25B = 0.75
  private val bm25K = 15
  def bm25Retrieval(spark: SparkSession, dir: String): DataFrame = {
    val idx = persistedIndex(spark, dir).filter(col("term").isin(bm25Terms: _*))
    val stats = docStats(spark, dir)
    val tot = stats.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val idf = idx.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(tot))
      .select(col("term"),
        round(log10(lit(1) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))), 6).as("idf6"))
    idx.join(stats, "docno")
      .join(broadcast(idf), "term")
      .crossJoin(broadcast(tot))
      .withColumn("c_micro", round(round(
        (col("idf6") * (col("tf") * lit(bm25K1 + 1))) /
          (col("tf") + lit(bm25K1) * (lit(1) - lit(bm25B) +
            lit(bm25B) * col("dl") / (col("total_dl") / col("n_docs")))),
        6) * 1e6, 0).cast("long"))
      .groupBy("docno")
      .agg(count(lit(1)).as("n_hit"), sum(col("c_micro")).as("score_micro"))
      .select(col("docno").as("doc_id"), col("n_hit"), col("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(bm25K)
  }

  /** TF-IDF top terms per source (Salton's weighting — the canonical
    * corpus-keyword extraction; Manning et al. IIR §6.2): tf aggregated
    * from the PERSISTED index artifact (never re-tokenizes the corpus —
    * the r6d retrieval discipline), df/N from the same artifact's df
    * column, source arriving through one doc-keyed equi-join. Scoring
    * follows the bm25 micro-unit discipline exactly (idf rounded 6dp,
    * tf·idf6 is one double multiply, micro-quantized to a long), so the
    * ranking is integer-exact cross-engine at any scale. The per-source
    * top-k lowers through the TopKRewrite rule to the bounded-PQ exec —
    * the custom operator carries a second production workload beyond
    * topk_by_group. */
  val tfidfK = 10
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val idx = persistedIndex(spark, dir) // term, df, docno, tf
    val nDocs = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n_docs"))
    val src = Tables.documents(spark, dir).select(col("doc_id").as("docno"), col("source"))
    val byTerm = idx.join(src, "docno")
      .groupBy("source", "term")
      .agg(sum(col("tf")).as("tf"), min(col("df")).as("df")) // df constant per term
    byTerm
      .crossJoin(broadcast(nDocs))
      .withColumn("idf6",
        round(log10(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("score_micro",
        round(col("idf6") * col("tf") * 1e6, 0).cast("long"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy(desc("score_micro"), col("term"))))
      .filter(col("rnk") <= tfidfK)
      .select(col("source"), col("term"), col("tf"), col("score_micro"), col("rnk"))
      .orderBy("source", "rnk")
  }

  /** Hybrid sparse+dense retrieval fused by Reciprocal Rank Fusion
    * (Cormack/Clarke/Büttcher SIGIR 2009 — the standard score-free
    * fusion rule, and the default hybrid-search combiner in production
    * RAG/search stacks). ONE text query, scored two ways:
    *  - sparse leg: the [[bm25Retrieval]] top-[[bm25K]] (term-pruned
    *    probe of the persisted index — nothing rescans the corpus);
    *  - dense leg: the SAME query terms featurized through
    *    [[DocEmbedding]]'s hashing-trick projection into a CONSTANT
    *    query vector (driver-side, shipped as a literal), scored by
    *    codegen'd cosine against the per-doc vectors — a map-only scan
    *    lowered to TakeOrderedAndProject, no shuffle beyond the
    *    vector build's one aggregation.
    * Fusion never looks at raw scores (BM25 micro-units and cosine are
    * incommensurable): each leg contributes 1/(k + rank), k=[[rrfK]],
    * summed over the legs that retrieved the doc. Ranks are
    * deterministic (score desc, doc_id), the reciprocal sums are two
    * IEEE divisions + one add on both engines, rounded to 6dp.
    *
    * Scale shape: both legs are top-k bounded, so the fusion join is
    * |2k| rows regardless of corpus size; at 100 TB the dense leg's
    * exhaustive scan would route through the IVFADC index
    * ([[Similarity]]) — the fusion layer is unchanged by that swap. */
  val rrfK = 60
  val hybridTopK = 20
  def hybridRetrievalRrf(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.orderBy(desc("score_micro"), col("doc_id"))
    val sparse = bm25Retrieval(spark, dir)
      .withColumn("bm25_rank", row_number().over(wAll))
      .select("doc_id", "bm25_rank")
    val qv = typedlit(DocEmbedding.queryVector(bm25Terms))
    val dense = DocEmbedding.docVectors(spark, dir)
      .select(col("doc_id"),
        round(graft.functions.CosineSimilarity.cosine_similarity(col("v"), qv), 6)
          .as("cos6"))
      .orderBy(desc("cos6"), col("doc_id")).limit(bm25K)
      .withColumn("dense_rank",
        row_number().over(Window.orderBy(desc("cos6"), col("doc_id"))))
      .select("doc_id", "dense_rank")
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf6", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")), lit(0.0)), 6))
      .orderBy(desc("rrf6"), col("doc_id"))
      .limit(hybridTopK)
      // rank 0 = "not in this leg's top-k" (typed, null-free output)
      .select(col("doc_id"),
        coalesce(col("bm25_rank"), lit(0)).as("bm25_rank"),
        coalesce(col("dense_rank"), lit(0)).as("dense_rank"),
        col("rrf6"))
  }

  /** Phrase retrieval over the POSITIONAL postings (artifact 3) — the
    * classic extension the reference's boolean-only retrieval cannot
    * express (a positional index is what "phrase query" costs; Manning
    * et al., IIR §2.4). The phrase's terms are fetched as term-pruned
    * artifact scans (one row per (term, doc) with the full position
    * list), equi-joined on docno — so only documents containing EVERY
    * phrase term ever meet — and the match count is a position-list
    * intersection folded as array HOFs: start positions p in the first
    * term's list surviving `array_contains(positions_i, p + i)` for each
    * subsequent term. No corpus re-scan, no explode of positions into
    * rows — the per-doc position lists stay packed. */
  val phraseTerms: Seq[String] = Seq("big", "order", "scan")
  def phraseRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val pos = positionalIndex(spark, dir)
    val joined = phraseTerms.zipWithIndex.map { case (t, i) =>
      pos.filter(col("term") === t).select(col("docno"), col("positions").as(s"p$i"))
    }.reduce(_.join(_, "docno"))
    val starts = phraseTerms.indices.tail.foldLeft(col("p0")) { (acc, i) =>
      filter(acc, p => array_contains(col(s"p$i"), p + lit(i)))
    }
    joined.select(col("docno").as("doc_id"), size(starts).as("n_matches"))
      .filter(col("n_matches") > 0)
      .orderBy("doc_id")
  }

  /** Incremental-ingest slice convention (the dedup_incremental play):
    * docs with doc_id ≡ [[indexBatchRem]] (mod [[indexBatchMod]]) are
    * the NEWLY-ARRIVED batch; the rest are the standing corpus whose
    * index already exists. */
  val indexBatchMod = 4
  val indexBatchRem = 3

  /** Incremental index maintenance: merge a newly-arrived document
    * batch into the standing index WITHOUT re-tokenizing the corpus —
    * the per-ingest cost at 100 TB must scale with the batch, not the
    * lake. Only the batch slice is tokenized; the standing side is a
    * term-pruned PROBE of the persisted artifact restricted (semi-join
    * on the batch's distinct terms) to the postings the ingest actually
    * touches; the union re-derives df with one window over term. The
    * output is the incremental WRITE SET: the updated posting rows for
    * every term the batch mentions — what a MapFile-style index merge
    * would rewrite (reference S6's artifact, maintained instead of
    * rebuilt). Deliberate trade: the batch tf subtree evaluates twice
    * (once for the touched-term set, once for the union side) — two
    * scans of the BATCH slice, which is the cheap half; the one-pass
    * alternative (flag column + windowed batch-count filter) would
    * drag the ENTIRE standing index through the df window before
    * restriction. Batch ≪ index, so the double batch scan wins at any
    * realistic ingest ratio. */
  def indexIncremental(spark: SparkSession, dir: String): DataFrame = {
    val standing = persistedIndex(spark, dir)
      .filter(col("docno") % indexBatchMod =!= indexBatchRem)
      .select("term", "docno", "tf")
    val batch = Tables.documents(spark, dir)
      .filter(col("doc_id") % indexBatchMod === indexBatchRem)
      .select(col("doc_id"), explode(tokenize(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id").as("docno"), col("tf"))
    standing.join(batch.select("term").distinct(), Seq("term"), "left_semi")
      .unionByName(batch)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .select("term", "df", "docno", "tf")
      .orderBy("term", "docno")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "index_incremental" -> (indexIncremental _),
    "phrase_retrieval" -> (phraseRetrieval _),
    "inverted_index_flat" -> (invertedIndexFlat _),
    "inverted_index_packed" -> (invertedIndexPacked _),
    "index_term_lookup" -> (indexTermLookup _),
    "bm25_retrieval" -> (bm25Retrieval _),
    "retrieval_hybrid_rrf" -> (hybridRetrievalRrf _),
    "tfidf_top_terms" -> (tfidfTopTerms _)) ++
    retrievalQueries.map { case (name, q) => name -> booleanRetrieval(q) _ }

  private[operators] val tfSql =
    s"""toks AS (
         SELECT doc_id,
                ${graft.functions.TextFunctions.tokenizeSql} AS ws
         FROM documents),
       tf AS (
         SELECT w AS term, doc_id, count(*) AS tf
         FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
         GROUP BY w, doc_id)"""

  val oracleSql: Map[String, String] = Map(
    "inverted_index_flat" ->
      s"""WITH $tfSql
          SELECT term, count(*) OVER (PARTITION BY term) AS df,
                 doc_id AS docno, tf
          FROM tf ORDER BY term, docno""",
    "inverted_index_packed" ->
      s"""WITH $tfSql
          SELECT term, count(*) AS df,
                 string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
          FROM tf GROUP BY term ORDER BY term""",
    "index_term_lookup" ->
      s"""WITH $tfSql
          SELECT term, count(*) OVER (PARTITION BY term) AS df,
                 doc_id AS docno, tf
          FROM tf WHERE term IN ('spark', 'data', 'dup')
          ORDER BY term, docno""",
    "bm25_retrieval" -> bm25Sql,
    "retrieval_hybrid_rrf" -> hybridRrfSql,
    "tfidf_top_terms" ->
      s"""WITH $tfSql,
          nd AS (SELECT count(*) AS n_docs FROM documents),
          wd AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
          g AS (
            SELECT d.source, t.term, sum(t.tf)::BIGINT AS tf
            FROM tf t JOIN documents d USING (doc_id)
            GROUP BY d.source, t.term),
          scored AS (
            SELECT g.source, g.term, g.tf,
                   round(round(log10(n_docs::DOUBLE / w.df), 6) * g.tf
                     * 1000000)::BIGINT AS score_micro
            FROM g JOIN wd w USING (term), nd),
          r AS (
            SELECT source, term, tf, score_micro,
                   row_number() OVER (PARTITION BY source
                     ORDER BY score_micro DESC, term) AS rnk
            FROM scored)
          SELECT source, term, tf, score_micro, rnk
          FROM r WHERE rnk <= $tfidfK ORDER BY source, rnk""",
    "phrase_retrieval" -> phraseSql,
    // merged == the full-corpus index restricted to batch-touched terms
    // (standing probe + fresh batch tf is definitionally that set)
    "index_incremental" ->
      s"""WITH $tfSql,
          batch_terms AS (
            SELECT DISTINCT term FROM tf
            WHERE doc_id % $indexBatchMod = $indexBatchRem)
          SELECT term, count(*) OVER (PARTITION BY term) AS df,
                 doc_id AS docno, tf
          FROM tf
          WHERE term IN (SELECT term FROM batch_terms)
          ORDER BY term, docno""",
  ) ++ retrievalQueries.map { case (name, q) => name -> booleanRetrievalSql(q) }

  /** Phrase oracle, generated from [[phraseTerms]] (no-drift discipline):
    * 0-based token positions via a lateral range, then one self-join per
    * subsequent term on `pos = p0 + i` — the row-relational mirror of the
    * Spark side's packed position-list intersection. */
  private def phraseSql: String = {
    val joins = phraseTerms.indices.tail.map(i =>
      s"JOIN pos t$i ON t$i.doc_id = t0.doc_id AND t$i.pos = t0.pos + $i")
      .mkString("\n          ")
    val preds = phraseTerms.zipWithIndex.map { case (t, i) =>
      s"t$i.term = '${t.replace("'", "''")}'" }.mkString(" AND ")
    s"""WITH toks AS (
          SELECT doc_id,
                 ${graft.functions.TextFunctions.tokenizeSql} AS ws
          FROM documents),
        pos AS (
          SELECT doc_id, ws[i + 1] AS term, i AS pos
          FROM toks, unnest(range(len(ws))) AS u(i))
        SELECT t0.doc_id, count(*) AS n_matches
        FROM pos t0
          $joins
        WHERE $preds
        GROUP BY t0.doc_id
        ORDER BY t0.doc_id"""
  }

  /** The BM25 oracle, generated from the SAME constants and with the
    * SAME operator grouping as [[bm25Retrieval]]'s Column expression —
    * string-interpolating k1/b/(k1+1) guarantees both engines parse the
    * identical decimal literals (Scala's shortest-round-trip toString). */
  /** The BM25 pipeline as CTEs (shared by the bm25_retrieval oracle and
    * the hybrid-RRF oracle's sparse leg). */
  private def bm25CtesSql: String = {
    val terms = bm25Terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val k1p1 = (bm25K1 + 1).toString
    s"""$tfSql,
        stats AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
        tot AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM stats),
        qdf AS (SELECT term, count(*) AS df FROM tf
                WHERE term IN ($terms) GROUP BY term),
        idf AS (SELECT term,
                       round(log10(1 + (n_docs - df + 0.5) / (df + 0.5)), 6) AS idf6
                FROM qdf, tot),
        scored AS (
          SELECT t.doc_id,
                 round(round(i.idf6 * (t.tf * $k1p1) /
                   (t.tf + $bm25K1 * (1 - $bm25B + $bm25B * s.dl / (total_dl / n_docs))),
                   6) * 1000000)::BIGINT AS c_micro
          FROM tf t JOIN idf i USING (term) JOIN stats s USING (doc_id), tot)"""
  }

  private def bm25Sql: String =
    s"""WITH $bm25CtesSql
        SELECT doc_id, count(*) AS n_hit, sum(c_micro)::BIGINT AS score_micro
        FROM scored GROUP BY doc_id
        ORDER BY score_micro DESC, doc_id LIMIT $bm25K"""

  /** Hybrid RRF oracle: the sparse leg is the bm25 CTE chain above; the
    * dense leg recomputes the hashing-trick doc vectors AND the query
    * vector symbolically from the term list (DocEmbedding's oracle
    * formulation, renamed CTEs to avoid colliding with tfSql's), then
    * fuses by 1/(k+rank) exactly as the plan does. Components are
    * integer-valued doubles, so dot/norms are exact in any order and the
    * cosine is the same dot/(sqrt·sqrt) IEEE sequence the codegen'd
    * expression evaluates. */
  private def hybridRrfSql: String = {
    val terms = bm25Terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val B = DocEmbedding.featureBuckets
    val D = DocEmbedding.embDim
    val sign = s"""CASE WHEN ${md5IntSql("feature::VARCHAR || '_' || d::VARCHAR", 1)} % 2 = 1
                   THEN 1.0 ELSE -1.0 END"""
    s"""WITH $bm25CtesSql,
        bm25 AS (
          SELECT doc_id, sum(c_micro)::BIGINT AS score_micro
          FROM scored GROUP BY doc_id
          ORDER BY score_micro DESC, doc_id LIMIT $bm25K),
        branked AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY score_micro DESC, doc_id) AS bm25_rank
          FROM bm25),
        vtf AS (
          SELECT doc_id, ${md5IntSql("w", 8)} % $B AS feature, count(*) AS cnt
          FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
          GROUP BY doc_id, feature),
        vcomp AS (
          SELECT doc_id, d, sum(cnt * $sign) AS s
          FROM vtf CROSS JOIN unnest(range(0, $D)) AS u(d)
          GROUP BY doc_id, d),
        qtoks AS (SELECT unnest([$terms]) AS w),
        qtf AS (SELECT ${md5IntSql("w", 8)} % $B AS feature, count(*) AS cnt
                FROM qtoks GROUP BY feature),
        qcomp AS (
          SELECT d, sum(cnt * $sign) AS s
          FROM qtf CROSS JOIN unnest(range(0, $D)) AS u(d)
          GROUP BY d),
        qnorm AS (SELECT sum(s * s) AS nb FROM qcomp),
        dsc AS (
          SELECT c.doc_id, sum(c.s * q.s) AS dot, sum(c.s * c.s) AS na
          FROM vcomp c JOIN qcomp q USING (d) GROUP BY c.doc_id),
        dcos AS (
          SELECT doc_id, CASE WHEN na = 0 OR nb = 0 THEN 0.0
                              ELSE round(dot / (sqrt(na) * sqrt(nb)), 6) END AS cos6
          FROM dsc, qnorm),
        dtop AS (SELECT doc_id, cos6 FROM dcos ORDER BY cos6 DESC, doc_id LIMIT $bm25K),
        dranked AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY cos6 DESC, doc_id) AS dense_rank
          FROM dtop)
        SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
               coalesce(b.bm25_rank, 0) AS bm25_rank,
               coalesce(d.dense_rank, 0) AS dense_rank,
               round(coalesce(1.0 / ($rrfK + b.bm25_rank), 0.0) +
                     coalesce(1.0 / ($rrfK + d.dense_rank), 0.0), 6) AS rrf6
        FROM branked b FULL OUTER JOIN dranked d ON b.doc_id = d.doc_id
        ORDER BY rrf6 DESC, doc_id LIMIT $hybridTopK"""
  }
}
