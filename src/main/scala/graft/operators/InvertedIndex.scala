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

  /** (doc_id, term, tf) — term frequencies per document. */
  private def termFreqs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokenize(col("text"))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Flattened index: one row per posting with the term's document
    * frequency (A13) — the oracle-friendly projection of the index. */
  def invertedIndexFlat(spark: SparkSession, dir: String): DataFrame =
    termFreqs(spark, dir)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .select(col("term"), col("df"), col("doc_id").as("docno"), col("tf"))
      .orderBy("term", "docno")

  /** Packed index: `term → df, "docno:tf,…"` with postings sorted by docno
    * — the logical MapFile record (A12), string-serialized so the DuckDB
    * oracle can hash-match it exactly (integers only, no float formatting).
    */
  def invertedIndexPacked(spark: SparkSession, dir: String): DataFrame =
    termFreqs(spark, dir)
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("tf")))),
            p => concat_ws(":", p.getField("doc_id"), p.getField("tf"))),
          ",").as("postings"))
      .orderBy("term")

  /** Postfix stack evaluation, parameterized on the query: terms push
    * doc-id sets; AND intersects, OR unions. Returns matching docs with a
    * text excerpt (the S11 "seek the collection at docno" analog is a join
    * back to documents). The query plan is assembled driver-side (it IS
    * the query planner), but the doc-id sets never leave the cluster. */
  def booleanRetrieval(query: Seq[String])(spark: SparkSession, dir: String): DataFrame = {
    val docSets = termFreqs(spark, dir)
    def termDocs(t: String) = docSets.filter(col("term") === t).select("doc_id")
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

  /** The on-disk index artifact (reference S6: the MapFile the index job
    * WRITES and retrieval re-opens, `BuildInvertedIndexCompressed.java:210`
    * / `BooleanRetrievalCompressed.java:140-147`): the packed index
    * range-partitioned and sorted by term, persisted as parquet. Sorting
    * at write time gives every row group a tight term min/max band, so a
    * term-equality filter on re-read prunes to the one row group holding
    * the term — the random-access story at scale. Built once per
    * (session, corpus); parquet dictionary/RLE encodings replace the
    * reference's hand-rolled d-gap+VInt compression. */
  private val indexMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  def persistedIndex(spark: SparkSession, dir: String): DataFrame =
    // synchronized: single evaluation per key (a doubled thunk would race
    // two overwrites of the same artifact path)
    indexMemo.synchronized {
      indexMemo.getOrElseUpdate((spark, dir), {
        val path = graft.Tables.artifactPath("target/graft-index", dir)
        invertedIndexPacked(spark, dir)
          .repartitionByRange(8, col("term"))
          .sortWithinPartitions("term")
          .write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      })
    }

  /** See [[Dedup.clearMemos]] — static-data assumption, Bench calls this
    * between timed runs for honest min-of-two measurement. */
  def clearMemos(): Unit = indexMemo.clear()

  /** S6: the MapFile `get(term)` point lookup — a predicate pushed into
    * the PERSISTED index scan (row-group pruning via term min/max). */
  def indexTermLookup(spark: SparkSession, dir: String): DataFrame =
    persistedIndex(spark, dir)
      .filter(col("term").isin("spark", "data", "dup"))
      .orderBy("term")

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "inverted_index_flat" -> (invertedIndexFlat _),
    "inverted_index_packed" -> (invertedIndexPacked _),
    "index_term_lookup" -> (indexTermLookup _)) ++
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
          SELECT term, count(*) AS df,
                 string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
          FROM tf WHERE term IN ('spark', 'data', 'dup')
          GROUP BY term ORDER BY term""",
  ) ++ retrievalQueries.map { case (name, q) => name -> booleanRetrievalSql(q) }
}
