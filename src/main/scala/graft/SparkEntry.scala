package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a query here
  * (name → (session, sfDir) ⇒ DataFrame) and, where SQL-expressible, an
  * equivalent DuckDB oracle in [[oracleSql]]. Column aliases and row
  * ordering are kept identical on both sides (the driver hash-compares).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q6PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.registry ++ Relational.csvRegistry ++
      TextAnalytics.registry ++ TextQuality.registry ++
      Dedup.registry ++ Similarity.registry ++ InvertedIndex.registry ++
      EventAnalytics.registry ++ PageRank.registry ++ SpamClassifier.registry ++
      Multimodal.registry ++ DocEmbedding.registry ++ CorpusPipeline.registry ++
      TaxiEvents.registry ++ Bpe.registry ++ Lakehouse.registry ++
      graft.sources.Synthetic.registry ++
      graft.sources.AvroQueries.registry ++ graft.sources.OrcQueries.registry ++
      graft.sources.JsonlQueries.registry

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Relational.csvOracleSql ++
      TextAnalytics.oracleSql ++ TextQuality.oracleSql ++
      Dedup.oracleSql ++ Similarity.oracleSql ++ InvertedIndex.oracleSql ++
      EventAnalytics.oracleSql ++ PageRank.oracleSql ++ SpamClassifier.oracleSql ++
      Multimodal.oracleSql ++ DocEmbedding.oracleSql ++ CorpusPipeline.oracleSql ++
      TaxiEvents.oracleSql ++ Bpe.oracleSql ++ Lakehouse.oracleSql ++
      graft.sources.Synthetic.oracleSql ++
      graft.sources.AvroQueries.oracleSql ++ graft.sources.OrcQueries.oracleSql ++
      graft.sources.JsonlQueries.oracleSql

  /** Declared at-scale oracle contracts (r14, r13 verdict item 1).
    *
    * The sf0.01 driver gate checks every oracle hash-exact and is
    * unaffected by anything here. At LARGER scale factors two oracle
    * classes cannot stay in that form, and until r14 each sweep
    * explained them ad hoc; these maps make the explanation a machine-
    * readable contract the sweep tool (tools/selfcheck.py --scale)
    * resolves mechanically — a sweep row either passes exact, passes
    * under a named contract whose witness passed exact, or fails.
    *
    * [[floatRollupContracts]]: float-revenue rollups → their
    * integer-cents any-scale-exact twins (see
    * [[operators.Relational.scaleContracts]] for the ulp arithmetic).
    * The float form must still match to an ulp tolerance; the named
    * twin must pass exact in the same sweep.
    *
    * [[bruteOracleDelegates]]: queries whose DuckDB oracles are
    * deliberately brute all-pairs (the blocking/kernel completeness
    * proofs) → their deterministic bounded-sample twins, whose
    * IDENTICAL brute oracles stay feasible at 10-30x the graded scale.
    * Completeness for a pair depends only on the pair's own strings or
    * vectors, so the slice check carries the same per-pair claim at
    * scale; the corpus-wide form still gates sf0.01 exact. */
  def floatRollupContracts: Map[String, String] =
    Relational.scaleContracts ++ Relational.csvScaleContracts

  def bruteOracleDelegates: Map[String, String] = Map(
    "dedup_edit_distance" -> "dedup_edit_distance_sample",
    "dedup_edit_distance2" -> "dedup_edit_distance2_sample",
    "dedup_embedding_exact" -> "dedup_embedding_exact_sample",
    "doc_embedding_exact" -> "doc_embedding_exact_sample")
}
