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
}
