package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Registered query over Spark's built-in JSON-lines source — THE
  * interchange format of pretraining corpora (one object per line;
  * every public text dataset ships this way at some stage). Same
  * artifact discipline as [[OrcQueries]]: the documents table is
  * materialized ONCE per (session, sfDir) as JSONL, read back with an
  * EXPLICIT schema (no inference pass — at 100 TB a schema-inference
  * scan is a full extra read of the lake) and pruned parsing (Spark's
  * Jackson path only materializes the requested fields), and
  * aggregated — while the ORACLE aggregates the ORIGINAL parquet, so
  * parity gates the serialize→parse round trip including string
  * escaping and numeric fidelity.
  *
  * Deliberately uncompressed: gzip JSONL is the common wire form but
  * each .gz is NON-splittable (one task per file — a 100 GB gzip file
  * serializes the whole read); at scale the right layouts are many
  * bounded-size files (as written here, one per task) or a splittable
  * codec. The artifact is wider than the query (text_len materialized
  * at conversion), so the parse-pruning claim is audit-visible like
  * the ORC twin's. */
object JsonlQueries {

  private val memo = scala.collection.mutable.Map.empty[(SparkSession, String), String]

  /** Read-side schema: the five original columns plus the conversion
    * metadata column the query deliberately never requests. */
  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType), StructField("text_len", IntegerType)))

  private[graft] def jsonlDirFor(spark: SparkSession, dir: String): String =
    memo.synchronized {
      memo.getOrElseUpdate((spark, dir), {
        val out = "target/graft-jsonl-docs/" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")
        graft.Tables.documents(spark, dir)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .withColumn("text_len", length(col("text")))
          .write.mode("overwrite").json(out)
        out
      })
    }

  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = jsonlDirFor(spark, dir)
    spark.read.schema(schema).json(path)
      .filter(col("n_chars") >= OrcQueries.orcMinChars && col("lang") === "en")
      .groupBy("source")
      .agg(
        count(lit(1)).as("cnt"),
        sum("n_chars").as("sum_chars"),
        sum(length(col("text"))).as("sum_len"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .orderBy("source")
  }

  def clearMemos(): Unit = memo.synchronized { memo.clear() }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jsonl_roundtrip" -> (jsonlRoundtrip _))

  /** DuckDB over the parquet documents table — the JSONL path never
    * appears on the oracle side. */
  val oracleSql: Map[String, String] = Map(
    "jsonl_roundtrip" ->
      s"""SELECT source, count(*) AS cnt,
         |       sum(n_chars)::BIGINT AS sum_chars,
         |       sum(length(text))::BIGINT AS sum_len,
         |       min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents
         |WHERE n_chars >= ${OrcQueries.orcMinChars} AND lang = 'en'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
