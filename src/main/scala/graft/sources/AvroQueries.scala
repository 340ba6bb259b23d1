package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered query over the [[AvroTableProvider graft-avro]] source:
  * the documents table is materialized ONCE per (session, sfDir) as
  * Avro container files (executor-side distributed write), read back
  * through the DSv2 split-aware scan, and aggregated — while the
  * ORACLE aggregates the ORIGINAL parquet table in DuckDB, never
  * touching Avro. Parity therefore gates the whole write→read round
  * trip end-to-end: any value the codec mangles (string bytes, long
  * ids, char counts) breaks the hash. Independent-class oracle by
  * construction (OracleAudit).
  *
  * The memoized conversion is the same standing-artifact discipline as
  * the dedup/ANN family builds: a lake's format conversion is paid
  * once, queries pay marginal scan cost. Bench times the query with
  * the conversion inside (avro_roundtrip has no family build metric —
  * one query would amortize against nothing). */
object AvroQueries {

  private val memo = scala.collection.mutable.Map.empty[(SparkSession, String), String]

  private[graft] def avroDirFor(spark: SparkSession, dir: String): String =
    memo.synchronized {
      memo.getOrElseUpdate((spark, dir), {
        val out = "target/graft-avro-docs/" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")
        AvroIo.writeAvro(
          graft.Tables.documents(spark, dir)
            .select("doc_id", "text", "lang", "source", "n_chars"), out)
        out
      })
    }

  def avroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = avroDirFor(spark, dir)
    spark.read.format("graft-avro").option("path", path).load()
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("cnt"),
        sum("n_chars").as("sum_chars"),
        sum(length(col("text"))).as("sum_len"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .orderBy("lang", "source")
  }

  def clearMemos(): Unit = memo.synchronized { memo.clear() }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "avro_roundtrip" -> (avroRoundtrip _))

  /** DuckDB over the parquet documents table — the Avro path never
    * appears on the oracle side. */
  val oracleSql: Map[String, String] = Map(
    "avro_roundtrip" ->
      """SELECT lang, source, count(*) AS cnt,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       sum(length(text))::BIGINT AS sum_len,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
