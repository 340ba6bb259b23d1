package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered query over Spark's built-in ORC source — the second
  * columnar lake format after parquet (different codec, different
  * encoding stack: ORC RLE/dictionary + zlib vs parquet's), closing the
  * format matrix the engine serves: parquet (canonical), pipe-text/csv
  * (reference dual-format contract), Avro (row format, graft-avro DSv2),
  * ORC (columnar alternative).
  *
  * Same artifact discipline as [[AvroQueries]]: the documents table is
  * materialized ONCE per (session, sfDir) as zlib ORC, then read back
  * with a PUSHED predicate + pruned columns — the round trip exercises
  * write encode, split planning, predicate pushdown (ORC searchable
  * argument / row-group skipping) and decode, while the ORACLE evaluates
  * the same filter + aggregate on the ORIGINAL parquet in DuckDB, never
  * touching ORC. Any value the codec or the pushdown mangles breaks the
  * hash — Independent-class oracle by construction.
  *
  * SourcesSpec pins the scan side: PushedFilters reaches the OrcScan
  * and the read schema is exactly the pruned column set. */
object OrcQueries {

  /** The filtered slice: a selective range + equality conjunction, the
    * shape ORC's min/max stripe statistics actually skip on. */
  val orcMinChars = 200L

  private val memo = scala.collection.mutable.Map.empty[(SparkSession, String), String]

  private[graft] def orcDirFor(spark: SparkSession, dir: String): String =
    memo.synchronized {
      memo.getOrElseUpdate((spark, dir), {
        val out = "target/graft-orc-docs/" +
          dir.replaceAll("[^A-Za-z0-9.]", "_")
        // the artifact is WIDER than any one query needs (text_len is
        // conversion-time materialized metadata, the lake-table norm) —
        // so the round-trip query also proves ORC column pruning: it
        // decodes every ORIGINAL column and skips text_len, which the
        // registry-wide wide-scan audit (ScaleDesignSpec) checks
        graft.Tables.documents(spark, dir)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .withColumn("text_len", org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text")))
          .write.mode("overwrite").option("compression", "zlib").orc(out)
        out
      })
    }

  /** Read-side schema, explicit (no inference pass — and an EMPTY
    * artifact, a legal lake state, has no footer to infer from). */
  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text_len", org.apache.spark.sql.types.IntegerType)))

  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = orcDirFor(spark, dir)
    spark.read.schema(schema).orc(path)
      .filter(col("n_chars") >= orcMinChars && col("lang") === "en")
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
    "orc_roundtrip" -> (orcRoundtrip _))

  /** DuckDB over the parquet documents table — the ORC path never
    * appears on the oracle side. */
  val oracleSql: Map[String, String] = Map(
    "orc_roundtrip" ->
      s"""SELECT source, count(*) AS cnt,
         |       sum(n_chars)::BIGINT AS sum_chars,
         |       sum(length(text))::BIGINT AS sum_len,
         |       min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents
         |WHERE n_chars >= $orcMinChars AND lang = 'en'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
