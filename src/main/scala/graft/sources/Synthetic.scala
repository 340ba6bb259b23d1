package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered query over the [[SynthTableProvider graft-synth]]
  * generator source — the custom-DataSourceV2 extension surface,
  * oracle-checked like every other query because all columns are
  * closed-form functions of the row id that DuckDB reproduces over
  * `range(0, rows)`.
  *
  * The `dir` argument is deliberately unused: the source has no file
  * input (rows is a fixed option), which is also why the query is
  * bench-excluded — it cannot participate in the sf-scaling signal the
  * bench exists to measure (rationale in BenchFormat.fixedSizeSources).
  *
  * The `id < 50000` predicate is load-bearing: it exercises the
  * filter-pushdown → partition-pruning path end-to-end under the
  * oracle (the plan reads 7 of 8 planned slices; SourcesSpec pins the
  * pruning arithmetic directly).
  */
object Synthetic {

  val synthRows = 60000L
  val synthPartitions = 8
  val idCap = 50000L

  def synthBucketAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", synthRows).option("partitions", synthPartitions)
      .load()
      .filter(col("id") < idCap)
      .groupBy("bucket", "tag")
      .agg(
        count(lit(1)).as("cnt"),
        sum("score").as("sum_score"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .orderBy("bucket", "tag")

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "synth_bucket_agg" -> synthBucketAgg)

  /** Same Lehmer derivation over range(): x = id*48271 mod (2^31−1);
    * min/max on the double quotient are order-insensitive (no float
    * summation), sum is over the exact int `score`. */
  val oracleSql: Map[String, String] = Map(
    "synth_bucket_agg" ->
      s"""WITH g AS (
         |  SELECT id, (id * 48271) % 2147483647 AS x
         |  FROM range(0, $synthRows) t(id)
         |  WHERE id < $idCap
         |)
         |SELECT (x % 100)::INT AS bucket,
         |       't' || (x % 7) AS tag,
         |       count(*) AS cnt,
         |       sum((x % 1000)::INT)::BIGINT AS sum_score,
         |       min(x / 2147483647.0) AS min_value,
         |       max(x / 2147483647.0) AS max_value
         |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
