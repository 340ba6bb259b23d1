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

  private def bucketAgg(df: DataFrame): DataFrame =
    df.filter(col("id") < idCap)
      .groupBy("bucket", "tag")
      .agg(
        count(lit(1)).as("cnt"),
        sum("score").as("sum_score"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .orderBy("bucket", "tag")

  def synthBucketAgg(spark: SparkSession, dir: String): DataFrame =
    bucketAgg(spark.read.format("graft-synth")
      .option("rows", synthRows).option("partitions", synthPartitions)
      .load())

  /** Streaming twin: drain the generator's micro-batch stream (paced at
    * 10k ids/trigger — six AvailableNow batches) into a memory sink,
    * then run the SAME aggregate the batch query runs, against the SAME
    * oracle. The memory sink is bounded by `synthRows` and the drain is
    * the declared parity harness (bench-excluded with its twin); the
    * production shape is the unbounded readStream pipeline itself. */
  def synthStreamAgg(spark: SparkSession, dir: String): DataFrame = {
    val qn = "synth_stream_" + java.util.UUID.randomUUID().toString.take(8)
    val q = spark.readStream.format("graft-synth")
      .option("rows", synthRows).option("partitions", synthPartitions)
      .option("rowsPerBatch", 10000L)
      .load()
      .writeStream.format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    bucketAgg(spark.table(qn))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "synth_bucket_agg" -> synthBucketAgg,
    "synth_stream_agg" -> synthStreamAgg)

  /** Same Lehmer derivation over range(): x = id*48271 mod (2^31−1);
    * min/max on the double quotient are order-insensitive (no float
    * summation), sum is over the exact int `score`. The streaming twin
    * must reproduce the batch table exactly, so it carries the SAME
    * oracle. */
  private val bucketAggSql: String =
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
       |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "synth_bucket_agg" -> bucketAggSql,
    "synth_stream_agg" -> bucketAggSql)
}
