package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text → embedding bridge: hashing-trick document vectors and
  * embedding-cosine near-dup over real text (the last member of the
  * mandate's dedup list, derived end-to-end from `documents` rather than
  * the pre-built `embeddings` table).
  *
  * Pipeline, all Column expressions until the shared pair kernel:
  *  1. token hashing trick: feature id = murmur3(token) mod B — the
  *     vocabulary-free featurization used at corpus scale;
  *  2. signed random projection to `embDim` dims: the projection entry
  *     for (feature, dim) is ±1 from a seeded hash (an Achlioptas-style
  *     sparse JL projection with the matrix virtualized into the hash —
  *     nothing is materialized or shipped);
  *  3. per-doc sums → dense vector; near-identical token multisets map to
  *     near-identical vectors, so cosine ≥ τ recovers the Jaccard
  *     near-dups (DocEmbeddingSpec pins recall against the exact pairs).
  *
  * Hash-seeded → rows-only check; the ScalaTest is the gate.
  */
object DocEmbedding {

  val featureBuckets = 4096
  val embDim = 32
  /** Calibrated on the corpus geometry: true Jaccard near-dups score
    * ≥ 0.958 (mean 0.994) while the random-pair p99 is 0.888 — the tiny
    * shared vocabulary keeps all docs correlated, so the near-dup bar
    * sits high. As in production, pairs above the bar would be verified
    * with exact Jaccard before dropping documents. */
  val cosineThreshold = 0.94

  /** (doc_id, v) dense document vectors. */
  def docVectors(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokenize(col("text"))).as("w"))
      .groupBy(col("doc_id"), pmod(hash(col("w")), lit(featureBuckets)).as("feature"))
      .agg(count(lit(1)).as("cnt"))
    // dim d component: Σ_features cnt · sign(feature, d); the ±1 sign is
    // murmur3(feature, d) parity — the virtualized projection matrix
    val dimCols = (0 until embDim).map { d =>
      sum(col("cnt") *
        (pmod(hash(col("feature"), lit(d)), lit(2)) * 2 - 1).cast("double"))
        .as(s"d$d")
    }
    tf.groupBy("doc_id")
      .agg(dimCols.head, dimCols.tail: _*)
      .select(col("doc_id"), array((0 until embDim).map(d => col(s"d$d")): _*).as("v"))
  }

  /** Near-dup doc pairs by embedding cosine (shared all-pairs kernel). */
  def docEmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    Similarity.cosinePairsKernel(spark,
      docVectors(spark, dir).as[(Long, Seq[Double])], cosineThreshold)
      .toDF("doc_a", "doc_b", "cosine")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_embedding_neardup" -> (docEmbeddingNearDup _))

  val oracleSql: Map[String, String] = Map.empty
}
