package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (extension mandate): media as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * partition-wise batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB — but every Spark-side piece a real
  * pipeline needs is genuine and tested: the binary column schema, the
  * partition-batched extraction boundary (`mapPartitions` over a typed
  * Dataset — the Scala analog of `mapInPandas` batches; a real decoder
  * would be invoked once per batch, amortizing native-lib setup), the
  * frame-sampling arithmetic, and the metadata projection that lets
  * Catalyst prune the heavy blob column when a query only needs metadata.
  *
  * The media table derives from `documents` (text → UTF-8 blob) so the
  * DuckDB oracle can recompute the same features from the text — making
  * even the stubbed path hash-checkable.
  */
object Multimodal {

  val headerBytes = 16
  val frameBytes = 64

  /** The media table: `(doc_id, media binary, media_type, n_bytes)`. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        lit("text/plain").as("media_type"),
        octet_length(col("text")).cast("long").as("n_bytes"))

  /** Partition-batched "decode + feature extract". STUB decode: byte
    * length, unsigned sum of the first 16 header bytes, and the 64-byte
    * frame count — a real implementation swaps the per-record lambda for
    * a batched native decoder call; the dataflow shape is identical. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          var i = 0
          var headerSum = 0L
          while (i < math.min(headerBytes, bytes.length)) {
            headerSum += bytes(i) & 0xff
            i += 1
          }
          val nFrames = (bytes.length + frameBytes - 1) / frameBytes
          (id, bytes.length.toLong, headerSum, nFrames.toLong)
        }
      }
      .toDF("doc_id", "byte_len", "header_sum", "n_frames")
      .orderBy("doc_id")
  }

  /** Frame sampling: every 4th 64-byte frame of each blob as its own row
    * (the video frame-sample / audio chunking shape), with a per-frame
    * checksum. Pure column expressions — `substring` on binary slices
    * frames, `posexplode` emits them — so the sampler stays codegen'd and
    * shuffle-free. */
  val frameStride = 4
  def mediaFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val nFrames = ceil(col("n_bytes").cast("double") / frameBytes).cast("int")
    val sampled = transform(
      sequence(lit(0), greatest(ceil(nFrames.cast("double") / frameStride).cast("int") - 1, lit(0))),
      i => i * frameStride)
    val frame = decode(
      col("media").substr(col("frame_id") * frameBytes + 1, lit(frameBytes)), "UTF-8")
    mediaTable(spark, dir)
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("media"), posexplode(sampled).as(Seq("pos", "frame_id")))
      .select(col("doc_id"), col("frame_id"),
        length(frame).as("frame_len"),
        aggregate(
          transform(sequence(lit(1), length(frame)),
            j => ascii(frame.substr(j, lit(1))).cast("long")),
          lit(0L), (acc, x) => acc + x).as("frame_sum"))
      .orderBy("doc_id", "frame_id")
  }

  /** Resize: nearest-neighbor downsample analog on the opaque blob —
    * keep every `resizeStride`-th byte (a real pipeline swaps the byte
    * decimation for a batched image resize; schema, pruning, and the
    * per-record arithmetic shape are what's exercised). Output carries
    * sizes plus a checksum of the resized payload, so the oracle
    * verifies the exact bytes kept, not just counts. Pure column
    * expressions, shuffle-free. */
  val resizeStride = 8
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    val resized = transform(
      sequence(lit(0), floor((col("n_bytes") - 1) / resizeStride).cast("int")),
      i => ascii(decode(col("media").substr(i * resizeStride + 1, lit(1)), "UTF-8"))
        .cast("long"))
    mediaTable(spark, dir)
      .filter(col("n_bytes") > 0)
      .select(
        col("doc_id"),
        col("n_bytes").as("orig_len"),
        size(resized).cast("long").as("resized_len"),
        aggregate(resized, lit(0L), (acc, x) => acc + x).as("resized_sum"))
      .orderBy("doc_id")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (mediaFeatures _),
    "multimodal_frame_sample" -> (mediaFrameSample _),
    "multimodal_resize" -> (mediaResize _))

  /** The corpus is ASCII, so byte features equal character features —
    * which is what makes the stub oracle-checkable. */
  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      s"""SELECT doc_id,
                 octet_length(encode(text)) AS byte_len,
                 list_sum(list_transform(
                   range(1, least(length(text) + 1, ${headerBytes + 1})),
                   i -> ascii(substr(text, i, 1))))::BIGINT AS header_sum,
                 CAST(ceil(octet_length(encode(text))::DOUBLE / $frameBytes) AS BIGINT)
                   AS n_frames
          FROM documents ORDER BY doc_id""",
    "multimodal_resize" ->
      s"""WITH r AS (
            SELECT doc_id, octet_length(encode(text)) AS orig_len,
                   [ascii(substr(text, i * $resizeStride + 1, 1))::BIGINT
                    for i in range(0, ((length(text) - 1) // $resizeStride) + 1)] AS kept
            FROM documents WHERE length(text) > 0)
          SELECT doc_id, orig_len,
                 len(kept)::BIGINT AS resized_len,
                 list_sum(kept)::BIGINT AS resized_sum
          FROM r ORDER BY doc_id""",
    "multimodal_frame_sample" ->
      s"""WITH d AS (
            SELECT doc_id, text,
                   CAST(ceil(length(text)::DOUBLE / $frameBytes) AS INT) AS nf
            FROM documents WHERE length(text) > 0),
          fr AS (
            SELECT doc_id, i AS frame_id,
                   substr(text, i * $frameBytes + 1, $frameBytes) AS frame
            FROM d, unnest(range(0, nf, $frameStride)) AS u(i))
          SELECT doc_id, frame_id, length(frame) AS frame_len,
                 list_sum(list_transform(range(1, length(frame) + 1),
                                         j -> ascii(frame[j])))::BIGINT AS frame_sum
          FROM fr ORDER BY doc_id, frame_id""")
}
