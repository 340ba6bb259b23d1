package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (extension mandate): media as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * partition-wise batches.
  *
  * Two parallel paths, both oracle-checked:
  *
  *   - the OPAQUE-BLOB path (`media*`): media derives from `documents`
  *     (text → UTF-8 blob) so the DuckDB oracle recomputes the same byte
  *     features from the text — this pins the schema, the metadata
  *     projection that lets Catalyst prune the heavy blob column, and
  *     the pure-column frame-sampling arithmetic;
  *
  *   - the REAL-CODEC path (`image*`): genuine PNG bytes encoded AND
  *     decoded with `javax.imageio` (JVM builtin — no new dependency)
  *     inside the partition-batched extraction boundary (`mapPartitions`
  *     over a typed Dataset — the Scala analog of `mapInPandas` batches;
  *     the codec is invoked per record within a partition batch,
  *     amortizing any per-partition setup a native decoder would need).
  *     Pixels follow a deterministic closed form, and PNG is lossless,
  *     so the DuckDB oracle verifies the decoded pixel statistics
  *     EXACTLY without itself decoding anything — the encode→decode
  *     round trip is inside the checked path.
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

  /** Partition-batched BYTE-domain feature extraction over the opaque
    * blob: byte length, unsigned sum of the first 16 header bytes, and
    * the 64-byte frame count — the cheap metadata-level pass a pipeline
    * runs before committing to a full decode (magic-byte sniffing,
    * corruption triage, size binning). The full-decode path with a real
    * codec is [[imageFeatures]]; both share this `mapPartitions`
    * extraction boundary. */
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
    // frame stats through the codegen'd byte kernel (r11): the per-byte
    // ascii(substr) lambda chain read 7.7 s at sf1 — the r6g lesson in
    // byte-domain form. ASCII corpus ⇒ byte length/sum ≡ the HOF forms'
    // char length/ascii sum (FunctionsSpec pins the law); oracle
    // unchanged.
    val frameBin = col("media").substr(col("frame_id") * frameBytes + 1, lit(frameBytes))
    mediaTable(spark, dir)
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("media"), posexplode(sampled).as(Seq("pos", "frame_id")))
      .select(col("doc_id"), col("frame_id"),
        length(frameBin).cast("int").as("frame_len"),
        graft.functions.ByteKernels.sum_bytes(frameBin).as("frame_sum"))
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
    // kept-byte count is plain arithmetic (⌊(n−1)/stride⌋+1) and the
    // kept-byte sum runs through the codegen'd stride kernel (r11) —
    // same value contract as the per-byte HOF it replaces (ASCII corpus;
    // FunctionsSpec pins the law), oracle unchanged
    mediaTable(spark, dir)
      .filter(col("n_bytes") > 0)
      .select(
        col("doc_id"),
        col("n_bytes").as("orig_len"),
        (floor((col("n_bytes") - 1) / resizeStride) + 1).cast("long").as("resized_len"),
        graft.functions.ByteKernels.stride_sum_bytes(col("media"), resizeStride)
          .as("resized_sum"))
      .orderBy("doc_id")
  }

  // ---- Real-codec path: javax.imageio over genuine PNG bytes ----

  /** Deterministic pixel channel value — the closed form the DuckDB
    * oracle and the ScalaTest golden recompute independently of any
    * codec. doc_id ≥ 0, so the Long remainder is already non-negative. */
  def pix(docId: Long, x: Int, y: Int, c: Int): Int =
    ((docId * 7 + x.toLong * 31 + y.toLong * 17 + c.toLong * 11) % 256).toInt
  def imgWidth(docId: Long): Int = 8 + (docId % 25).toInt
  def imgHeight(docId: Long): Int = 8 + (docId % 17).toInt

  /** The image table: one REAL PNG per document id, encoded on the
    * executors inside the partition-batched seam. `media` holds actual
    * PNG files (magic bytes, IHDR, zlib-compressed scanlines) — any
    * external PNG reader decodes them. */
  def imageTable(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    // codec parallelism must come from the WORK, not the input splits:
    // documents.parquet at fixture scale is one small file → one scan
    // partition, which serialized 50k PNG encodes onto a single core
    // (measured r11: image_features 18.3 s at sf1 on local[32]; 1.4 s
    // with this line + the memory-cache flag below). Only doc_ids
    // shuffle — 8 bytes/row at ANY scale
    // — so unlike repartitioning the blobs themselves, this stays cheap
    // at 100 TB. The blob-path ops (media*) deliberately do NOT do
    // this: their per-row cost is scan-bound, and at real scale the
    // input has many splits anyway — shuffling whole blobs to fix a
    // fixture-only skew would be the real anti-pattern.
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .repartition(sp.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
        // ImageIO's default stream cache backs every encode/decode with
        // a TEMP FILE (create+delete per image) — for thousands of tiny
        // PNGs the filesystem round trip IS the cost (measured r11: the
        // repartition alone got 18.3 s -> 8-10 s; the memory cache takes
        // it to 1.4 s). Idempotent per-executor flag, set inside the
        // partition seam.
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val w = imgWidth(id); val h = imgHeight(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                (pix(id, x, y, 0) << 16) | (pix(id, x, y, 1) << 8) | pix(id, x, y, 2))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray, "image/png")
        }
      }.toDF("doc_id", "media", "media_type")
  }

  /** Exact per-channel pixel sums off a decoded raster — the one shared
    * summation both image queries (and their oracles' closed forms)
    * agree on. */
  private def channelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var rs = 0L; var gs = 0L; var bs = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
        x += 1
      }
      y += 1
    }
    (rs, gs, bs)
  }

  /** REAL decode + feature extraction: `ImageIO.read` on each PNG inside
    * the partition batch, then width/height and exact per-channel pixel
    * sums off the decoded raster. The oracle recomputes the sums from
    * the pixel closed form — a lossy or misaligned decode fails the
    * hash, so the codec round trip itself is under test, not just the
    * plumbing around it. */
  def imageFeatures(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    imageTable(spark, dir).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val (rs, gs, bs) = channelSums(img)
          (id, img.getWidth, img.getHeight, rs, gs, bs)
        }
      }.toDF("doc_id", "width", "height", "r_sum", "g_sum", "b_sum")
      .orderBy("doc_id")
  }

  /** REAL resize: decode the PNG, nearest-neighbor downsample to half
    * resolution (out(x,y) = in(2x,2y) — the standard stride-2 nearest
    * kernel), RE-ENCODE the result as PNG, then decode THAT and report
    * its dimensions and channel sums — so the checked value has passed
    * through two full encode→decode round trips. The oracle states the
    * expected sums by substituting 2x/2y into the pixel closed form. */
  def imageResize(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    imageTable(spark, dir).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val ow = math.max(1, img.getWidth / 2)
          val oh = math.max(1, img.getHeight / 2)
          val out = new java.awt.image.BufferedImage(
            ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) { out.setRGB(x, y, img.getRGB(2 * x, 2 * y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val rt = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val (rs, gs, bs) = channelSums(rt)
          (id, rt.getWidth, rt.getHeight, rs, gs, bs)
        }
      }.toDF("doc_id", "width", "height", "r_sum", "g_sum", "b_sum")
      .orderBy("doc_id")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (mediaFeatures _),
    "multimodal_frame_sample" -> (mediaFrameSample _),
    "multimodal_resize" -> (mediaResize _),
    "image_features" -> (imageFeatures _),
    "image_resize" -> (imageResize _))

  /** The corpus is ASCII, so byte features equal character features —
    * which is what makes the opaque-blob path oracle-checkable. The
    * image oracles restate the pixel closed form over an exploded
    * (x, y) grid: the oracle never decodes a PNG, yet an exact match
    * certifies the executor-side encode→decode round trip bit-for-bit
    * (PNG is lossless; any codec drift breaks the channel sums). */
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
          FROM fr ORDER BY doc_id, frame_id""",
    "image_features" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 25 AS w, 8 + doc_id % 17 AS h
                    FROM documents)
         SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
                SUM((d.doc_id * 7 + x.x * 31 + y.y * 17) % 256)::BIGINT AS r_sum,
                SUM((d.doc_id * 7 + x.x * 31 + y.y * 17 + 11) % 256)::BIGINT AS g_sum,
                SUM((d.doc_id * 7 + x.x * 31 + y.y * 17 + 22) % 256)::BIGINT AS b_sum
         FROM d, range(0, 32) x(x), range(0, 24) y(y)
         WHERE x.x < d.w AND y.y < d.h
         GROUP BY 1, 2, 3 ORDER BY doc_id""",
    "image_resize" ->
      """WITH d AS (SELECT doc_id, (8 + doc_id % 25) // 2 AS w,
                           (8 + doc_id % 17) // 2 AS h
                    FROM documents)
         SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
                SUM((d.doc_id * 7 + 2 * x.x * 31 + 2 * y.y * 17) % 256)::BIGINT AS r_sum,
                SUM((d.doc_id * 7 + 2 * x.x * 31 + 2 * y.y * 17 + 11) % 256)::BIGINT AS g_sum,
                SUM((d.doc_id * 7 + 2 * x.x * 31 + 2 * y.y * 17 + 22) % 256)::BIGINT AS b_sum
         FROM d, range(0, 16) x(x), range(0, 12) y(y)
         WHERE x.x < d.w AND y.y < d.h
         GROUP BY 1, 2, 3 ORDER BY doc_id""")
}
