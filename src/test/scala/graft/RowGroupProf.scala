package graft

import org.apache.spark.sql.functions._

/** Row-group-parallelism diagnosis (PLANS.md round 11): every driver
  * fixture is a SINGLE-ROW-GROUP parquet file, so a raw-table scan
  * plans one productive task no matter how maxPartitionBytes /
  * openCostInBytes split the byte range (parquet assigns a row group to
  * the split holding its midpoint). This prof proves it by re-writing
  * `documents` once with proper row-group sizing and timing the SAME
  * map-only query against both layouts.
  *
  *   sbt -batch "Test/runMain graft.RowGroupProf <dir> [files]"
  */
object RowGroupProf extends App {
  val dir = args.headOption.getOrElse("/tmp/graftscale/sf1")
  val nFiles = if (args.length > 1) args(1).toInt else 32
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  val relaid = java.nio.file.Files.createTempDirectory("graft-rg").toString
  val tw0 = System.nanoTime()
  spark.read.parquet(s"$dir/documents.parquet")
    .repartition(nFiles).write.mode("overwrite").parquet(relaid)
  println(f"relayout_write ${(System.nanoTime() - tw0) / 1e9}%.2fs ($nFiles files)")

  // r12 (verdict item 6): the WRITER-SIZED leg — ONE file, row groups
  // sized by the layout helper the lake writers now ship
  // (Lakehouse.layoutBlockBytes). Parallelism must come from row-group
  // count alone: parquet assigns a row group to the split holding its
  // midpoint, so a 1-file/N-group layout scans with up to N productive
  // tasks — proving writer sizing, not file fan-out, is the layout
  // decision.
  val sized = java.nio.file.Files.createTempDirectory("graft-rg-sized").toString
  val docBytes = graft.operators.Lakehouse.tableBytes(dir, "documents")
  val blockBytes = graft.operators.Lakehouse.layoutBlockBytes(spark, docBytes)
  val ts0 = System.nanoTime()
  spark.read.parquet(s"$dir/documents.parquet")
    .repartition(1).write.mode("overwrite")
    .option("parquet.block.size", blockBytes).parquet(sized)
  println(f"sized_write ${(System.nanoTime() - ts0) / 1e9}%.2fs " +
    f"(1 file, ${blockBytes / 1024 / 1024}MB row groups over ${docBytes >> 20}MB)")

  def tokenStatsOn(path: String) = spark.read.parquet(path)
    .select(col("doc_id"), graft.functions.TextFunctions.tokenize(col("text")).as("ws"),
      col("text"))
    .select(col("doc_id"), size(col("ws")).as("n_tokens"),
      size(array_distinct(col("ws"))).as("n_distinct"),
      regexp_count(lower(col("text")),
        lit(graft.operators.TextQuality.bpePattern)).as("n_bpe"))

  var sums: Seq[Seq[Any]] = Nil
  Seq("original(1 rg)" -> s"$dir/documents.parquet",
      s"relaid($nFiles)" -> relaid,
      "sized(1 file)" -> sized).foreach { case (label, path) =>
    var last: Seq[Any] = Nil
    val walls = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      last = tokenStatsOn(path)
        .agg(sum("n_tokens"), sum("n_distinct"), sum("n_bpe")).collect()(0).toSeq
      (System.nanoTime() - t0) / 1e9
    }
    sums = sums :+ last
    println(f"$label%-15s best=${walls.min}%.2fs " +
      f"all=${walls.map(w => f"$w%.2f").mkString(",")}")
  }
  println(s"parity=${if (sums.distinct.size == 1) "EXACT" else "BROKEN"}")
  spark.stop()
}
