package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft-avro: the DSv2 Avro read (sync-marker splits, decoder-level
  * column pruning) and the writer half it round-trips against. */
class AvroSpec extends AnyFunSuite {

  private lazy val spark = TestSession.spark
  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_avro_").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("round trip: every supported type survives write -> DSv2 read") {
    import spark.implicits._
    val dir = tmpDir()
    val df = spark.range(0, 1000).select(
      col("id"),
      (col("id") % 7).cast("int").as("small"),
      (col("id") * 1.5).as("d"),
      (col("id") % 2 === 0).as("even"),
      concat(lit("s"), col("id")).as("s"),
      when(col("id") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("n"), col("id"))).as("maybe"),
      encode(concat(lit("b"), col("id")), "UTF-8").as("bin"),
      to_date(lit("2024-03-01")).as("dt"),
      to_timestamp(lit("2024-03-01 12:34:56.789")).as("ts"),
      array(col("id"), col("id") + 1).as("arr"),
      map(lit("k1"), col("id") * 1.0, lit("k2"), col("id") * 2.0).as("m"),
      struct(col("id").as("a"), concat(lit("x"), col("id")).as("b")).as("st"))
    graft.sources.AvroIo.writeAvro(df, dir)
    val back = spark.read.format("graft-avro").option("path", dir).load()
    assert(back.schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
    assert(back.count() == 1000)
    // set equality over a canonical projection (map ordering is not
    // positional, so compare map fields by sorted entries)
    val canon = (f: org.apache.spark.sql.DataFrame) => f.select(
      col("id"), col("small"), col("d"), col("even"), col("s"),
      col("maybe"), col("bin").cast("string").as("bin_s"),
      col("dt").cast("string"), col("ts").cast("string"),
      col("arr"), col("m")("k1").as("m1"), col("m")("k2").as("m2"),
      col("st.a"), col("st.b"))
    assert(canon(back).exceptAll(canon(df)).count() == 0)
    assert(canon(df).exceptAll(canon(back)).count() == 0)
    // null round trip
    assert(back.filter(col("maybe").isNull).count() == 200)
  }

  test("sync-marker splits: byte-range partitions cover every record " +
       "exactly once and parallelize one big file") {
    import spark.implicits._
    val dir = tmpDir()
    val df = spark.range(0, 200000).select(col("id"),
      concat(lit("pad-pad-pad-"), col("id")).as("s")).coalesce(1)
    graft.sources.AvroIo.writeAvro(df, dir)
    val back = spark.read.format("graft-avro").option("path", dir)
      .option("maxSplitBytes", 65536L).load()
    val parts = back.rdd.getNumPartitions
    assert(parts > 4, s"one multi-MB file must split, got $parts partition(s)")
    assert(back.count() == 200000, "splits must cover every record exactly once")
    assert(back.agg(sum("id")).head.getLong(0) == 199999L * 200000L / 2,
      "split coverage must be disjoint AND complete")
  }

  test("column pruning reaches the avro decoder: the scan's read schema " +
       "is exactly the requested columns") {
    val dir = tmpDir()
    graft.sources.AvroIo.writeAvro(
      spark.range(0, 100).select(col("id"), lit("w").as("wide1"),
        lit(3.0).as("wide2")), dir)
    val pruned = spark.read.format("graft-avro").option("path", dir).load()
      .select("id")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans == Seq(Seq("id")),
      s"scan must read only [id], got $scans")
    assert(pruned.count() == 100)
  }

  test("reader-only avro shapes: enum, fixed, and timestamp-millis map in") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = tmpDir()
    val schema = SchemaBuilder.record("r").fields()
      .name("e").`type`(Schema.createEnum("color", null, null,
        java.util.Arrays.asList("RED", "GREEN"))).noDefault()
      .name("fx").`type`(Schema.createFixed("f8", null, null, 4)).noDefault()
      .name("tms").`type`(org.apache.avro.LogicalTypes.timestampMillis()
        .addToSchema(Schema.create(Schema.Type.LONG))).noDefault()
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "fix.avro"))
    val rec = new GenericData.Record(schema)
    rec.put("e", new GenericData.EnumSymbol(schema.getField("e").schema, "GREEN"))
    rec.put("fx", new GenericData.Fixed(schema.getField("fx").schema,
      Array[Byte](1, 2, 3, 4)))
    rec.put("tms", 1709296496789L) // 2024-03-01T12:34:56.789Z
    w.append(rec); w.close()
    val back = spark.read.format("graft-avro").option("path", dir).load()
    val row = back.select(col("e"), col("fx"),
      col("tms").cast("string").as("t")).head
    assert(row.getString(0) == "GREEN")
    assert(row.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3, 4))
    assert(row.getString(2) == "2024-03-01 12:34:56.789")
  }

  test("unsupported shapes fail loudly at inference, not silently coerce") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = tmpDir()
    val schema = SchemaBuilder.record("r").fields()
      .name("u").`type`(Schema.createUnion(
        Schema.create(Schema.Type.INT), Schema.create(Schema.Type.STRING)))
      .noDefault().endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "u.avro"))
    val rec = new GenericData.Record(schema); rec.put("u", 1)
    w.append(rec); w.close()
    val ex = intercept[Exception] {
      spark.read.format("graft-avro").option("path", dir).load().collect()
    }
    assert(ex.getMessage.contains("unions with null"),
      s"expected a loud non-null-union rejection, got: ${ex.getMessage}")
  }

  test("registered avro_roundtrip agrees with the parquet-side aggregate " +
       "(the oracle's own shape, in-engine)") {
    val dir = "/root/testdata/sf0.001"
    graft.sources.AvroQueries.clearMemos()
    val viaAvro = graft.sources.AvroQueries.avroRoundtrip(spark, dir)
    val viaParquet = graft.Tables.documents(spark, dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("cnt"), sum("n_chars").as("sum_chars"),
        sum(length(col("text"))).as("sum_len"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("lang", "source")
    assert(viaAvro.collect().toSeq == viaParquet.collect().toSeq)
  }

  test("registered orc_roundtrip agrees with the parquet-side filtered aggregate, " +
       "and the predicate is pushed into the ORC scan") {
    val dir = "/root/testdata/sf0.001"
    graft.sources.OrcQueries.clearMemos()
    val viaOrc = graft.sources.OrcQueries.orcRoundtrip(spark, dir)
    val viaParquet = graft.Tables.documents(spark, dir)
      .filter(col("n_chars") >= graft.sources.OrcQueries.orcMinChars &&
        col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("cnt"), sum("n_chars").as("sum_chars"),
        sum(length(col("text"))).as("sum_len"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("source")
    val got = viaOrc.collect().toSeq
    assert(got.nonEmpty && got == viaParquet.collect().toSeq)
    // the filter must reach the ORC scan as a pushed predicate (stripe
    // statistics skipping is what makes the selective read cheap at scale)
    val plan = viaOrc.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(n_chars") &&
      plan.contains("EqualTo(lang,en)"), plan.take(3000))
  }

  test("ORC footer-statistics aggregate pushdown: COUNT/MIN/MAX answered " +
       "from metadata through the DSv2 scan") {
    // at 100 TB a bare COUNT/MIN/MAX over a lake table should cost a
    // footer read per file, not a row scan — Spark lowers it when the
    // table rides the V2 read path with aggregatePushdown on. Pin that
    // the lowering actually fires on our ORC artifact and agrees with
    // the row-scan answer.
    val dir = "/root/testdata/sf0.001"
    graft.sources.OrcQueries.clearMemos()
    val path = graft.sources.OrcQueries.orcDirFor(spark, dir)
    val prevAgg = spark.conf.getOption("spark.sql.orc.aggregatePushdown")
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    try {
      spark.conf.set("spark.sql.orc.aggregatePushdown", "true")
      spark.conf.set("spark.sql.sources.useV1SourceList",
        prevV1.split(",").filterNot(_.trim == "orc").mkString(","))
      val agg = spark.read.orc(path)
        .agg(count(lit(1)).as("cnt"), min("doc_id").as("lo"), max("doc_id").as("hi"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)") &&
        plan.contains("MIN(doc_id)") && plan.contains("MAX(doc_id)"),
        plan.take(3000))
      val r = agg.collect()(0)
      val want = graft.Tables.documents(spark, dir)
        .agg(count(lit(1)), min("doc_id"), max("doc_id")).collect()(0)
      assert(r.getLong(0) == want.getLong(0) && r.getLong(1) == want.getLong(1) &&
        r.getLong(2) == want.getLong(2))
    } finally {
      prevAgg match {
        case Some(v) => spark.conf.set("spark.sql.orc.aggregatePushdown", v)
        case None => spark.conf.unset("spark.sql.orc.aggregatePushdown")
      }
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
    }
  }
}
