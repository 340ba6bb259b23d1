package graft.sources

import org.apache.avro.{Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableFileInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericEnumSymbol, GenericFixed, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.io.File
import scala.jdk.CollectionConverters._

/** `graft-avro` — Avro object-container-file READ as a DSv2 source,
  * built on the Avro core jar Spark itself ships (`avro-1.12`), because
  * the `spark-avro` DataSource module is absent from this deployment's
  * offline jar set (the capability gap PLANS.md carried since r6; this
  * closes it with public Avro APIs only — reference for the container
  * format and sync-marker protocol: the Apache Avro spec's object
  * container files section).
  *
  * Scale shape, deliberately the same as Spark's own file sources:
  *  - one task per (file, byte-range) SPLIT, not per file: Avro blocks
  *    are delimited by 16-byte sync markers, and `DataFileReader.sync(p)`
  *    seeks to the first block boundary at or after `p` while
  *    `pastSync(end)` stops the reader at the first boundary past the
  *    range end — together they give disjoint, complete coverage of a
  *    file by arbitrary byte ranges (the exact algorithm Hadoop's
  *    AvroInputFormat uses), so a 100 TB directory of large files
  *    parallelizes by `maxSplitBytes`, not file count.
  *  - top-level column pruning reaches the scan: the datum reader is
  *    given an `expected` schema containing only the requested fields,
  *    so Avro's decoder SKIPS the untouched columns byte-wise instead
  *    of materializing them.
  *
  * Type mapping (Avro → Spark): boolean/int/long/float/double/string/
  * enum→string/bytes/fixed→binary, date + timestamp-millis/micros
  * logical types, arrays, string-keyed maps, nested records, and
  * 2-branch unions with null (→ nullable). Anything else fails loudly
  * at schema inference — silent coercion is how a lake grows wrong
  * columns. */
class AvroTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = AvroIo.listFiles(AvroIo.pathOf(options))
    require(files.nonEmpty, s"graft-avro: no .avro files under ${AvroIo.pathOf(options)}")
    val r = new DataFileReader[GenericRecord](
      new SeekableFileInput(files.head), new GenericDatumReader[GenericRecord]())
    try AvroIo.toSparkType(r.getSchema).asInstanceOf[StructType]
    finally r.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new AvroTable(new CaseInsensitiveStringMap(properties), schema)
}

private[sources] class AvroTable(options: CaseInsensitiveStringMap,
    tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft_avro(${AvroIo.pathOf(options)})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(AvroIo.pathOf(options),
      opts.getLong("maxSplitBytes", 33554432L), tableSchema)
}

private[sources] class AvroScanBuilder(path: String, maxSplitBytes: Long,
    full: StructType) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the FILE's field order (the avro decoder visits fields in
    // writer order); Catalyst reorders post-scan projections itself
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new AvroScan(path, maxSplitBytes, required)
}

private[sources] class AvroScan(path: String, maxSplitBytes: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro $path cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    AvroIo.listFiles(path).flatMap { f =>
      val len = f.length()
      val nSplits = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
      (0L until nSplits).map { i =>
        AvroSplit(f.getAbsolutePath, i * maxSplitBytes,
          math.min((i + 1) * maxSplitBytes, len))
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)
}

private[sources] case class AvroSplit(file: String, start: Long, end: Long)
    extends InputPartition

private[sources] class AvroReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[AvroSplit]
    new AvroPartitionReader(s, required)
  }
}

private[sources] class AvroPartitionReader(split: AvroSplit, required: StructType)
    extends PartitionReader[InternalRow] {
  private val reader = {
    val datum = new GenericDatumReader[GenericRecord]()
    val r = new DataFileReader[GenericRecord](
      new SeekableFileInput(new File(split.file)), datum)
    // prune at the DECODER: expected schema = writer schema minus the
    // unrequested top-level fields; avro skips those byte-wise
    val writerSchema = r.getSchema
    if (required.fieldNames.length != writerSchema.getFields.size) {
      val kept = writerSchema.getFields.asScala
        .filter(f => required.fieldNames.contains(f.name))
        .map(f => new ASchema.Field(f.name, f.schema, f.doc, f.defaultVal()))
      val pruned = ASchema.createRecord(writerSchema.getName, writerSchema.getDoc,
        writerSchema.getNamespace, false, kept.toList.asJava)
      datum.setExpected(pruned)
    }
    // the avro split protocol: start at the first sync point >= start,
    // stop once past the first sync point >= end
    r.sync(split.start)
    r
  }
  private var current: GenericRecord = _

  override def next(): Boolean =
    if (reader.hasNext && !reader.pastSync(split.end)) {
      current = reader.next(); true
    } else false

  override def get(): InternalRow =
    AvroIo.toInternalRow(current, required)

  override def close(): Unit = reader.close()
}

object AvroIo {

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-avro requires option(\"path\", dir)")
    p
  }

  private[sources] def listFiles(path: String): Seq[File] = {
    val f = new File(path)
    val all = if (f.isFile) Seq(f)
      else Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
        .filter(x => x.isFile && x.getName.endsWith(".avro"))
    all.sortBy(_.getName)
  }

  // ---- Avro schema -> Spark type -------------------------------------

  def toSparkType(s: ASchema): DataType = s.getType match {
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
      else IntegerType
    case ASchema.Type.LONG => s.getLogicalType match {
      case lt if lt != null && lt.getName == "timestamp-micros" => TimestampType
      case lt if lt != null && lt.getName == "timestamp-millis" => TimestampType
      case _ => LongType
    }
    case ASchema.Type.FLOAT  => FloatType
    case ASchema.Type.DOUBLE => DoubleType
    case ASchema.Type.STRING | ASchema.Type.ENUM => StringType
    case ASchema.Type.BYTES | ASchema.Type.FIXED => BinaryType
    case ASchema.Type.ARRAY =>
      ArrayType(toSparkType(s.getElementType))
    case ASchema.Type.MAP =>
      MapType(StringType, toSparkType(s.getValueType))
    case ASchema.Type.RECORD =>
      StructType(s.getFields.asScala.map(f =>
        StructField(f.name, toSparkType(f.schema),
          nullable = isNullableUnion(f.schema))).toArray)
    case ASchema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != ASchema.Type.NULL)
      require(branches.size == 1,
        s"graft-avro: only unions with null are supported, got $s")
      toSparkType(branches.head)
    case other =>
      throw new IllegalArgumentException(s"graft-avro: unsupported avro type $other")
  }

  private def isNullableUnion(s: ASchema): Boolean =
    s.getType == ASchema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == ASchema.Type.NULL)

  private def nonNullBranch(s: ASchema): ASchema =
    if (s.getType == ASchema.Type.UNION)
      s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
    else s

  // ---- GenericRecord -> InternalRow ----------------------------------

  private[sources] def toInternalRow(rec: GenericRecord, schema: StructType): InternalRow = {
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      vals(i) = toCatalyst(rec.get(f.name),
        nonNullBranch(rec.getSchema.getField(f.name).schema), f.dataType)
      i += 1
    }
    new GenericInternalRow(vals)
  }

  private def toCatalyst(v: Any, avro: ASchema, dt: DataType): Any = v match {
    case null => null
    case s: CharSequence => UTF8String.fromString(s.toString)
    case e: GenericEnumSymbol[_] => UTF8String.fromString(e.toString)
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case fx: GenericFixed => fx.bytes().clone()
    case i: java.lang.Integer => dt match {
      case DateType => i.intValue() // days since epoch on both sides
      case _        => i.intValue()
    }
    case l: java.lang.Long => dt match {
      case TimestampType
        if avro.getLogicalType != null && avro.getLogicalType.getName == "timestamp-millis" =>
        l.longValue() * 1000L // to micros
      case _ => l.longValue()
    }
    case x: java.lang.Boolean => x.booleanValue()
    case x: java.lang.Float   => x.floatValue()
    case x: java.lang.Double  => x.doubleValue()
    case a: java.util.Collection[_] =>
      val el = avro.getElementType
      val edt = dt.asInstanceOf[ArrayType].elementType
      new GenericArrayData(a.asScala.map(toCatalyst(_, nonNullBranch(el), edt)).toArray)
    case m: java.util.Map[_, _] =>
      val vdt = dt.asInstanceOf[MapType].valueType
      val vs = avro.getValueType
      val keys = m.asScala.keys.map(k => UTF8String.fromString(k.toString)).toArray[Any]
      val values = m.asScala.values.map(toCatalyst(_, nonNullBranch(vs), vdt)).toArray[Any]
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
    case r: GenericRecord =>
      toInternalRow(r, dt.asInstanceOf[StructType])
    case other =>
      throw new IllegalArgumentException(
        s"graft-avro: unsupported runtime value ${other.getClass} for $avro")
  }

  // ---- Spark schema/rows -> Avro (the writer half) -------------------

  /** StructType → Avro record schema (the inverse of [[toSparkType]],
    * over the supported type lattice; every field is written as a
    * 2-branch union with null when nullable). */
  def toAvroSchema(schema: StructType, name: String): ASchema = {
    def field(dt: DataType): ASchema = dt match {
      case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
      case IntegerType => ASchema.create(ASchema.Type.INT)
      case LongType    => ASchema.create(ASchema.Type.LONG)
      case FloatType   => ASchema.create(ASchema.Type.FLOAT)
      case DoubleType  => ASchema.create(ASchema.Type.DOUBLE)
      case StringType  => ASchema.create(ASchema.Type.STRING)
      case BinaryType  => ASchema.create(ASchema.Type.BYTES)
      case DateType =>
        org.apache.avro.LogicalTypes.date()
          .addToSchema(ASchema.create(ASchema.Type.INT))
      case TimestampType =>
        org.apache.avro.LogicalTypes.timestampMicros()
          .addToSchema(ASchema.create(ASchema.Type.LONG))
      case ArrayType(et, containsNull) =>
        ASchema.createArray(branch(et, containsNull))
      case MapType(StringType, vt, valueContainsNull) =>
        ASchema.createMap(branch(vt, valueContainsNull))
      case st: StructType => toAvroSchema(st, name + "_rec")
      case other => throw new IllegalArgumentException(
        s"graft-avro writer: unsupported Spark type $other")
    }
    def branch(dt: DataType, nullable: Boolean): ASchema =
      if (nullable) ASchema.createUnion(
        ASchema.create(ASchema.Type.NULL), field(dt))
      else field(dt)
    ASchema.createRecord(name, null, "graft", false,
      schema.fields.map(f =>
        new ASchema.Field(f.name, branch(f.dataType, f.nullable),
          null, if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
      ).toList.asJava)
  }

  /** Write `df` as Avro container files, one per partition, under
    * `dir` — an executor-side distributed write (no driver collect)
    * with write-to-temp + rename placement per task so readers of the
    * finished directory never see a torn file. This is the fixture /
    * round-trip half; a production sink would ride the graft-filesink
    * commit protocols. */
  def writeAvro(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema, "graft_row").toString
    val d = new File(dir)
    FileSinkFs.deleteRecursively(d.toPath)
    d.mkdirs()
    df.queryExecution.toRdd.foreachPartition { it: Iterator[InternalRow] =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val aSchema = new ASchema.Parser().parse(avroJson)
      val tmp = new File(dir, f".part-$pid%05d.avro.tmp")
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](aSchema))
      w.create(aSchema, tmp)
      val fieldTypes = schema.fields.map(_.dataType)
      it.foreach { row =>
        val rec = new GenericData.Record(aSchema)
        var i = 0
        while (i < fieldTypes.length) {
          rec.put(i, fromCatalyst(row.isNullAt(i), row, i, fieldTypes(i),
            nonNullBranch(aSchema.getFields.get(i).schema())))
          i += 1
        }
        w.append(rec)
      }
      w.close()
      if (!tmp.renameTo(new File(dir, f"part-$pid%05d.avro")))
        throw new java.io.IOException(s"rename failed for $tmp")
    }
  }

  private def fromCatalyst(isNull: Boolean, row: InternalRow, i: Int,
      dt: DataType, avro: ASchema): AnyRef =
    if (isNull) null
    else dt match {
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
      case LongType | TimestampType => java.lang.Long.valueOf(row.getLong(i))
      case FloatType  => java.lang.Float.valueOf(row.getFloat(i))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case StringType => row.getUTF8String(i).toString
      case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
      case ArrayType(et, _) =>
        val arr = row.getArray(i)
        val el = avro.getElementType
        (0 until arr.numElements()).map { j =>
          fromCatalystValue(arr, j, et, nonNullBranch(el))
        }.asJava
      case MapType(StringType, vt, _) =>
        val m = row.getMap(i)
        val out = new java.util.HashMap[String, AnyRef]()
        val ks = m.keyArray(); val vs = m.valueArray()
        val vb = nonNullBranch(avro.getValueType)
        (0 until m.numElements()).foreach { j =>
          out.put(ks.getUTF8String(j).toString, fromCatalystValue(vs, j, vt, vb))
        }
        out
      case st: StructType =>
        val sub = row.getStruct(i, st.length)
        val rec = new GenericData.Record(avro)
        st.fields.zipWithIndex.foreach { case (f, j) =>
          rec.put(j, fromCatalyst(sub.isNullAt(j), sub, j, f.dataType,
            nonNullBranch(avro.getFields.get(j).schema())))
        }
        rec
      case other => throw new IllegalArgumentException(
        s"graft-avro writer: unsupported Spark type $other")
    }

  private def fromCatalystValue(arr: ArrayData, j: Int, dt: DataType,
      avro: ASchema): AnyRef =
    if (arr.isNullAt(j)) null
    else dt match {
      case BooleanType => java.lang.Boolean.valueOf(arr.getBoolean(j))
      case IntegerType | DateType => java.lang.Integer.valueOf(arr.getInt(j))
      case LongType | TimestampType => java.lang.Long.valueOf(arr.getLong(j))
      case FloatType  => java.lang.Float.valueOf(arr.getFloat(j))
      case DoubleType => java.lang.Double.valueOf(arr.getDouble(j))
      case StringType => arr.getUTF8String(j).toString
      case BinaryType => java.nio.ByteBuffer.wrap(arr.getBinary(j))
      case st: StructType =>
        val sub = arr.getStruct(j, st.length)
        val rec = new GenericData.Record(avro)
        st.fields.zipWithIndex.foreach { case (f, k) =>
          rec.put(k, fromCatalyst(sub.isNullAt(k), sub, k, f.dataType,
            nonNullBranch(avro.getFields.get(k).schema())))
        }
        rec
      case other => throw new IllegalArgumentException(
        s"graft-avro writer: unsupported nested Spark type $other")
    }
}
