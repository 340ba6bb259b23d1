package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, ReadLimit, SupportsTriggerAvailableNow, Offset => StreamOffset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A deterministic synthetic-data generator as a full DataSourceV2
  * `TableProvider` — the custom-source extension surface a 100 TB
  * library needs for formats Spark does not ship (the reference's
  * analog is its bespoke InputFormat/RecordReader pair for
  * non-standard inputs; here the same contract is expressed through
  * Spark's connector API so Catalyst plans the scan like any built-in
  * source).
  *
  * Rows are derived purely from the row id by a Lehmer LCG
  * (`x = id * 48271 mod (2^31-1)`, Park–Miller 1988) — every column is
  * a closed-form function of `id`, so the SAME table is computable in
  * ANSI SQL over `range(0, rows)` and the source is oracle-checkable
  * like every other registered query (no other generator source has
  * that property; `spark.range` gives only the id column).
  *
  * Scale design — the three things a custom source must get right to
  * survive a 1000-executor cluster, each demonstrated here and pinned
  * by SourcesSpec:
  *   - '''partition planning''': the id range splits into `partitions`
  *     contiguous slices, each generated independently in its executor
  *     (no driver materialization, no skew — slices are equal width);
  *   - '''filter pushdown → partition pruning''': range predicates on
  *     `id` narrow the planned id interval BEFORE slicing, so
  *     `WHERE id < k` plans ceil(k/width) partitions instead of all of
  *     them — the parquet row-group-pruning analog. id-range conjuncts
  *     are consumed exactly (the interval intersection IS the
  *     predicate); predicates on derived columns stay residual and
  *     Spark evaluates them post-scan;
  *   - '''column pruning''': the reader computes exactly the pruned
  *     schema (`SELECT bucket` never materializes `text`-like wide
  *     fields), the `ReadSchema` analog the audits require of the
  *     parquet scans;
  *   - '''limit + complete aggregate pushdown''': a bare-scan LIMIT
  *     truncates the planned interval, and ungrouped COUNT(*) /
  *     MIN(id) / MAX(id) are answered at planning time from the
  *     pruned interval alone (one partition, one precomputed row —
  *     the row-group-statistics analog), composing with consumed
  *     id-range filters;
  *   - '''vectorized reads''': generation partitions emit
  *     OnHeapColumnVector batches (4,096 rows) that reach whole-stage
  *     codegen through ColumnarToRow — the same columnar hand-off the
  *     vectorized parquet reader uses, with no per-row InternalRow
  *     allocation on the scan side.
  *
  * Registered under the `graft-synth` short name via
  * META-INF/services (standard DataSourceRegister plumbing), so
  * `spark.read.format("graft-synth")` resolves without class names.
  */
class SynthTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new SynthTable(new CaseInsensitiveStringMap(properties))
}

object SynthSource {
  /** Full table schema; every field non-null (the generator never
    * produces nulls, and declaring it lets Catalyst drop IsNotNull). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("score", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Park–Miller modulus (2^31 − 1). id*48271 stays well inside Long
    * for any realistic row count, so JVM and SQL BIGINT arithmetic
    * agree bit-for-bit. */
  val M = 2147483647L
  val A = 48271L

  def mix(id: Long): Long = id * A % M

  /** Fold pushed range predicates on `id` into a [lo, hi) interval.
    * Unknown filters (and filters on derived columns) leave the
    * interval unchanged — they stay residual and Spark evaluates them
    * post-scan. */
  def prune(lo: Long, hi: Long, filters: Seq[Filter]): (Long, Long) =
    filters.foldLeft((lo, hi)) {
      case ((l, h), GreaterThan("id", v: Long))        => (math.max(l, v + 1), h)
      case ((l, h), GreaterThanOrEqual("id", v: Long)) => (math.max(l, v), h)
      case ((l, h), LessThan("id", v: Long))           => (l, math.min(h, v))
      case ((l, h), LessThanOrEqual("id", v: Long))    => (l, math.min(h, v + 1))
      case ((l, h), EqualTo("id", v: Long))            => (math.max(l, v), math.min(h, v + 1))
      case (acc, _)                                    => acc
    }
}

private[sources] class SynthTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val rows = options.getLong("rows", 100000L)
  private val partitions = options.getInt("partitions", 8)
  private val rowsPerBatch = options.getLong("rowsPerBatch", rows)
  require(rows >= 0 && partitions > 0 && rowsPerBatch > 0,
    s"graft-synth needs rows >= 0, partitions > 0, rowsPerBatch > 0, " +
      s"got $rows/$partitions/$rowsPerBatch")

  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, rowsPerBatch)
}

private[sources] class SynthScanBuilder(rows: Long, partitions: Int,
                                        rowsPerBatch: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  private var required: StructType = SynthSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Long = Long.MaxValue
  private var pushedAgg: Seq[String] = Nil

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // id-range conjuncts are CONSUMED (not residual): each one is
    // exactly an interval constraint and SynthSource.prune intersects
    // them all, so the generated id set equals the predicate's id set —
    // consuming them is provably exact, drops the post-scan FilterExec,
    // and (because postScanFilters is then empty) lets a downstream
    // limit or COUNT(*) push compose with the filter. IsNotNull is
    // consumable because every field is declared non-null. Anything
    // else (notably predicates on DERIVED columns) stays residual and
    // Spark evaluates it post-scan.
    val (consumed, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) | IsNotNull(_) => true
      case _ => false
    }
    pushed = consumed
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Truncating the pruned interval at `limit` rows is exact exactly
    * when no post-scan filter can drop generated rows — and that is
    * the only shape Spark pushes a limit to (a residual derived-column
    * predicate keeps its FilterExec, which blocks the push); consumed
    * id-range filters have already narrowed the interval, so the first
    * `limit` ids of it ARE a correct LIMIT result. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  /** Complete pushdown of the aggregates the generator can answer at
    * PLANNING time from the pruned interval alone: COUNT(*) = interval
    * width, MIN(id) = interval start, MAX(id) = interval end − 1 (id is
    * the one monotone column; min/max of DERIVED columns are not
    * closed-form and are declined). The scan then emits one precomputed
    * row and Spark skips both the generation loop and its own
    * aggregation — the row-group-statistics analog of parquet's
    * count/min/max shortcuts. Grouping or any other aggregate declines
    * the whole push and Spark aggregates generated rows as usual. */
  private def aggTags(agg: Aggregation): Option[Seq[String]] = {
    def idRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case f: NamedReference => f.fieldNames.sameElements(Array("id"))
        case _                 => false
      }
    val tags = agg.aggregateExpressions.toSeq.map {
      case _: CountStar          => Some("count")
      case m: Min if idRef(m.column) => Some("min_id")
      case m: Max if idRef(m.column) => Some("max_id")
      case _                     => None
    }
    if (agg.groupByExpressions.isEmpty && tags.nonEmpty && tags.forall(_.isDefined))
      Some(tags.flatten)
    else None
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    aggTags(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean =
    aggTags(agg) match {
      case Some(tags) => pushedAgg = tags; true
      case None       => false
    }

  override def build(): Scan =
    new SynthScan(rows, partitions, rowsPerBatch, required, pushed, limit, pushedAgg)
}

private[sources] class SynthScan(rows: Long, partitions: Int, rowsPerBatch: Long,
                                 required: StructType, pushed: Array[Filter],
                                 limit: Long, pushedAgg: Seq[String])
    extends Scan with Batch with SupportsReportStatistics {
  private val (lo, hi) = {
    val (l, h) = SynthSource.prune(0L, rows, pushed.toSeq)
    (l, math.min(h, if (limit > h - l) h else l + limit))
  }

  /** With a completely pushed aggregation the scan's schema IS the
    * aggregate output (one LongType per entry — Spark asserts the
    * column count and binds by position; min/max are nullable for the
    * empty-interval case), not the pruned row schema. */
  override def readSchema(): StructType =
    if (pushedAgg.nonEmpty)
      StructType(pushedAgg.zipWithIndex.map { case (tag, i) =>
        StructField(s"${tag}_$i", LongType, nullable = tag != "count")
      })
    else required
  override def toBatch: Batch = this
  override def description(): String = {
    val f = pushed.map(_.toString).mkString(", ")
    val agg = if (pushedAgg.nonEmpty) s" agg=${pushedAgg.mkString(",")}" else ""
    s"graft-synth rows=$rows range=[$lo,$hi)$agg PushedFilters: [$f]"
  }

  /** Slice the PRUNED interval by the configured width (rows/partitions
    * of the unpruned table), so pruning drops whole slices instead of
    * re-spreading a narrow interval across all of them. A completely
    * pushed COUNT(*) needs no generation at all: one partition, one
    * precomputed row. */
  override def planInputPartitions(): Array[InputPartition] =
    if (pushedAgg.nonEmpty) Array(SynthAggPartition(lo, hi, pushedAgg))
    else {
      val width = math.max(1L, (rows + partitions - 1) / partitions)
      Iterator.range(0, partitions)
        .map(i => (math.max(lo, i * width), math.min(hi, (i + 1) * width)))
        .collect { case (l, h) if l < h => SynthPartition(l, h): InputPartition }
        .toArray
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)

  /** Micro-batch streaming over the same interval — the custom
    * streaming-source surface (the reference's queueStream analog,
    * S9/R6 in SURVEY §2, here as a library-grade connector). Offsets
    * are id positions; each trigger admits `rowsPerBatch` ids
    * (admission control), and Trigger.AvailableNow drains to the
    * interval end in those same paced batches
    * (SupportsTriggerAvailableNow), exactly like the file source's
    * maxFilesPerTrigger semantics. Batches reuse the batch path's
    * partition slicing and (columnar) reader factory. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, partitions, rowsPerBatch, required)

  override def estimateStatistics(): Statistics = new Statistics {
    // 29 bytes/row: 8 (id) + 4 + 4 + 8 + ~5 (tag) — lets Catalyst make
    // an informed broadcast decision when the generator is a join side
    override def sizeInBytes(): OptionalLong = OptionalLong.of((hi - lo) * 29)
    override def numRows(): OptionalLong = OptionalLong.of(hi - lo)
  }
}

private[sources] case class SynthPartition(lo: Long, hi: Long) extends InputPartition
private[sources] case class SynthAggPartition(lo: Long, hi: Long,
                                              tags: Seq[String]) extends InputPartition

private[sources] case class SynthOffset(pos: Long) extends StreamOffset {
  override def json(): String = pos.toString
}

private[sources] class SynthMicroBatchStream(lo: Long, hi: Long, partitions: Int,
                                             rowsPerBatch: Long, required: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // under ProcessingTime triggers everything up to `hi` is available;
  // prepareForTriggerAvailableNow re-pins the same bound (the generator
  // has no late arrivals), so AvailableNow drains [lo, hi) and stops
  @volatile private var availableTarget: Long = hi
  override def prepareForTriggerAvailableNow(): Unit = availableTarget = hi

  override def initialOffset(): StreamOffset = SynthOffset(lo)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  /** Admission control: each trigger advances by at most rowsPerBatch —
    * bounded state per micro-batch regardless of how far behind the
    * stream is, the property that matters on an unbounded source. */
  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset =
    SynthOffset(math.min(availableTarget,
      start.asInstanceOf[SynthOffset].pos + rowsPerBatch))
  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")
  override def reportLatestOffset(): StreamOffset = SynthOffset(availableTarget)

  override def planInputPartitions(start: StreamOffset,
                                   end: StreamOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[SynthOffset].pos
    val e = end.asInstanceOf[SynthOffset].pos
    val width = math.max(1L, (e - s + partitions - 1) / partitions)
    Iterator.range(0, partitions)
      .map(i => (s + i * width, math.min(e, s + (i + 1) * width)))
      .collect { case (l, h) if l < h => SynthPartition(l, h): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
  override def deserializeOffset(json: String): StreamOffset =
    SynthOffset(json.toLong)
  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {

  /** Generation partitions read COLUMNAR (the vectorized path parquet
    * scans use): values land directly in OnHeapColumnVectors and reach
    * whole-stage codegen through ColumnarToRow, skipping per-row
    * InternalRow allocation. The pushed-aggregate partition stays
    * row-based — one precomputed row gains nothing from batching. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    partition.isInstanceOf[SynthPartition]

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case SynthAggPartition(lo, hi, tags) => new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val go = !emitted; emitted = true; go }
        override def get(): InternalRow = {
          val values: Array[Any] = tags.map {
            case "count"  => (hi - lo): Any
            case "min_id" => if (hi > lo) lo: Any else null
            case "max_id" => if (hi > lo) (hi - 1): Any else null
            case other    => throw new IllegalStateException(s"unknown agg tag $other")
          }.toArray
          new GenericInternalRow(values)
        }
        override def close(): Unit = ()
      }
      case p: SynthPartition => rowReader(p)
    }

  private val batchSize = 4096

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val SynthPartition(lo, hi) = partition
    // per-field vector writers bound by NAME once, outside the fill loop
    val writers: Array[(OnHeapColumnVector, Int, Long) => Unit] =
      required.fields.map(_.name).map {
        case "id"     => (v: OnHeapColumnVector, i: Int, id: Long) => v.putLong(i, id)
        case "bucket" => (v: OnHeapColumnVector, i: Int, id: Long) =>
          v.putInt(i, (SynthSource.mix(id) % 100).toInt)
        case "score"  => (v: OnHeapColumnVector, i: Int, id: Long) =>
          v.putInt(i, (SynthSource.mix(id) % 1000).toInt)
        case "value"  => (v: OnHeapColumnVector, i: Int, id: Long) =>
          v.putDouble(i, SynthSource.mix(id).toDouble / SynthSource.M)
        case "tag"    => (v: OnHeapColumnVector, i: Int, id: Long) => {
          val b = ("t" + (SynthSource.mix(id) % 7)).getBytes("UTF-8")
          v.putByteArray(i, b, 0, b.length); ()
        }
        case other    => throw new IllegalArgumentException(s"unknown column $other")
      }
    new PartitionReader[ColumnarBatch] {
      private val vectors = OnHeapColumnVector.allocateColumns(batchSize, required)
      private val batch =
        new ColumnarBatch(vectors.map(v => v: ColumnVector).toArray)
      private var cur = lo
      override def next(): Boolean =
        cur < hi && {
          var i = 0
          val n = math.min(batchSize.toLong, hi - cur).toInt
          while (i < vectors.length) { vectors(i).reset(); i += 1 }
          i = 0
          while (i < n) {
            var c = 0
            while (c < writers.length) { writers(c)(vectors(c), i, cur + i); c += 1 }
            i += 1
          }
          batch.setNumRows(n)
          cur += n
          true
        }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }

  private def rowReader(partition: SynthPartition): PartitionReader[InternalRow] = {
    val SynthPartition(lo, hi) = partition
    // one writer per required field, bound by NAME at planning time —
    // the reader computes exactly the pruned schema, nothing else
    val fields: Array[Long => Any] = required.fields.map(_.name).map {
      case "id"     => (id: Long) => id
      case "bucket" => (id: Long) => (SynthSource.mix(id) % 100).toInt
      case "score"  => (id: Long) => (SynthSource.mix(id) % 1000).toInt
      case "value"  => (id: Long) => SynthSource.mix(id).toDouble / SynthSource.M
      case "tag"    => (id: Long) => UTF8String.fromString("t" + (SynthSource.mix(id) % 7))
      case other    => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var id = lo - 1
      override def next(): Boolean = { id += 1; id < hi }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map(f => f(id)))
      override def close(): Unit = ()
    }
  }
}
