package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
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

  /** Counts runtime-filter narrowings (the bandedRowsSwept pattern) so
    * SourcesSpec can assert the DPP hand-off actually fired rather than
    * the test passing on an unpruned scan. */
  val runtimeNarrowed = new java.util.concurrent.atomic.LongAdder

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

  /** One grouped-partial aggregate column: what to fold per generated id
    * within a group. `col` is a generator column name; the fold and the
    * partial's type are fixed per op (count → long, sum over integral
    * columns → long, min/max → the column's type). */
  sealed trait GroupAgg extends Serializable { def col: String }
  case class AggCount(col: String = "") extends GroupAgg
  case class AggSum(col: String) extends GroupAgg
  case class AggMin(col: String) extends GroupAgg
  case class AggMax(col: String) extends GroupAgg
}

private[sources] class SynthTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val rows = options.getLong("rows", 100000L)
  private val partitions = options.getInt("partitions", 8)
  // default to max(1, rows) so the documented rows=0 empty-table case is
  // reachable without the caller also spelling out a vacuous batch size
  private val rowsPerBatch = options.getLong("rowsPerBatch", math.max(1L, rows))
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

  /** GROUPED aggregations push PARTIALLY (supportCompletePushDown stays
    * false): bucket/tag/score are Lehmer scatters of id, so no per-group
    * result is closed-form — but the source CAN fold each generated
    * slice into per-group partials during the one generation pass and
    * emit ≤|groups| rows per partition instead of the slice's rows.
    * Spark then merges partials (COUNT→SUM, SUM→SUM, MIN→MIN, MAX→MAX)
    * — the JDBC-style DSv2 partial-aggregate contract. Translated:
    * COUNT(*)/COUNT(col) (all columns are non-null), SUM over INTEGRAL
    * columns (exact long partials; a float sum would claim an exactness
    * the summation order cannot give), MIN/MAX of any column. Any
    * untranslatable expression — or a DISTINCT — declines the whole
    * push and the plan falls back to generated rows. */
  private def groupedSpec(agg: Aggregation)
      : Option[(Seq[String], Seq[SynthSource.GroupAgg])] = {
    import SynthSource._
    def refName(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 &&
        schema.fieldNames.contains(f.fieldNames()(0)) => Some(f.fieldNames()(0))
      case _ => None
    }
    val integral = Set("id", "bucket", "score")
    val groups = agg.groupByExpressions.toSeq.map(refName)
    if (groups.isEmpty || groups.exists(_.isEmpty)) return None
    val aggs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(AggCount())
      case c: Count if !c.isDistinct => refName(c.column).map(_ => AggCount())
      case s: Sum if !s.isDistinct =>
        refName(s.column).filter(integral).map(AggSum)
      case m: Min => refName(m.column).map(AggMin)
      case m: Max => refName(m.column).map(AggMax)
      case _ => None
    }
    if (aggs.nonEmpty && aggs.forall(_.isDefined))
      Some((groups.flatten, aggs.flatten))
    else None
  }

  private var pushedGrouped: Option[(Seq[String], Seq[SynthSource.GroupAgg])] = None

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    aggTags(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean =
    aggTags(agg) match {
      case Some(tags) => pushedAgg = tags; true
      case None =>
        groupedSpec(agg) match {
          case Some(spec) => pushedGrouped = Some(spec); true
          case None       => false
        }
    }

  override def build(): Scan =
    new SynthScan(rows, partitions, rowsPerBatch, required, pushed, limit,
      pushedAgg, pushedGrouped)
}

private[sources] class SynthScan(rows: Long, partitions: Int, rowsPerBatch: Long,
                                 required: StructType, pushed: Array[Filter],
                                 limit: Long, pushedAgg: Seq[String],
                                 grouped: Option[(Seq[String], Seq[SynthSource.GroupAgg])] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  private val (lo, hi) = {
    val (l, h) = SynthSource.prune(0L, rows, pushed.toSeq)
    (l, math.min(h, if (limit > h - l) h else l + limit))
  }

  /** Runtime filtering (the dynamic-partition-pruning analog for DSv2):
    * when this scan feeds a broadcast join on `id`, Spark executes the
    * dim side first and hands the realized join-key values back through
    * [[filter]] BEFORE input partitions are planned. Narrowing is the
    * [min, max+1] envelope of the delivered In-set intersected with any
    * range conjuncts — a pure optimization: ids inside the envelope but
    * outside the exact key set are still dropped by the join itself, so
    * correctness never depends on the narrowing (the DPP contract).
    * Skipped when an aggregate was completely/partially pushed — those
    * scans answer from the PLAN-time interval and must not move under a
    * runtime narrowing that the precomputed answer didn't see. */
  @volatile private var rlo = lo
  @volatile private var rhi = hi
  override def filterAttributes(): Array[NamedReference] =
    if (pushedAgg.isEmpty && grouped.isEmpty)
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("id")
        .asInstanceOf[NamedReference])
    else Array.empty
  override def filter(filters: Array[Filter]): Unit =
    if (pushedAgg.isEmpty && grouped.isEmpty) filters.foreach {
      case In("id", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Long]) =>
        val ids = vs.map(_.asInstanceOf[Long])
        // saturate the exclusive upper bound: a Long.MaxValue sentinel in
        // the delivered key set must not wrap to Long.MinValue and
        // collapse the scan to empty (narrowing may only ever widen-safe)
        val hiEnv = if (ids.max == Long.MaxValue) rhi else ids.max + 1
        val (l, h) = (math.max(rlo, ids.min), math.min(rhi, hiEnv))
        if (l > rlo || h < rhi) {
          rlo = l; rhi = h
          SynthSource.runtimeNarrowed.increment()
        }
      case f =>
        val (l, h) = SynthSource.prune(rlo, rhi, Seq(f))
        if (l > rlo || h < rhi) {
          rlo = l; rhi = h
          SynthSource.runtimeNarrowed.increment()
        }
    }

  /** With a completely pushed aggregation the scan's schema IS the
    * aggregate output (one LongType per entry — Spark asserts the
    * column count and binds by position; min/max are nullable for the
    * empty-interval case), not the pruned row schema. A grouped partial
    * push emits the group columns (their table types) followed by one
    * partial per aggregate: counts and integral sums as long, min/max
    * as the folded column's type — the positional contract Spark's
    * partial-merge rewrite binds to. */
  override def readSchema(): StructType =
    if (pushedAgg.nonEmpty)
      StructType(pushedAgg.zipWithIndex.map { case (tag, i) =>
        StructField(s"${tag}_$i", LongType, nullable = tag != "count")
      })
    else grouped match {
      case Some((groups, aggs)) =>
        import SynthSource._
        val table = SynthSource.schema
        StructType(
          groups.map(g => table(table.fieldIndex(g)).copy(nullable = false)) ++
            aggs.zipWithIndex.map {
              case (AggCount(_), i) => StructField(s"count_$i", LongType, nullable = false)
              case (AggSum(_), i)   => StructField(s"sum_$i", LongType, nullable = false)
              case (a @ (AggMin(_) | AggMax(_)), i) =>
                StructField(s"mm_$i", table(table.fieldIndex(a.col)).dataType,
                  nullable = false)
            })
      case None => required
    }
  override def toBatch: Batch = this
  override def description(): String = {
    val f = pushed.map(_.toString).mkString(", ")
    val agg = if (pushedAgg.nonEmpty) s" agg=${pushedAgg.mkString(",")}" else ""
    val gagg = grouped.fold("") { case (g, as) =>
      s" groupedAgg=[${g.mkString(",")}][${as.map(_.getClass.getSimpleName).mkString(",")}]"
    }
    s"graft-synth rows=$rows range=[$lo,$hi)$agg$gagg PushedFilters: [$f]"
  }

  /** Slice the PRUNED interval by the configured width (rows/partitions
    * of the unpruned table), so pruning drops whole slices instead of
    * re-spreading a narrow interval across all of them. A completely
    * pushed COUNT(*) needs no generation at all: one partition, one
    * precomputed row. A grouped partial push keeps the slices (the
    * generation pass is still O(interval)) but each slice emits its
    * per-group partials — ≤|groups| rows — instead of its rows. */
  override def planInputPartitions(): Array[InputPartition] =
    if (pushedAgg.nonEmpty) Array(SynthAggPartition(lo, hi, pushedAgg))
    else {
      // rlo/rhi: the plan-time interval, possibly narrowed by a runtime
      // filter delivered before partition planning (see filter() above)
      val width = math.max(1L, (rows + partitions - 1) / partitions)
      val slices = Iterator.range(0, partitions)
        .map(i => (math.max(rlo, i * width), math.min(rhi, (i + 1) * width)))
        .filter { case (l, h) => l < h }
      grouped match {
        case Some((groups, aggs)) =>
          slices.map(s => SynthGroupAggPartition(s._1, s._2, groups, aggs): InputPartition).toArray
        case None =>
          slices.map(s => SynthPartition(s._1, s._2): InputPartition).toArray
      }
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
private[sources] case class SynthGroupAggPartition(lo: Long, hi: Long,
    groups: Seq[String], aggs: Seq[SynthSource.GroupAgg]) extends InputPartition

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
  /** The batch-size option is DECLARED to the engine as a ReadLimit and
    * honored only when the engine passes it back into latestOffset —
    * the real admission-control round trip (Spark composes it with
    * AvailableNow's own limit as a CompositeReadLimit; the min of the
    * components is the contract). Bounded ingest per micro-batch
    * regardless of how far behind the stream is — the property that
    * matters on an unbounded source — pinned by SourcesSpec via
    * per-batch numInputRows. */
  override def getDefaultReadLimit: ReadLimit =
    if (rowsPerBatch >= hi - lo) ReadLimit.allAvailable()
    else ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadMaxRows}
    val pos = start.asInstanceOf[SynthOffset].pos
    def bound(l: ReadLimit): Long = l match {
      case _: ReadAllAvailable  => availableTarget
      case m: ReadMaxRows       => math.min(availableTarget, pos + m.maxRows())
      case c: CompositeReadLimit => c.getReadLimits.map(bound).min
      case _                    => availableTarget // min-rows etc.: no cap
    }
    SynthOffset(bound(limit))
  }
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
      case p: SynthGroupAggPartition => groupAggReader(p)
      case p: SynthPartition => rowReader(p)
    }

  /** Grouped-partial reader: ONE generation pass over the slice folding
    * into a per-group state table (bounded by the group-domain product —
    * ≤ 100 buckets × 7 tags for the widest registered key), then emit
    * one row per observed group: group values first, partials after, in
    * [[SynthScan.readSchema]]'s positional order. Exactness: counts and
    * integral sums are long arithmetic; min/max are order-insensitive —
    * nothing here depends on fold order, so partial-merge on the Spark
    * side reproduces the unpushed plan bit-for-bit. */
  private def groupAggReader(p: SynthGroupAggPartition): PartitionReader[InternalRow] = {
    import SynthSource._
    val gen: String => Long => Any = {
      case "id"     => id => id
      case "bucket" => id => (mix(id) % 100).toInt
      case "score"  => id => (mix(id) % 1000).toInt
      case "value"  => id => mix(id).toDouble / M
      case "tag"    => id => "t" + (mix(id) % 7)
      case other    => throw new IllegalArgumentException(s"unknown column $other")
    }
    val groupGens = p.groups.map(gen).toArray
    val aggCols = p.aggs.map(a => if (a.col.isEmpty) (_: Long) => null else gen(a.col)).toArray
    val aggSpecs = p.aggs.toArray
    new PartitionReader[InternalRow] {
      private var it: Iterator[InternalRow] = _
      private def fold(): Iterator[InternalRow] = {
        val state = new java.util.LinkedHashMap[Seq[Any], Array[Any]]()
        var id = p.lo
        while (id < p.hi) {
          val key: Seq[Any] = groupGens.map(g => g(id)).toSeq
          var st = state.get(key)
          if (st == null) { st = new Array[Any](aggSpecs.length); state.put(key, st) }
          var i = 0
          while (i < aggSpecs.length) {
            val v = aggCols(i)(id)
            st(i) = (aggSpecs(i), st(i)) match {
              case (AggCount(_), null) => 1L
              case (AggCount(_), c)    => c.asInstanceOf[Long] + 1L
              case (AggSum(_), acc) =>
                val x = v match { case n: Int => n.toLong; case n: Long => n }
                (if (acc == null) 0L else acc.asInstanceOf[Long]) + x
              case (AggMin(_), null) => v
              case (AggMin(_), acc)  => minOf(acc, v)
              case (AggMax(_), null) => v
              case (AggMax(_), acc)  => maxOf(acc, v)
            }
            i += 1
          }
          id += 1
        }
        state.entrySet().iterator().asScala.map { e =>
          val vals = (e.getKey ++ e.getValue.toSeq).map {
            case s: String => UTF8String.fromString(s)
            case other     => other
          }
          new GenericInternalRow(vals.toArray): InternalRow
        }
      }
      private def minOf(a: Any, b: Any): Any = (a, b) match {
        case (x: Int, y: Int)       => math.min(x, y)
        case (x: Long, y: Long)     => math.min(x, y)
        case (x: Double, y: Double) => math.min(x, y)
        case (x: String, y: String) => if (x <= y) x else y
        case _ => throw new IllegalStateException(s"min over ${a.getClass}")
      }
      private def maxOf(a: Any, b: Any): Any = (a, b) match {
        case (x: Int, y: Int)       => math.max(x, y)
        case (x: Long, y: Long)     => math.max(x, y)
        case (x: Double, y: Double) => math.max(x, y)
        case (x: String, y: String) => if (x >= y) x else y
        case _ => throw new IllegalStateException(s"max over ${a.getClass}")
      }
      override def next(): Boolean = {
        if (it == null) it = fold()
        it.hasNext
      }
      override def get(): InternalRow = it.next()
      override def close(): Unit = ()
    }
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
