package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** SURVEY O5 / mandate rung (c): the reference's bounded-priority-queue
  * top-k (`ExtractTopPersonalizedPageRankNodes.java:102-135`, a mapper
  * holding a fixed-size PQ so only k candidates per group ever reach the
  * reducer) as a REAL Catalyst extension — logical node + optimizer rule
  * + planner strategy + two-phase physical operator, registered through
  * `SparkSessionExtensions`.
  *
  * The rule recognizes the canonical Spark top-k idiom
  *
  *   df.withColumn("rnk", row_number().over(Window.partitionBy(K).orderBy(S)))
  *     .filter(col("rnk") <= k)
  *
  * and plants [[TopKPerKey]] under the Window. The planner lowers it to
  * PARTIAL → shuffle → FINAL bounded-PQ passes, so each upstream task
  * forwards at most k rows per key (in-mapper combining for top-k), the
  * shuffle moves O(keys·k) rows instead of the full input, and the
  * window's sort runs on ≤ k rows per key. At 100 TB this turns the
  * worst operator in the naive plan (a full per-key sort of everything)
  * into a scan-bound pass with a tiny shuffle.
  *
  * Semantics: the kept row SET equals what the row_number filter keeps
  * whenever the window order is total (every registered query tiebreaks
  * to totality); under ties both plans keep some valid k-subset, which
  * is row_number's contract anyway. The Window node itself is left in
  * place to assign the final ranks — on the pruned input its cost is
  * negligible, and dropping it would change the query's schema.
  *
  * State: one k-bounded heap per key per task — the same memory contract
  * as the reference's mapper PQ; keys per task are bounded by the
  * upstream partitioning at worst, and the heaps never exceed k rows.
  */
case class TopKPerKey(k: Int, partExprs: Seq[Expression],
    orderSpec: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Optimizer rule: Filter(rank ≤ k, Window(row_number, …)) ⇒ plant
  * TopKPerKey below the Window. Conservative on purpose: exactly one
  * window expression, a plain `<=`/`<` integer bound on its attribute,
  * a non-empty order, and no prior rewrite. */
object TopKRewrite extends Rule[LogicalPlan] {

  /** PQ-per-key memory guard: beyond this, the plain sort is fine. */
  val maxK = 10000

  private def boundOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rank) =>
      Some(v)
    case LessThan(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rank) =>
      Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, _), a: Attribute) if a.semanticEquals(rank) =>
      Some(v)
    // rank = k (k=1 is the argmax-per-group idiom): the rank-k row is
    // inside the per-key top-k set, and on a total order the window
    // assigns the pruned set the same ranks, so the equality filter
    // still selects exactly that row
    case EqualTo(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rank) =>
      Some(v)
    case EqualTo(Literal(v: Int, _), a: Attribute) if a.semanticEquals(rank) =>
      Some(v)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window)
        if w.windowExpressions.size == 1 && !w.child.isInstanceOf[TopKPerKey] &&
          // empty partitionSpec = GLOBAL top-k: ClusteredDistribution
          // rejects empty clustering, and a global k-limit is the sort
          // engine's job (TakeOrdered / WindowGroupLimit) — skip it.
          // Non-deterministic keys/orders must not be re-evaluated in an
          // extra operator.
          w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.deterministic) =>
      w.windowExpressions.head match {
        case a @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(_, order, _)), _)
            if order.nonEmpty && order.forall(_.deterministic) =>
          boundOf(cond, a.toAttribute) match {
            case Some(k) if k > 0 && k <= maxK =>
              f.copy(child = w.copy(child =
                TopKPerKey(k, w.partitionSpec, order, w.child)))
            case _ => f
          }
        case _ => f
      }
  }
}

/** Planner strategy: lower the logical node to partial→final execs; the
  * final's required distribution makes EnsureRequirements insert the
  * (now tiny) shuffle between them. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, part, order, child) =>
      GraftTopKExec(k, part, order, partial = false,
        GraftTopKExec(k, part, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object GraftTopKExec {
  /** Partial-pass state bound in RETAINED ROWS, not keys: the map holds
    * up to k rows per key, so the key cap is derived as
    * `maxPartialRows / k` — a k=10 query may track ~400k keys while a
    * k=10000 query tracks ~400. Above the cap, NEW keys stop being
    * tracked and their rows pass through unpruned — graceful degradation
    * to stock shuffle volume for the heavy-cardinality tail instead of
    * an unbounded map (the sort-based built-in spills; a hash-based
    * partial must cap). Correctness is unaffected: the final pass
    * computes the exact top-k regardless of how much the partial pruned.
    * Test hook: var, not a conf knob; volatile because doExecute reads
    * it from AQE's stage-materialization threads, not the thread that
    * set it. */
  @volatile private[graft] var maxPartialRows: Long = 1L << 22
}

/** Bounded-PQ pass: keeps the k first rows per key under `orderSpec`.
  *
  * `partial = true` runs before the shuffle on whatever partitioning the
  * child has — per-task pruning with a hash map of k-bounded heaps whose
  * TOTAL retained rows are capped by [[GraftTopKExec.maxPartialRows]]
  * (overflow keys pass through unpruned, exactness unaffected).
  *
  * `partial = false` requires clustering by key AND a per-partition sort
  * on the key: EnsureRequirements plants the (tiny, post-prune) shuffle
  * and a SortExec — which SPILLS through UnsafeExternalSorter like any
  * Spark sort — so the final pass streams key-contiguous rows through
  * ONE k-bounded heap at a time. Final-pass state is O(k), not
  * O(keys × k): a high-cardinality partition spills in the sort instead
  * of OOMing the heap map (the round-3 review's memory-envelope
  * finding). The Window above re-ranks the pruned rows, so heap drain
  * order is irrelevant. */
case class GraftTopKExec(k: Int, partExprs: Seq[Expression],
    orderSpec: Seq[SortOrder], partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(partExprs) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(partExprs.map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val part = partExprs
    val order = orderSpec
    val childOutput = child.output
    if (partial) {
      val rowCap = GraftTopKExec.maxPartialRows
      child.execute().mapPartitions { iter =>
        // executor-side construction: projections/orderings are codegen'd
        // per task, never serialized from the driver
        val keyProj = UnsafeProjection.create(part, childOutput)
        val ord = RowOrdering.create(order, childOutput)
        val rowOrd: Ordering[InternalRow] = (x: InternalRow, y: InternalRow) =>
          ord.compare(x, y)
        // retained memory is keys × k rows, so the KEY budget scales
        // inversely with k (bound total rows, not key count)
        val keyCap = math.max(1L, rowCap / kk)
        // heap head = the WORST retained row (max under the sort order):
        // a new row enters iff it sorts strictly before the head
        val heaps = scala.collection.mutable.LinkedHashMap
          .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
        // overflow rows STREAM out as they arrive (no buffering — the cap
        // exists precisely to bound this task's memory); retained heap
        // contents flush after the input is exhausted (the right side of
        // ++ is by-name, so heaps are complete when it is evaluated)
        iter.flatMap { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case Some(h) =>
              if (h.size < kk) { h += row.copy() }
              else if (ord.compare(row, h.head) < 0) { h.dequeue(); h += row.copy() }
              Iterator.empty
            case None =>
              if (heaps.size >= keyCap) {
                // key-cardinality overflow: stop tracking new keys; their
                // rows flow through unpruned and the final pass stays exact
                Iterator.single(row)
              } else {
                val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
                h += row.copy()
                heaps.put(key.copy(), h)
                Iterator.empty
              }
          }
        } ++ heaps.valuesIterator.flatMap(_.iterator)
      }
    } else {
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(part, childOutput)
        val ord = RowOrdering.create(order, childOutput)
        val rowOrd: Ordering[InternalRow] = (x: InternalRow, y: InternalRow) =>
          ord.compare(x, y)
        // input is key-sorted: one live heap, flushed at key boundaries
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
          private var pending: Iterator[InternalRow] = Iterator.empty
          private def add(row: InternalRow): Unit =
            if (heap.size < kk) heap += row.copy()
            else if (ord.compare(row, heap.head) < 0) { heap.dequeue(); heap += row.copy() }
          private def drain(): Iterator[InternalRow] = {
            val out = heap.iterator.toArray.iterator
            heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
            out
          }
          @annotation.tailrec
          private def advance(): Unit =
            if (!pending.hasNext) {
              if (iter.hasNext) {
                val row = iter.next()
                val key = keyProj(row)
                if (curKey == null) { curKey = key.copy(); add(row); advance() }
                else if (key == curKey) { add(row); advance() }
                else { pending = drain(); curKey = key.copy(); add(row) }
              } else if (curKey != null) { pending = drain(); curKey = null }
            }
          override def hasNext: Boolean = { advance(); pending.hasNext }
          override def next(): InternalRow = { advance(); pending.next() }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GraftTopKExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "GraftTopKPartial" else "GraftTopKFinal"
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` installs the rule
  * and strategy; without it every query still runs identically on the
  * stock window plan (the rewrite is a pure optimization). It also
  * registers the library's custom expressions with the SQL function
  * registry, so `spark.sql` users get the same surface the Column API
  * exposes: `cosine_similarity(a, b)` (codegen'd scalar) and
  * `log_sum_exp(x)` (the native DeclarativeAggregate — the analyzer
  * wraps a returned AggregateFunction in an AggregateExpression). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def fn(name: String, clazz: Class[_], arity: Int,
      build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity,
          s"$name expects $arity argument(s), got ${exprs.length}")
        build(exprs)
      })

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => TopKRewrite)
    e.injectOptimizerRule(session => new MVRewrite(session))
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectFunction(fn("cosine_similarity",
      classOf[graft.functions.CosineSimilarity], 2,
      exprs => graft.functions.CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction(fn("dot_product",
      classOf[graft.functions.DotProduct], 2,
      exprs => graft.functions.DotProduct(exprs(0), exprs(1))))
    e.injectFunction(fn("log_sum_exp",
      classOf[graft.functions.LogSumExpAgg], 1,
      exprs => graft.functions.LogSumExpAgg(exprs.head)))
  }
}
