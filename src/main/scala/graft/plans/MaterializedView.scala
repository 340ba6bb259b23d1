package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Subquery}
import org.apache.spark.sql.catalyst.rules.Rule

/** Transparent materialized-view rewrite — the warehouse feature where a
  * query that RE-STATES a precomputed aggregate is answered from the
  * materialization instead of the base tables, without the query
  * changing at all. Registered through `SparkSessionExtensions`
  * ([[GraftExtensions]]), the same surface as [[TopKRewrite]].
  *
  * Contract (kept deliberately narrow and honest):
  *   - a view is registered with [[MaterializedViews.register]], which
  *     MATERIALIZES the definition to parquet first and only then
  *     publishes the entry — there is no window where a query can match
  *     an unwritten view, and re-registering is the refresh operation
  *     (this is an explicit-refresh MV, not an incrementally maintained
  *     one; the incremental discipline lives in
  *     `event_count_hourly_incremental`);
  *   - matching is EXACT-SUBTREE on canonicalized optimized plans: a
  *     query subtree whose canonical form equals the registered
  *     definition's is substituted. Operators above it that the
  *     optimizer does NOT rewrite into the subtree — sort, limit —
  *     compose over the substitution soundly (the subtree's rows are
  *     identical by construction). A consuming filter or projection,
  *     by contrast, is PUSHED INTO the subtree by the main optimizer
  *     before this rule sees it, which changes the canonical form and
  *     stops the match — the deliberate cost of exactness: no
  *     containment reasoning, therefore no wrong-rewrite risk.
  *   - definitions are UNORDERED (a table, not a result list): an outer
  *     ORDER BY in the consuming query sits ABOVE the matched subtree
  *     and keeps ordering semantics over the substituted scan.
  *
  * Scale story: the rewrite turns a full fact-table scan + aggregation
  * into a scan of the ≤|groups| materialization — at 100 TB this is the
  * difference between touching the feed and touching a few thousand
  * rows, which is why every warehouse ships some form of it.
  *
  * Output-attribute fidelity: the substituted scan's attributes are
  * re-aliased to the replaced subtree's exprIds (positionally — equal
  * canonical forms have positionally equal outputs), so parent
  * operators' references stay bound.
  */
object MaterializedViews {
  final case class Entry(name: String, canonical: LogicalPlan, path: String,
                         output: Seq[Attribute]) {
    /** Cheap structural pre-filter for the rule's walk: canonicalization
      * preserves the root node class and output arity, so a node that
      * fails either check cannot equal `canonical` — no canonicalization
      * needed to reject it.
      *
      * Assumption, stated rather than hidden: the filter compares the
      * QUERY node's own class against the ENTRY's canonical class, so a
      * node type whose `doCanonicalize` changed its root class could be
      * wrongly rejected (a missed rewrite, never a wrong one). No node
      * the optimizer emits does this — `doCanonicalize` rewrites
      * children/expressions in place for every plan operator Spark's
      * optimizer can leave in its output — and MaterializedViewSpec
      * pins that empirically: it canonicalizes every node of a
      * representative optimized-plan corpus (agg/join/window/sort
      * shapes) and asserts the class is preserved. */
    val rootClass: Class[_] = canonical.getClass
    val rootArity: Int = canonical.output.size
  }

  private val entries =
    new scala.collection.concurrent.TrieMap[String, Entry]()

  /** While positive, [[MVRewrite]] is a no-op. Held during [[register]]
    * so (a) the refresh write can never be rewritten to scan the very
    * materialization it is overwriting — even via a same-canonical entry
    * under a DIFFERENT name — and (b) the canonical is captured from a
    * plan optimized WITHOUT the rewrite, so it states the definition in
    * base-table form (a canonical captured from a rewritten plan would
    * never match user queries again). A COUNTER, not a boolean: the
    * registry is JVM-global across sessions/threads, and a boolean would
    * let one register()'s finally re-arm the rule while another's write
    * is still in flight — the exact self-scan hazard suspension exists
    * to prevent. */
  private val suspensions = new java.util.concurrent.atomic.AtomicInteger(0)
  private[plans] def suspended: Boolean = suspensions.get() > 0
  private[plans] def suspend(): Unit = suspensions.incrementAndGet()
  private[plans] def resume(): Unit = suspensions.decrementAndGet()

  /** Counts the rule's canonicalization attempts (the expensive half of
    * matching) — asserted by MaterializedViewSpec the way
    * `bandedRowsSwept` pins the one-pass banding. */
  val canonicalizeAttempts = new java.util.concurrent.atomic.LongAdder

  /** Materialize `definition` to `path` (overwrite = refresh), then
    * publish. The definition must be an unordered plan — registering a
    * sorted one would never match under an outer operator anyway (the
    * optimizer strips non-top-level sorts), it would only waste the
    * write.
    *
    * Refresh safety: the name is unpublished FIRST and the rewrite rule
    * suspended for the duration, so re-registering — the refresh
    * operation — cannot rewrite its own overwrite into a scan of the
    * files being deleted. The canonical is recaptured from a fresh
    * optimization (the passed frame's QueryExecution may be memoized
    * from a run under different registry state). */
  def register(name: String, definition: DataFrame, path: String): Unit = {
    entries.remove(name)
    suspend()
    try {
      definition.write.mode("overwrite").parquet(path)
      // where(lit(true)) forces a NEW QueryExecution over the same
      // logical definition; PruneFilters drops the vacuous predicate, so
      // the optimized form is the definition's own — now captured with
      // the rule suspended, i.e. in base-table terms.
      val fresh = definition.where(org.apache.spark.sql.functions.lit(true))
      val opt = fresh.queryExecution.optimizedPlan
      entries.put(name, Entry(name, opt.canonicalized, path, opt.output))
    } finally resume()
  }

  def deregister(name: String): Unit = entries.remove(name)
  def clear(): Unit = entries.clear()
  def isEmpty: Boolean = entries.isEmpty
  def all: Seq[Entry] = entries.values.toSeq
}

/** The optimizer rule: replace any subtree whose canonical form equals a
  * registered definition with a parquet scan of its materialization.
  * Runs in the user-rule batch (after the main optimizer), so the
  * subtrees it sees are in the same optimized form `register` captured.
  * A no-op (cheap reference check) while no view is registered. */
class MVRewrite(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MaterializedViews.isEmpty || MaterializedViews.suspended) plan
    else {
      val entries = MaterializedViews.all
      plan.transformUp {
        // The guard is the cost bound: canonicalization (which walks the
        // whole subtree) only happens on nodes that pass the O(1)
        // class+arity pre-filter against some entry. A plan with no
        // shape-compatible node pays |plan| class compares, zero
        // canonicalizations — pinned by MaterializedViewSpec via
        // `canonicalizeAttempts`.
        case p if !p.isInstanceOf[Subquery] && entries.exists(e =>
            (e.rootClass eq p.getClass) && e.rootArity == p.output.size) =>
          MaterializedViews.canonicalizeAttempts.increment()
          val canon = p.canonicalized
          entries.find(_.canonical == canon) match {
            case Some(entry) =>
              val scan = session.read.parquet(entry.path).queryExecution.analyzed
              val byName = scan.output.map(a => a.name -> a).toMap
              val fields: Seq[NamedExpression] =
                p.output.zip(entry.output).map { case (orig, defOut) =>
                  Alias(byName(defOut.name), orig.name)(exprId = orig.exprId)
                }
              Project(fields, scan)
            case None => p
          }
      }
    }
}
