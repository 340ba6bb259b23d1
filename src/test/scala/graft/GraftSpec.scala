package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites — one JVM-wide SparkSession. */
object TestSession {
  // deployment confs ride in from the same shared builder Bench and
  // Verify use (GraftSession), so the bypass-merge pin + UTC discipline
  // cannot drift apart between the mains and the suites
  lazy val spark: SparkSession = GraftSession.baseBuilder("4")
    .appName("graft-test")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    // small memory pages for the TEST session only: SpillSpec forces
    // per-group sorter spills, and the default 64 MiB page per
    // UnsafeExternalSorter OOMs the suite JVM when thousands of tiny
    // join groups each instantiate one; fixture-scale suites never need
    // big pages (Bench/Verify keep the computed default)
    .config("spark.buffer.pageSize", "4m")
    .getOrCreate()
}

abstract class GraftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  /** Every physical node of an executed plan, descending through the
    * AQE wrappers that `TreeNode.collect` treats as leaves
    * (AdaptiveSparkPlanExec and the QueryStageExec family each hold
    * their subplan in a field, not in `children`). Call only after the
    * DataFrame has been executed so AQE has finalized. */
  def physicalNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    physicalNodes(df.queryExecution.executedPlan)

  /** Same flatten starting from a plan — for audits over QueryExecutions
    * that have NOT run (AdaptiveSparkPlanExec.executedPlan is then the
    * initial plan: scans and join choices are visible, runtime
    * re-optimizations are not). */
  def physicalNodes(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case other                    => other.children
      }
      p +: inner.flatMap(flatten)
    }
    flatten(plan)
  }
}
