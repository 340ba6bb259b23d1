package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of every registered query.
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  * The audit checklist per plan: filters reach the scan (PushedFilters),
  * projections prune (ReadSchema), dimension joins broadcast, aggregates
  * are partial+final, pipelines sit inside WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B a rewrite: SPARK_GRAFT_EXCLUDE_RULES=graft.plans.TopKRewrite
    // shows the stock plan next to the extension plan
    sys.env.get("SPARK_GRAFT_EXCLUDE_RULES")
      .foreach(spark.conf.set("spark.sql.optimizer.excludedRules", _))
    names.foreach { name =>
      println(s"\n===== $name =====")
      try println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
