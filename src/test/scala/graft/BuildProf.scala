package graft
import org.apache.spark.sql.SparkSession
object BuildProf extends App {
  val spark = SparkSession.builder()
    .master("local[32]")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.shuffle.partitions", 32)
    .config("spark.shuffle.sort.bypassMergeThreshold", 32)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", false)
    .config("spark.driver.memory", "8g")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  // warm: one full build absorbs JIT/codegen
  graft.operators.Dedup.buildFamilyArtifacts(spark, dir)
  (1 to 4).foreach { i =>
    val stages = graft.operators.Dedup.profileBuildStages(spark, dir)
    println(f"PROF run$i total=${stages.map(_._2).sum}%.2f " +
      stages.map { case (n, s) => f"$n=$s%.2f" }.mkString(" "))
  }
  spark.stop()
}
