package graft

import org.apache.spark.sql.functions._

object SpamLegProf extends App {
  val dir = args.headOption.getOrElse("/tmp/graftscale/sf1")
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  import graft.operators.SpamClassifier
  def t(label: String)(body: => Unit): Unit = {
    val w = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
    println(f"$label%-22s best=${w.min}%.2fs all=${w.map(x=>f"$x%.2f").mkString(",")}")
  }
  t("featurize_only")(SpamClassifier.instances(spark, dir)
    .agg(sum(size(col("features")))).collect())
  t("train_fold")(SpamClassifier.train(spark,
    SpamClassifier.instances(spark, dir)).collect())
  t("apply_full")(SpamClassifier.spamApply(spark, dir).collect())
  spark.stop()
}
