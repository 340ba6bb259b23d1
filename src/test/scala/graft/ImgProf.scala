package graft

// scratch: time image_features before/after the id repartition
object ImgProf extends App {
  val dir = args.headOption.getOrElse("/tmp/graftscale/sf1")
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  (1 to 3).foreach { _ =>
    val t0 = System.nanoTime()
    graft.operators.Multimodal.imageFeatures(spark, dir).collect()
    println(f"image_features ${(System.nanoTime() - t0) / 1e9}%.2fs")
  }
  spark.stop()
}
