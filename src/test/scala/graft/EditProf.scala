package graft

import org.apache.spark.sql.functions._

/** Stage-level profiler for the radius-1 symmetric-delete pipeline
  * (PLANS.md round 13): times each prefix of the positional-join plan
  * by counting it, so a superlinear scale point can be attributed to a
  * STAGE (explode, candidate join, verify, distinct, profile) instead
  * of guessed at from the end-to-end number.
  *
  *   sbt -batch "Test/runMain graft.EditProf <dir>"
  */
object EditProf extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  val names = graft.Tables.customer(spark, dir)
    .select(col("c_custkey").as("id"), lower(col("c_name")).as("s"))

  def t(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n%,d")
  }

  val vp = names.select(col("id"), col("s"),
    explode(graft.functions.NormalizeKernels
      .deletion_variants_pos(col("s"))).as("vp"))
    .select(col("id"), col("s"), col("vp.v").as("v"), col("vp.pos").as("pos"))
  val a = vp.select(col("id").as("id_a"), col("s").as("s_a"), col("v"), col("pos"))
  val b = vp.select(col("id").as("id_b"), col("s").as("s_b"), col("v"), col("pos"))
  val samePos = a.join(b.hint("merge"), Seq("v", "pos"))
  val dels = vp.filter(col("pos") >= 0)
    .select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
  val origs = names.select(col("id").as("id_b"), col("s").as("s_b"),
    col("s").as("v"))
  val indel = dels.join(broadcast(origs), "v")

  t("names")(names.count())
  t("vp (explode)")(vp.count())
  t("samePos join")(samePos.count())
  t("indel join")(indel.count())
  val cand = samePos.select("id_a", "id_b", "s_a", "s_b")
    .unionByName(indel.select("id_a", "id_b", "s_a", "s_b"))
    .unionByName(indel.select(col("id_b").as("id_a"), col("id_a").as("id_b"),
      col("s_b").as("s_a"), col("s_a").as("s_b")))
    .filter(col("id_a") =!= col("id_b"))
  t("candidates (union)")(cand.count())
  val verified = cand.filter(levenshtein(col("s_a"), col("s_b")) <= 1)
    .select("id_a", "id_b")
  t("verified")(verified.count())
  t("distinct")(verified.dropDuplicates("id_a", "id_b").count())
  t("full query")(graft.operators.Dedup.dedupEditDistance(spark, dir).count())
  spark.stop()
}
