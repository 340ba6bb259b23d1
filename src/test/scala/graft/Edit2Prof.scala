package graft

import org.apache.spark.sql.functions._

/** Stage-level profiler for the radius-2 decomposition (PLANS.md round
  * 14): times each LEG of the k = 2 candidate plan by counting it, so
  * the constant can be attributed to a leg (positional sub-sub join,
  * D1 x D1, D1 x D2 + verify, D2 x originals, radius-1 base, final
  * distinct) instead of guessed at from the end-to-end number.
  *
  *   sbt -batch "Test/runMain graft.Edit2Prof <dir>"
  */
object Edit2Prof extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  val names = graft.Tables.customer(spark, dir)
    .select(col("c_custkey").as("id"), lower(col("c_name")).as("s"))
    // the registered profile collapses exact duplicates first; profile
    // the same distinct-value frame it feeds the pair kernel
    .groupBy("s").agg(min("id").as("id")).select("id", "s")

  def t(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n%,d")
  }

  // the legs, mirroring Dedup.editDistancePairsDirected's k = 2 plan
  // (keep in sync — this profiler exists to attribute that plan's cost)
  def explode1(src: org.apache.spark.sql.DataFrame) = src
    .select(col("id"), col("s"),
      explode(graft.functions.NormalizeKernels
        .deletion_variants_pos(col("s"))).as("vp"))
    .select(col("id"), col("s"), col("vp.v").as("v"), col("vp.pos").as("pos"))
    .filter(col("pos") >= 0)
  def explode2(src: org.apache.spark.sql.DataFrame) = src
    .select(col("id"), col("s"),
      explode(graft.functions.NormalizeKernels
        .deletion_variants_pos2(col("s"))).as("vp"))
    .select(col("id"), col("s"), col("vp.v").as("v"),
      col("vp.i").as("i"), col("vp.j").as("j"))
  val lenSet = names.select(length(col("s")).as("len")).distinct()
  def withPartnerLen(delta: Int) =
    names.join(broadcast(lenSet),
      length(col("s")) + delta === col("len"), "left_semi")
  val vp2 = explode2(names)
  def diffAt(p: org.apache.spark.sql.Column) =
    col("s_a").substr(p + 1, lit(1)) =!= col("s_b").substr(p + 1, lit(1))
  val ss = vp2.select(col("id").as("id_a"), col("s").as("s_a"),
      col("v"), col("i"), col("j"))
    .join(vp2.select(col("id").as("id_b"), col("s").as("s_b"),
      col("v"), col("i"), col("j")).hint("merge"), Seq("v", "i", "j"))
    .filter(diffAt(col("i")) && diffAt(col("j")))
  val d1 = explode1(names)
  val d1a = d1.select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
  val d1b = d1.select(col("id").as("id_b"), col("s").as("s_b"), col("v"))
  val x11 = d1a.join(d1b.hint("merge"), "v")
  val x12 = explode1(withPartnerLen(+1))
    .select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
    .join(explode2(withPartnerLen(-1))
      .select(col("id").as("id_b"), col("s").as("s_b"), col("v"))
      .hint("merge"), "v")
    .filter(levenshtein(col("s_a"), col("s_b")) <= 2)
  val x02 = explode2(withPartnerLen(-2))
    .select(col("id").as("id_a"), col("s").as("s_a"), col("v"))
    .join(broadcast(withPartnerLen(+2)
      .select(col("id").as("id_b"), col("s").as("s_b"), col("s").as("v"))), "v")

  t("names (distinct)")(names.count())
  t("vp2 explode")(vp2.count())
  t("ss positional join")(ss.count())
  t("x11 d1 x d1")(x11.count())
  t("x12 d1 x d2 + verify")(x12.count())
  t("x02 d2 x originals")(x02.count())
  t("full directed pairs")(
    graft.operators.Dedup.editDistancePairsDirected(names, 2).count())
  t("registered profile")(
    graft.operators.Dedup.dedupEditDistance2(spark, dir).count())
  spark.stop()
}
