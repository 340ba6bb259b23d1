package graft

import graft.operators.{PageRank, TextAnalytics}
import org.apache.spark.sql.functions._

/** Reference-literal output-shape goldens (r9 verdict "what's missing"
  * item 3): the engine can emit the reference's exact saved/printed text
  * forms, pinned against independently-formatted driver-side strings.
  * The VALUES in each case are already hash-gated by the unformatted
  * sibling query; these specs gate the literal formatting. */
class TextGoldenSpec extends GraftSpec {

  test("pairs relfreq text lines match the reference's Scala-concat shape " +
      "(ComputeBigramRelativeFrequencyPairs.scala:83)") {
    val rows = TextAnalytics.bigramRelFreqPairs(spark, sfDir).collect()
    // independent driver-side formatting: the reference's exact concat,
    // raw Double.toString
    val want = rows.map { r =>
      "((" + r.getAs[String]("w1") + ", " + r.getAs[String]("w2") + ") " +
        " " + r.getAs[Double]("relfreq") + ")"
    }.toSet
    val got = TextAnalytics.bigramRelFreqPairsText(spark, sfDir).collect()
      .map(_.getString(0)).toSet
    assert(got == want,
      s"diff sample: ${(got -- want).take(3)} vs ${(want -- got).take(3)}")
    assert(got.nonEmpty)
  }

  test("ppr_topk_text lines match String.format(\"%.5f %d\") " +
      "(ExtractTopPersonalizedPageRankNodes.java:256)") {
    val base = PageRank.pprTopK(spark, sfDir)
      .select(col("source"), col("rnk"), round(col("rank"), 5).as("r5"),
        col("node"))
      .collect()
    val want = base.map { r =>
      (r.getAs[Long]("source"), r.getAs[Int]("rnk")) ->
        String.format(java.util.Locale.ROOT, "%.5f %d",
          Double.box(r.getAs[Double]("r5")), Long.box(r.getAs[Long]("node")))
    }.toMap
    val got = PageRank.pprTopKText(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("source"), r.getAs[Int]("rnk")) ->
        r.getAs[String]("line")).toMap
    assert(got == want)
    assert(got.nonEmpty)
    // shape check: every line is "<d>.<5 digits> <int>"
    got.values.foreach { l =>
      assert(l.matches("""-?\d+\.\d{5} \d+"""), s"bad line shape: $l")
    }
  }
}
