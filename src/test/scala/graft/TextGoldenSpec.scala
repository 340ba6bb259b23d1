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

  test("stripes relfreq text lines match the reference's map rendering " +
      "(ComputeBigramRelativeFrequencyStripes.scala:70-84)") {
    // independent golden: recompute the stripes from the PAIRS query's
    // rows (a different physical plan) and format with the reference's
    // exact concat — "(A, {B=relfreq, C=relfreq})", raw Double.toString
    // — entries sorted by B (the documented canonicalization of the
    // reference's incidental HashMap order)
    val pairs = TextAnalytics.bigramRelFreqPairs(spark, sfDir).collect()
    val want = pairs.groupBy(_.getAs[String]("w1")).map { case (w1, rs) =>
      val entries = rs.sortBy(_.getAs[String]("w2"))
        .map(r => r.getAs[String]("w2") + "=" + r.getAs[Double]("relfreq"))
      "(" + w1 + ", {" + entries.mkString(", ") + "})"
    }.toSet
    val got = TextAnalytics.bigramRelFreqStripesText(spark, sfDir).collect()
      .map(_.getString(0)).toSet
    assert(got == want,
      s"diff sample: ${(got -- want).take(2)} vs ${(want -- got).take(2)}")
    assert(got.nonEmpty)
    got.foreach { l =>
      assert(l.matches("""\(\S+, \{.*=.*\}\)"""), s"bad stripe shape: $l")
    }
  }

  test("PMI stripes text lines match the reference's tuple print " +
      "(StripesPMI.scala:97-101)") {
    // independent golden from the PAIRS query (different plan): entries
    // "B=(pmi,count)" comma-joined with NO space, wrapped "(A, {...})"
    val pairs = TextAnalytics.pmiPairs(spark, sfDir).collect()
    val want = pairs.groupBy(_.getAs[String]("w1")).map { case (w1, rs) =>
      val entries = rs.sortBy(_.getAs[String]("w2")).map(r =>
        r.getAs[String]("w2") + "=(" + r.getAs[Double]("pmi") + "," +
          r.getAs[Long]("cnt") + ")")
      "(" + w1 + ", {" + entries.mkString(",") + "})"
    }.toSet
    val got = TextAnalytics.pmiStripesText(spark, sfDir).collect()
      .map(_.getString(0)).toSet
    assert(got == want,
      s"diff sample: ${(got -- want).take(2)} vs ${(want -- got).take(2)}")
    assert(got.nonEmpty)
    got.foreach { l =>
      assert(l.matches("""\(\S+, \{.*=\(.*,\d+\).*\}\)"""), s"bad tuple shape: $l")
    }
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

  test("PPR per-iteration artifact names match the reference's " +
      "DecimalFormat(\"0000\") layout (RunPersonalizedPageRankBasic.java:365,472)") {
    // the naming function against an ACTUAL DecimalFormat("0000") — the
    // zero-padding is load-bearing: the reference's phases read the
    // artifacts back by name and lexicographic listing must equal
    // iteration order
    val fmt = new java.text.DecimalFormat("0000")
    Seq(0, 1, 7, 10, 42, 999, 1000, 9999, 10000).foreach { i =>
      assert(PageRank.iterLabel(i) == "iter" + fmt.format(i),
        s"iterLabel($i) diverges from DecimalFormat(\"0000\")")
    }
    // and the trace hook actually lays the artifacts out under it: one
    // directory per iteration, readable, with the final one carrying the
    // same rows the registered top-k query ranks
    val out = java.nio.file.Files.createTempDirectory("graft-ppr-trace")
    try {
      val finalRanks = PageRank.pprIterTrace(spark, sfDir, out.toString)
      val dirs = out.toFile.listFiles().filter(_.isDirectory)
        .map(_.getName).sorted.toSeq
      assert(dirs == (1 to PageRank.iterations).map(PageRank.iterLabel),
        s"trace layout: $dirs")
      val persisted = spark.read.parquet(s"$out/${PageRank.iterLabel(PageRank.iterations)}")
      val wantRows = finalRanks
        .select(col("source"), col("node"), round(col("rank"), 9).as("r"))
        .collect().map(_.toSeq).toSet
      val gotRows = persisted
        .select(col("source"), col("node"), round(col("rank"), 9).as("r"))
        .collect().map(_.toSeq).toSet
      assert(gotRows == wantRows && gotRows.nonEmpty)
    } finally graft.sources.FileSinkFs.deleteRecursively(out)
  }
}
