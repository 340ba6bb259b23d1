package graft

import graft.functions.TextFunctions._
import graft.operators.TextAnalytics
import org.apache.spark.sql.functions._

class TextAnalyticsSpec extends GraftSpec {
  import spark.implicits._

  test("tokenize lowercases, strips punctuation, drops empties") {
    val got = Seq("Hello, World!  foo-bar42 ").toDF("text")
      .select(tokenize(col("text")).as("ws"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("hello", "world", "foo", "bar42"))
  }

  test("bigrams of short and empty arrays") {
    val got = Seq(("a b c", 1), ("a", 2), ("", 3)).toDF("text", "id")
      .select(col("id"), bigrams(tokenize(col("text"))).as("bg"))
      .collect().map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1).length).toMap
    assert(got == Map(1 -> 2, 2 -> 0, 3 -> 0))
  }

  test("bigram relative frequencies sum to 1 per left word") {
    val sums = TextAnalytics.bigramRelFreqPairs(spark, sfDir)
      .groupBy("w1").agg(sum("relfreq").as("s"))
      .collect().map(_.getAs[Double]("s"))
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("PMI is symmetric (reference golden property, assignment1.md Q5)") {
    val rows = TextAnalytics.pmiPairs(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("pmi")).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), p) =>
      rows.get((b, a)).foreach(q => assert(math.abs(p - q) < 1e-9))
    }
  }

  test("wordcount totals match token totals") {
    val viaCount = TextAnalytics.wordCount(spark, sfDir)
      .agg(sum("cnt")).collect()(0).getLong(0)
    val direct = Tables.documents(spark, sfDir)
      .select(size(tokenize(col("text"))).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(viaCount == direct)
  }

  test("CMS heavy hitters equal the exact brute-force set; sketch contract holds") {
    val got = TextAnalytics.heavyHittersCms(spark, sfDir).collect()
    assert(got.nonEmpty)
    // the two contract flags: est ≥ exact (structural CMS property) and
    // est ≤ exact + ε·N (the accuracy bound the sketch is sized for)
    got.foreach { r =>
      assert(r.getAs[Boolean]("est_ge_exact"), s"under-estimate at ${r.getString(0)}")
      assert(r.getAs[Boolean]("est_within_eps"), s"over ε·N slack at ${r.getString(0)}")
    }
    // independent driver-side witness: exact bigram counts over the raw
    // text, thresholded with the same φ/floor arithmetic
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
    val cnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    var n = 0L
    docs.foreach { r =>
      val ws = r.getString(0).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      ws.lazyZip(ws.drop(1)).foreach { (a, b) => cnt(a + " " + b) += 1; n += 1 }
    }
    val threshold =
      math.max(math.ceil(TextAnalytics.hhPhi * n).toLong, TextAnalytics.hhMinSupport)
    val want = cnt.toSeq.filter(_._2 >= threshold).sortBy { case (s, c) => (-c, s) }
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == want)
  }

  test("CMS heavy hitters under engineered skew: the hot bigram dominates, contract holds") {
    import spark.implicits._
    // one bigram repeated 1000x against a diverse tail: the hot key is
    // exactly what the sketch must count accurately through collisions
    val hot = Seq.fill(1000)("hot pair").mkString(" ") // "pair hot" bridges too
    val tail = (0 until 400).map(i => (i + 1).toLong -> s"w${2 * i} w${2 * i + 1}")
    val dir = java.nio.file.Files.createTempDirectory("graft-cms").toString
    ((0L -> hot) +: tail).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalytics.heavyHittersCms(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    // N = 1999 hot-doc bigrams + 400 tail bigrams; threshold = floor(4)
    // → exactly the two hot-doc bigrams survive
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq(("hot pair", 1000L), ("pair hot", 999L)))
    got.foreach { case (bg, _, ge, eps) =>
      assert(ge && eps, s"sketch contract failed on $bg under skew")
    }
  }

  test("the CMS candidate filter sits below every exchange (map-only pruning)") {
    // the whole point of the two-pass shape: the sketch probe must
    // filter BEFORE any shuffle, so only candidate rows ever move
    val plan = TextAnalytics.heavyHittersCms(spark, sfDir)
      .queryExecution.executedPlan.toString
    // "Filter (UDF(" is the candidate filter; bare "UDF(" also appears in
    // the flag-column Project above the exchanges
    val udfFilterAt = plan.indexOf("Filter (UDF(")
    assert(udfFilterAt >= 0, s"no sketch-probe filter in plan:\n$plan")
    assert(plan.lastIndexOf("Exchange") < udfFilterAt,
      s"an exchange sits below the sketch-probe filter:\n$plan")
  }

  test("vocab coverage is monotone in k and matches a brute recount") {
    val rows = TextAnalytics.vocabCoverage(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == TextAnalytics.vocabKs)
    // brute recount from wordcount
    val tf = TextAnalytics.wordCount(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val total = tf.map(_._2).sum
    val ordered = tf.sortBy { case (w, c) => (-c, w) }
    rows.foreach { case (k, kept, covered, tot, cov) =>
      val want = ordered.take(k.toInt)
      assert(kept == want.length, s"k=$k kept")
      assert(covered == want.map(_._2).sum, s"k=$k covered")
      assert(tot == total)
      assert(cov == covered.toDouble / total)
    }
    // monotone: more vocab never covers less
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 <= b._5, "coverage not monotone in k")
      case _ =>
    }
  }
}
