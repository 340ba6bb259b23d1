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
}
