package graft

import graft.operators.CorpusPipeline
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends GraftSpec {

  test("stratified sample is deterministic and respects the rate table") {
    val s1 = CorpusPipeline.sampleStratified(spark, sfDir).collect().toSeq
    val s2 = CorpusPipeline.sampleStratified(spark, sfDir).collect().toSeq
    assert(s1 == s2, "hash sampling must be resample-stable")
    assert(s1.nonEmpty)
    // every kept row's bucket is under its stratum rate
    assert(s1.forall(r => r.getLong(2) < r.getLong(3)))
  }

  test("repetition stats are internally consistent") {
    val rows = CorpusPipeline.docRepetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, uniq, maxRep, dup) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(uniq <= n && maxRep <= n && maxRep >= 1)
      assert(dup >= 0.0 && dup < 1.0)
      assert(math.abs(dup - (n - uniq).toDouble / n) == 0.0)
    }
  }

  test("normalization is a fixpoint (normalizing twice changes nothing)") {
    val once = CorpusPipeline.textNormalize(spark, sfDir)
    val twice = once.select(col("doc_id"),
      trim(regexp_replace(
        regexp_replace(lower(col("norm_text")), "[^a-z0-9 \t\n\r\f]", " "),
        "[ \t\n\r\f]+", " ")).as("renorm"))
    val diff = once.join(twice, "doc_id")
      .filter(col("norm_text") =!= col("renorm")).count()
    assert(diff == 0)
    // normalization never grows the text
    assert(once.filter(col("n_after") > col("n_before")).count() == 0)
  }

  test("language shards prune at the partition level and lose no rows") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    CorpusPipeline.writeLanguageShards(spark, sfDir, out)
    val back = spark.read.parquet(out)
    // per-language counts survive the shard round-trip
    val want = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = back.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    // a lang filter must become a PartitionFilter on the scan — pruning
    // directories, not reading-and-discarding rows
    val plan = back.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning:\n$plan")
  }

  test("funnel stages are monotonically non-increasing") {
    val stages = CorpusPipeline.corpusFunnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val order = Seq("1_total", "2_nonshort", "3_quality", "4_exact_unique", "5_sampled")
    assert(stages.keySet == order.toSet)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(stages(a) >= stages(b), s"$a=${stages(a)} < $b=${stages(b)}")
    }
    assert(stages("1_total") > 0)
  }
}
