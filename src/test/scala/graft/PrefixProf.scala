package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale profiler for the prefix-filtered set-similarity join vs the
  * brute shingle self-join (PLANS.md round 9): per scale dir, times
  * both kernels COLD over the same capped shingle table and counts the
  * candidate volume each one feeds its verify/score stage.
  *
  *   sbt -batch "Test/runMain graft.PrefixProf <dir> [runs]"
  *
  * Brute candidate volume = Σ_sh f·(f−1)/2 over shingle frequencies
  * (what the equi-self-join emits before grouping); prefix volume =
  * the deduplicated candidate pair count after the length filter.
  */
object PrefixProf extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val runs = if (args.length > 1) args(1).toInt else 3
  val spark = GraftSession.baseBuilder("32").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  // one shared capped shingle table, materialized once (both kernels
  // consume the same artifact in the registered queries).
  //
  // dir == "skew" builds the frequency-skewed corpus the testdata
  // deliberately cannot produce (genscale keeps replicas shingle-
  // disjoint, so df stays flat at every sf): 5,800 docs of 40 shingles —
  // 9 rare (pair-shared, so the candidate path is exercised) + 31 drawn
  // round-robin from 200 HOT shingles, each landing in ~900 docs: under
  // the 1,000 stop-shingle cap, so the brute kernel must chew the full
  // Σ f·(f−1)/2 ≈ 80M-row self-join while the prefix order puts every
  // hot shingle past the prefix boundary. Docs 2k/2k+1 share their rare
  // block; docs 0..9 are identical (true near-dups both kernels must
  // find). Deterministic — no randomness.
  val sh = if (dir == "skew") {
    val sp = spark
    import sp.implicits._
    val nDocs = 5800
    val rows = (0 until nDocs).flatMap { d =>
      val rare = (0 until 9).map(i => s"r${d / 2}_$i")
      val hot = (0 until 31).map(j => s"hot${(d * 31 + j) % 200}")
      val all = if (d < 10) (0 until 40).map(i => s"dup_$i") else rare ++ hot
      all.distinct.map(s => (d.toLong, s))
    }
    rows.toDF("doc_id", "sh").repartition(32).localCheckpoint(true)
  } else {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.TextFunctions.tokenize(col("text")).as("ws"))
    docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.NgramStrings.ngram_strings(col("ws"), 3))).as("sh"))
  }
  val shc = graft.operators.Dedup.cappedShingles(sh, "m_prof").localCheckpoint(true)

  val bruteVolume = shc.groupBy("sh").agg(count(lit(1)).as("f"))
    .agg(sum(col("f") * (col("f") - 1) / 2)).head.getDouble(0).toLong
  val (prefixVolume, _) = time {
    graft.operators.Dedup.prefixCandidates(shc).count()
  }
  println(s"PROF dir=$dir brute_candidates=$bruteVolume prefix_candidates=$prefixVolume")

  (1 to runs).foreach { i =>
    val (nb, tb) = time {
      graft.operators.Dedup.jaccardPairsFromShingles(sh).count()
    }
    val (np, tp) = time {
      graft.operators.Dedup.prefixJaccardPairs(shc).count()
    }
    require(nb == np, s"result mismatch: brute $nb vs prefix $np")
    println(f"PROF run$i pairs=$nb brute=$tb%.2f prefix=$tp%.2f")
  }
  spark.stop()
}
