package graft

import graft.operators.Dedup

class DedupSpec extends GraftSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

  test("exact dedup: every doc accounted for, counts sum to corpus size") {
    val rows = Dedup.dedupExact(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_copies")).sum
    val corpus = Tables.documents(spark, sfDir).count()
    assert(total == corpus)
  }

  test("minhash-lsh recovers the brute-force Jaccard near-dup pairs") {
    val brute = pairSet(Dedup.dedupNgramJaccard(spark, sfDir))
    val lsh = pairSet(Dedup.dedupMinhashLsh(spark, sfDir))
    assert(brute.nonEmpty, "testdata should contain planted near-dups")
    // verification step makes precision exact; recall should be near-total
    assert(lsh.subsetOf(brute))
    assert(lsh.size >= (brute.size * 0.9).toInt,
      s"LSH recall too low: ${lsh.size}/${brute.size}")
  }

  test("cluster dedup: components agree with driver-side union-find over the pairs") {
    val pairs = Dedup.dedupNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(n => n -> find(n)).toMap
    val got = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    assert(got == want)
  }

  test("simhash banding finds exactly the Hamming<=3 pairs (vs brute force)") {
    val fps = Dedup.simhashFingerprint(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
    val brute = (for {
      (ida, fa) <- fps; (idb, fb) <- fps if ida < idb
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ida, idb)).toSet
    val banded = pairSet(Dedup.dedupSimhash(spark, sfDir))
    assert(banded == brute)
  }
}
