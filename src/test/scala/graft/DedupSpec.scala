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
