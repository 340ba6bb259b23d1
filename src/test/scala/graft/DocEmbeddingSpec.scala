package graft

import graft.operators.{Dedup, DocEmbedding}

class DocEmbeddingSpec extends GraftSpec {

  test("hashing-trick embeddings recover the exact Jaccard near-dup pairs") {
    val jaccard = Dedup.dedupNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val emb = DocEmbedding.docEmbeddingNearDup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(jaccard.nonEmpty)
    val recalled = jaccard.intersect(emb).size.toDouble / jaccard.size
    assert(recalled >= 0.9, s"embedding recall of Jaccard pairs: $recalled")
  }

  test("banded doc near-dup: subset of the exact kernel with near-total recall") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val exact = pairs(DocEmbedding.docEmbeddingExact(spark, sfDir))
    val banded = pairs(DocEmbedding.docEmbeddingNearDup(spark, sfDir))
    assert(exact.nonEmpty)
    assert(banded.subsetOf(exact), s"banded produced non-pairs: ${banded -- exact}")
    assert(banded.size >= (exact.size * 0.9).toInt,
      s"banding recall too low: ${banded.size}/${exact.size}")
  }

  test("document vectors are deterministic and dense") {
    val v1 = DocEmbedding.docVectors(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val v2 = DocEmbedding.docVectors(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(v1 == v2)
    assert(v1.values.forall(_.length == DocEmbedding.embDim))
  }
}
