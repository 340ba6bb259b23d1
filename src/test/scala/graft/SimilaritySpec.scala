package graft

import graft.operators.Similarity

class SimilaritySpec extends GraftSpec {

  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }

  test("brute-force knn returns k ranked neighbors per query") {
    val rows = Similarity.knnBruteCosine(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == Similarity.nQueries)
    byQuery.values.foreach { rs =>
      assert(rs.length == Similarity.knnK)
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to Similarity.knnK))
      val cos = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.sameElements(cos.sortBy(-_)))
    }
  }

  test("IVF ANN achieves reasonable recall vs brute force") {
    val exact = neighborSets(Similarity.knnBruteCosine(spark, sfDir))
    val approx = neighborSets(Similarity.annIvfCosine(spark, sfDir))
    val hits = exact.keys.toSeq.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size
    }.sum
    val recall = hits.toDouble / (exact.size * Similarity.knnK)
    assert(recall >= 0.2, s"IVF recall $recall too low")
  }

  test("IVF quantizer is deterministic and returns k centroids") {
    val sample = Array.tabulate(64)(i => Array.tabulate(8)(j => (i * 31 + j * 7 % 13).toLong))
    val c1 = Similarity.trainQuantizer(sample)
    val c2 = Similarity.trainQuantizer(sample)
    assert(c1.length == Similarity.ivfCells)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
  }

  test("LSH ANN achieves reasonable recall vs brute force") {
    val exact = neighborSets(Similarity.knnBruteCosine(spark, sfDir))
    val approx = neighborSets(Similarity.annLshCosine(spark, sfDir))
    val hits = exact.keys.toSeq.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size
    }.sum
    val recall = hits.toDouble / (exact.size * Similarity.knnK)
    assert(recall >= 0.35, s"ANN recall $recall too low")
  }
}
