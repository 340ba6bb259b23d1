package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends GraftSpec {
  import spark.implicits._

  /** Dense driver-side PPR for cross-checking the distributed loop:
    * r' = (1−α)(Mᵀr + D·e_s) + α·e_s. */
  private def densePpr(edges: Seq[(Long, Long)], source: Long,
      alpha: Double, iters: Int): Map[Long, Double] = {
    val nodes = (edges.flatMap(e => Seq(e._1, e._2)) :+ source).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val out = edges.groupBy(_._1).map { case (s, es) => idx(s) -> es.map(e => idx(e._2)) }
    var r = Array.tabulate(nodes.length)(i => if (nodes(i) == source) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val next = Array.fill(nodes.length)(0.0)
      var dangling = 0.0
      for (i <- nodes.indices) {
        out.get(i) match {
          case Some(ns) => ns.foreach(j => next(j) += r(i) / ns.length)
          case None => dangling += r(i)
        }
      }
      val s = idx(source)
      r = Array.tabulate(nodes.length)(j =>
        (1 - alpha) * (next(j) + (if (j == s) dangling else 0.0)) +
          (if (j == s) alpha else 0.0))
    }
    nodes.zip(r).toMap
  }

  test("distributed PPR matches the dense reference on a literal graph") {
    // 5-node graph with a dangling node (4) and a cycle, as FIXTURES §2 suggests
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))
    val edgesDf = edges.toDF("src", "dst")
    val got = PageRank.personalizedPageRank(spark, sfDir, edgesDf)
      .collect()
      .map(r => (r.getAs[Long]("source"), r.getAs[Long]("node")) -> r.getAs[Double]("rank"))
      .toMap
    for (s <- PageRank.sources) {
      val want = densePpr(edges, s, PageRank.alpha, PageRank.iterations)
      want.foreach { case (node, rank) =>
        val g = got.getOrElse((s, node), 0.0)
        assert(math.abs(g - rank) < 1e-9, s"source $s node $node: $g vs $rank")
      }
    }
  }

  test("log-space PPR (reference numeric domain) agrees with normal space") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))
    val edgesDf = edges.toDF("src", "dst")
    val normal = PageRank.personalizedPageRank(spark, sfDir, edgesDf)
      .collect()
      .map(r => (r.getAs[Long]("source"), r.getAs[Long]("node")) -> r.getAs[Double]("rank"))
      .toMap
    val logSpace = PageRank.personalizedPageRankLog(spark, sfDir, edgesDf)
      .collect()
      .map(r => (r.getAs[Long]("source"), r.getAs[Long]("node")) ->
        math.exp(r.getAs[Double]("logRank")))
      .toMap
    assert(logSpace.keySet == normal.keySet)
    logSpace.foreach { case (k, v) =>
      assert(math.abs(v - normal(k)) < 1e-9, s"$k: log-space $v vs ${normal(k)}")
    }
  }

  test("PPR mass per source sums to 1") {
    val sums = PageRank.personalizedPageRank(
        spark, sfDir, PageRank.graphEdges(spark, sfDir))
      .groupBy("source").agg(sum("rank").as("s"))
      .collect().map(_.getAs[Double]("s"))
    assert(sums.length == PageRank.sources.length)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-6, s"mass $s"))
  }

  test("ppr_topk is ranked and rooted at each source") {
    val rows = PageRank.pprTopK(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getAs[Long]("source"))
    assert(bySource.keySet == PageRank.sources.toSet)
    bySource.foreach { case (s, rs) =>
      // the source itself holds the largest personalized mass
      assert(rs.minBy(_.getAs[Int]("rnk")).getAs[Long]("node") == s)
    }
  }

  test("triangle_count matches a brute set recompute; orientation bounds wedges") {
    val row = PageRank.triangleCount(spark, sfDir).collect()(0)
    // brute: capped projection and raw set arithmetic on the driver
    val byPart = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (p, rs) =>
        p -> rs.map(_._2).sorted.take(PageRank.triMaxPerPart)
      }
    val edges = byPart.values.flatMap(s =>
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))).toSet
    val adj = (edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
      .groupBy(_._1).map { case (n, ps) => n -> ps.map(_._2).toSet }
    val triBrute = edges.toSeq.map { case (u, v) =>
      (adj(u) intersect adj(v)).size.toLong
    }.sum / 3
    assert(row.getAs[Long]("n_nodes") == adj.size)
    assert(row.getAs[Long]("n_edges") == edges.size)
    assert(row.getAs[Long]("n_triangles") == triBrute)
    // the orientation's whole point: wedge work is Σ C(outdeg,2) over
    // the DEGREE-ORDERED graph, far below the naive Σ C(deg,2)
    val naiveWedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(row.getAs[Long]("n_wedges") <= naiveWedges,
      s"${row.getAs[Long]("n_wedges")} oriented vs $naiveWedges naive")
  }

  test("triangleStats on adversarial random graphs (mass degree ties) matches brute") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 8 + rnd.nextInt(9)
      val p = 0.3 + rnd.nextDouble() * 0.4
      val edges = (for {
        i <- 0L until n; j <- i + 1 until n if rnd.nextDouble() < p
      } yield (i, j)).toSeq
      if (edges.nonEmpty) {
        val row = PageRank.triangleStats(spark, edges.toDF("u", "v")).collect()(0)
        val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
          .groupBy(_._1).map { case (k, ps) => k -> ps.map(_._2).toSet }
        val tri = edges.map { case (u, v) => (adj(u) intersect adj(v)).size.toLong }
          .sum / 3
        assert(row.getAs[Long]("n_nodes") == adj.size, s"seed $seed nodes")
        assert(row.getAs[Long]("n_edges") == edges.size, s"seed $seed edges")
        assert(row.getAs[Long]("n_triangles") == tri,
          s"seed $seed: got ${row.getAs[Long]("n_triangles")}, brute $tri " +
            s"(n=$n p=$p edges=${edges.size})")
      }
    }
  }
}
