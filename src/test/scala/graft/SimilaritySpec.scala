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

  test("the recall matrix: every registered evaluation equals the test-side recompute") {
    val exact = neighborSets(Similarity.knnBruteCosine(spark, sfDir))
    val matrix = Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
      ("ivf", Similarity.annRecallIvf _, Similarity.annIvfCosine _),
      ("lsh", Similarity.annRecallLsh _, Similarity.annLshCosine _),
      ("pq", Similarity.annRecallPq _, Similarity.annPqCosine _),
      ("ivfpq", Similarity.annRecallIvfPq _, Similarity.annIvfPqCosine _))
    matrix.foreach { case (name, recallQ, legQ) =>
      val approx = neighborSets(legQ(spark, sfDir))
      val rows = recallQ(spark, sfDir).collect()
      assert(rows.length == exact.size, s"$name: one recall row per query")
      rows.foreach { r =>
        val q = r.getAs[Long]("query_id")
        val wantHits = approx.getOrElse(q, Set.empty).intersect(exact(q)).size.toLong
        assert(r.getAs[Long]("k") == Similarity.knnK.toLong)
        assert(r.getAs[Long]("n_hits") == wantHits, s"$name query $q hit count")
        assert(r.getAs[Double]("recall") ==
          wantHits.toDouble / Similarity.knnK)
      }
    }
  }

  test("PQ ANN achieves reasonable recall vs brute force") {
    val exact = neighborSets(Similarity.knnBruteCosine(spark, sfDir))
    val approx = neighborSets(Similarity.annPqCosine(spark, sfDir))
    val hits = exact.keys.toSeq.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size
    }.sum
    val recall = hits.toDouble / (exact.size * Similarity.knnK)
    // 8 subspaces × 16 codes is a coarse code on weakly-correlated
    // synthetic vectors; the rescore keeps top-in-ADC candidates, so
    // recall tracks how well the ADC proxy orders them
    assert(recall >= 0.2, s"PQ recall $recall too low")
  }

  test("IVFADC (IVF+PQ composed) achieves reasonable recall vs brute force") {
    val exact = neighborSets(Similarity.knnBruteCosine(spark, sfDir))
    val approx = neighborSets(Similarity.annIvfPqCosine(spark, sfDir))
    val hits = exact.keys.toSeq.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size
    }.sum
    val recall = hits.toDouble / (exact.size * Similarity.knnK)
    // the composition can only see neighbors inside the probed cells,
    // so its ceiling is IVF's recall; residual codebooks (less variance
    // per subspace than raw-vector codebooks) claw back ADC ordering
    // quality within that ceiling — gate at the same bar as IVF/PQ
    assert(recall >= 0.2, s"IVFADC recall $recall too low")
    assert(approx.size == Similarity.nQueries)
    approx.foreach { case (q, ns) =>
      assert(ns.size == Similarity.knnK, s"query $q returned ${ns.size} != k")
    }
  }

  test("IVF quantizer is deterministic and returns k centroids") {
    val sample = Array.tabulate(64)(i => Array.tabulate(8)(j => (i * 31 + j * 7 % 13).toLong))
    val c1 = Similarity.trainQuantizer(sample)
    val c2 = Similarity.trainQuantizer(sample)
    assert(c1.length == Similarity.ivfCells)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
  }

  test("banded near-dup default: bucket-keyed tiles, no full-corpus pair join") {
    // assert on the LAZY pipeline, where the joins are still visible —
    // the registered query materializes the survivor set and releases
    // the intermediate checkpoints, so its outer plan is just a sort
    // over the survivor scan
    val (df, release) = Similarity.lshBandedPairsLazy(
      Similarity.emb(spark, sfDir), Similarity.ndPlanesEmb, Similarity.nearDupCosine)
    df.collect()
    val nodes = physicalNodes(df)
    release()
    // r5 contract: the rescore batches candidates INSIDE (table, bucket)
    // groups — every join is an equi-join carrying the bucket key, and
    // nothing sweeps the whole corpus. The exact kernel's signature is
    // its non-equi block-tile index join (nested-loop over block ids);
    // its absence here is what "no full-corpus tile join" means.
    assert(!nodes.exists(n => n.nodeName.contains("CartesianProduct") ||
      n.nodeName.contains("BroadcastNestedLoopJoin")),
      nodes.map(_.nodeName).mkString(", "))
    val joins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty &&
      joins.forall(_.leftKeys.map(_.toString).exists(_.contains("bucket"))),
      joins.map(_.leftKeys.mkString(";")).mkString("\n"))
    // and the exact baseline IS the full-corpus tile shape (sanity: the
    // assertion above is actually able to see such nodes when they exist)
    val exact = Similarity.dedupEmbeddingExact(spark, sfDir)
    exact.collect()
    assert(physicalNodes(exact).exists(n =>
      n.nodeName.contains("BroadcastNestedLoopJoin") ||
        n.nodeName.contains("CartesianProduct")))
  }

  test("banded pipeline bands each vector exactly once") {
    // r6 contract: ONE banding flatMap execution — r5 lazily evaluated
    // the normalize+band pass twice (occupancy, then blocks). The
    // counter increments per input row of the flatMap, so a second
    // execution would read 2n. (Suites run sequentially in the forked
    // test JVM, so no other test can interleave increments.)
    val n = Similarity.emb(spark, sfDir).count()
    Similarity.bandedRowsSwept.reset()
    Similarity.dedupEmbeddingCosine(spark, sfDir).collect()
    val swept = Similarity.bandedRowsSwept.sum()
    assert(swept == n, s"banding flatMap swept $swept rows for $n vectors")
  }

  test("banded near-dup pairs: exact precision, near-total recall vs all-pairs") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val exact = pairs(Similarity.dedupEmbeddingExact(spark, sfDir))
    val banded = pairs(Similarity.dedupEmbeddingCosine(spark, sfDir))
    assert(exact.nonEmpty)
    assert(banded.subsetOf(exact), s"banded produced non-pairs: ${banded -- exact}")
    assert(banded.size >= (exact.size * 0.9).toInt,
      s"banding recall too low: ${banded.size}/${exact.size}")
  }

  test("scalar-quantized ANN: int8 storage shape and near-exact recall") {
    val sq = Similarity.annSqCosine(spark, sfDir)
    // the coarse stage's quantized arrays must really be array<tinyint>
    // in the plan — the 4×-narrower storage IS the operator's scale
    // claim, so it is pinned structurally, not just described
    val qTypes = sq.queryExecution.analyzed.collect {
      case p => p.output.filter(_.name == "q").map(_.dataType)
    }.flatten.distinct
    assert(qTypes.nonEmpty && qTypes.forall {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    }, s"quantized arrays are not array<tinyint> in the plan: $qTypes")
    // int8 quantization error (~0.4% relative) + 4k rescore depth ⇒ the
    // two-stage result should EQUAL the exact brute-force top-k here —
    // recall loss would show as a set difference
    val exact = neighborSets(Similarity.knnBruteCosine(spark, sfDir))
    val got = neighborSets(sq)
    assert(got.keySet == exact.keySet)
    val misses = exact.keys.toSeq
      .map(q => q -> exact(q).diff(got(q))).filter(_._2.nonEmpty)
    assert(misses.isEmpty,
      s"quantized two-stage search missed exact neighbors: $misses")
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

  test("filtered knn: neighbors share the query's label and match a driver recompute") {
    val got = Similarity.knnFilteredCosine(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("label"),
        r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    assert(got.nonEmpty)
    // driver-side witness over the raw table
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getAs[Int]("label")))
    val byLabel = raw.groupBy(_._3)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = raw.filter(_._1 < Similarity.nQueries).flatMap { case (qid, qv, lbl) =>
      byLabel(lbl).filter(_._1 != qid)
        .map { case (nid, v, _) =>
          (qid, lbl, nid, BigDecimal(cos(qv, v))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (_, _, nid, c) => (-c, nid) }
        .take(Similarity.knnK).zipWithIndex
        .map { case ((q, l, n, _), i) => (q, l, n, i + 1) }
    }.sortBy(t => (t._1, t._4)).toSeq
    assert(got.toSeq == want)
  }

  test("decontaminate_semantic equals the exact cross-side argmax") {
    import graft.operators.Dedup
    val exact = Similarity.dedupEmbeddingExact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def isB(id: Long) = id % Dedup.benchMod == Dedup.benchRem
    val expected = exact
      .filter { case (a, b, _) => isB(a) != isB(b) }
      .map { case (a, b, c) => if (isB(a)) (b, a, c) else (a, b, c) }
      .groupBy(_._1).map { case (v, ms) =>
        val best = ms.minBy { case (_, bid, c) => (-c, bid) }
        v -> ((best._2, best._3))
      }
    val got = Similarity.decontaminateSemantic(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // banded == exact on the cross-side slice (recall completeness holds
    // a fortiori on the subset of the pair set the pair spec already pins)
    assert(got == expected)
    assert(got.nonEmpty, "no contamination flagged - fixture lost its planted pairs")
    // every flagged vector is a corpus (non-benchmark) vector matched to
    // a benchmark vector at or above the threshold
    got.foreach { case (v, (bid, c)) =>
      assert(!isB(v) && isB(bid) && c >= Similarity.nearDupCosine)
    }
  }

  test("SemDeDup law: dup flags equal a driver-side brute recompute of " +
       "the upper-triangular within-cell rule") {
    val rows = Similarity.dedupSemanticKmeans(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[Boolean]("is_dup")))
    assert(rows.nonEmpty)
    // raw vectors straight off the table; cosine + rounding recomputed
    // in plain Scala, independent of the registered plan's expressions.
    // The cell assignment is taken from the result itself — it is pinned
    // separately by the oracle's keyed-Lloyd replay + the Lloyd trainer
    // laws (PropertiesSpec), so THIS law isolates the dedup rule.
    val vecs = graft.Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cosR(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cells = rows.map { case (id, c, _) => id -> c }.toMap
    rows.foreach { case (id, c, flag) =>
      val expected = cells.exists { case (oid, oc) =>
        oc == c && oid < id &&
          cosR(vecs(oid), vecs(id)) >= Similarity.nearDupCosine
      }
      assert(flag == expected, s"vec $id cell $c: flag $flag != brute $expected")
    }
    // the one-survivor-per-group guarantee, stated directly: no two
    // surviving cluster-mates are near-dups of each other
    val survivors = rows.filter(!_._3)
    for {
      (a, ca, _) <- survivors
      (b, cb, _) <- survivors
      if ca == cb && a < b
    } assert(cosR(vecs(a), vecs(b)) < Similarity.nearDupCosine,
      s"surviving near-dup pair ($a, $b) in cell $ca")
  }

  test("exact all-pairs kernel refuses past its declared envelope, typed") {
    // first fired for real by the r14 sf3 sweep (150k docs > 2^17 cap);
    // the TYPE matters: Verify turns ScaleEnvelopeExceeded into an
    // _ENVELOPE.json marker the at-scale sweep resolves via the sample
    // twin, while any other throwable fails the sweep's completeness
    // check. Dim-1 vectors keep the materialized count cheap — the guard
    // fires on the count, before any tile work.
    import spark.implicits._
    val n = (Similarity.maxExactVectors + 1).toInt
    val ds = spark.range(n).map(i => (i.toLong, Seq(1.0)))
    val e = intercept[graft.ScaleEnvelopeExceeded] {
      Similarity.cosinePairsKernel(spark, ds, 0.9).count()
    }
    assert(e.getMessage.contains("maxExactVectors"))
  }
}
