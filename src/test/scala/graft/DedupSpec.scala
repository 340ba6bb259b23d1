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

  test("minhash_jaccard_err: estimator errors are small and internally consistent") {
    val rows = Dedup.minhashJaccardErr(spark, sfDir).collect()
    assert(rows.nonEmpty, "the near-dup pair graph must not be empty")
    rows.foreach { r =>
      val agree = r.getAs[Long]("agree")
      val est = r.getAs[Double]("jaccard_est")
      val j = r.getAs[Double]("jaccard")
      assert(agree >= 0 && agree <= Dedup.minhashK)
      assert(est == agree.toDouble / Dedup.minhashK)
      assert(r.getAs[Double]("abs_err") == math.abs(j - est))
      assert(j >= Dedup.jaccardThreshold)
    }
    // k = 64 at the planted-dup J: the estimator should track closely on
    // average (sigma ~ sqrt(J(1-J)/64) ~ 0.02 at J ~ 0.98)
    val meanErr = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    assert(meanErr < 0.1, s"mean |err| $meanErr implausibly high for k=64")
  }

  test("prefix-filtered Jaccard join equals the brute kernel row for row") {
    val brute = Dedup.dedupNgramJaccard(spark, sfDir).collect().map(_.toSeq).toSet
    val pfx = Dedup.dedupJaccardPrefix(spark, sfDir).collect().map(_.toSeq).toSet
    assert(brute.nonEmpty, "testdata should contain planted near-dups")
    assert(pfx == brute)
  }

  test("prefix filter keeps pairs at the exact J = t boundary (fp prefix length would lose them)") {
    // |a|=4 ⊂ |b|=5 gives J = 4/5 = 0.8 = t exactly. The fp trap: 0.8 in
    // double rounds UP, so ceil(0.8*5.0) = 5 and b's prefix would shrink
    // to just its rarest shingle {s5}, while a's 1-prefix is {s1} — no
    // collision, pair silently lost. Integer permille arithmetic gives
    // ceil = 4, b's 2-prefix = {s5, s1}, and the collision on s1 survives.
    val sp = spark
    import sp.implicits._
    val sh = ((1 to 4).map(i => (1L, s"s$i")) ++ (1 to 5).map(i => (2L, s"s$i")))
      .toDF("doc_id", "sh")
    val got = Dedup.prefixJaccardPairs(Dedup.cappedShingles(sh, "m_pfx_boundary"))
      .collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("doc_a") == 1L && got(0).getAs[Long]("doc_b") == 2L)
    assert(got(0).getAs[Double]("jaccard") == 0.8)
  }

  test("bloom-pruned decontamination equals the exact pipeline row for row") {
    val exact = Dedup.decontaminate(spark, sfDir).collect().map(_.toSeq).toSet
    val bloom = Dedup.decontaminateBloom(spark, sfDir).collect().map(_.toSeq).toSet
    assert(exact.nonEmpty, "testdata should contain contaminated docs")
    assert(bloom == exact)
  }

  test("containment near-dup matches a driver-side recompute on raw shingle sets") {
    val sets = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getAs[String]("text").toLowerCase
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        r.getAs[Long]("doc_id") -> ws.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.toMap.filter(_._2.nonEmpty)
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      i = (sa & sb).size
      if i * 1000L >= sa.size * Dedup.containmentThresholdPermille
    } yield (a, b, sa.size.toLong, i.toDouble / sa.size)).toSet
    val got = Dedup.dedupContainment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_inner"),
        r.getAs[Double]("containment"))).toSet
    assert(got.nonEmpty, "testdata should contain contained docs")
    assert(got == want)
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

  test("connected components converge on a chain far deeper than the round cap") {
    // diameter-100 path graph: plain min-label propagation would need 100
    // rounds and the old 10-round cap returned partial labels SILENTLY;
    // pointer doubling must converge inside the cap (2^10 ≫ 100) — and if
    // it ever cannot, connectedComponents throws instead of returning
    val sp = spark
    import sp.implicits._
    val chain = (0L until 100L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(labels.size == 101)
    assert(labels.values.forall(_ == 0L), s"unconverged labels: ${labels.filter(_._2 != 0L)}")
    // two disjoint components keep distinct representatives
    val two = ((0L until 5L).map(i => (i, i + 1)) ++
      (100L until 110L).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
    val reps = Dedup.connectedComponents(two).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert((0L to 5L).forall(reps(_) == 0L) && (100L to 110L).forall(reps(_) == 100L))
  }

  test("incremental dedup equals the cross-side slice of the full self-dedup") {
    val full = pairSet(Dedup.dedupMinhashLsh(spark, sfDir))
    def isNew(id: Long) = id % Dedup.incrementalMod == Dedup.incrementalRem
    // full pairs are canonical (a < b); incremental pairs are oriented
    // (new, old) — re-orient the cross-side subset for comparison
    val wantCross = full.collect {
      case (a, b) if isNew(a) != isNew(b) => if (isNew(a)) (a, b) else (b, a)
    }
    val got = Dedup.dedupIncremental(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_old"))).toSet
    assert(got.nonEmpty, "expected some batch-vs-corpus near-dups in testdata")
    assert(got == wantCross)
    got.foreach { case (n, o) => assert(isNew(n) && !isNew(o)) }
  }

  test("decontaminate: benchmark excluded, flags consistent, benchmark side broadcast") {
    val df = Dedup.decontaminate(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty, "some corpus docs should collide with benchmark shingles")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % Dedup.benchMod != Dedup.benchRem,
        s"benchmark doc $id must not appear in the corpus-side output")
      val ratio = r.getAs[Double]("contam_ratio")
      val flagged = r.getAs[Boolean]("flagged")
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_shingles"))
      assert(flagged == (ratio >= Dedup.contamThreshold))
    }
    // independent oracle: recompute flagged docs from raw shingle sets
    val sh = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map { r =>
        val ws = r.getAs[String]("text").toLowerCase
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        r.getAs[Long]("doc_id") -> ws.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.toMap
    val benchSet = sh.collect {
      case (id, s) if id % Dedup.benchMod == Dedup.benchRem => s
    }.foldLeft(Set.empty[String])(_ ++ _)
    val wantFlagged = sh.collect {
      case (id, s) if id % Dedup.benchMod != Dedup.benchRem && s.nonEmpty &&
        s.count(benchSet) .toDouble / s.size >= Dedup.contamThreshold => id
    }.toSet
    val gotFlagged = rows.filter(_.getAs[Boolean]("flagged"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(gotFlagged == wantFlagged)
    // the fixed-size benchmark side must ride a broadcast join; the
    // corpus side must never be broadcast — check the shingle-keyed
    // join's BUILD side subtree, not just that some broadcast join
    // exists (AQE also converts the small doc_id-keyed tail join)
    val bhj = physicalNodes(df).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.leftKeys.map(_.toString).exists(_.startsWith("sh#")) => j
    }
    assert(bhj.nonEmpty, physicalNodes(df).mkString("\n"))
    val build = bhj.head.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft  => bhj.head.left
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => bhj.head.right
    }
    val buildStr = build.toString
    assert(buildStr.contains(s"% ${Dedup.benchMod}") &&
      buildStr.contains(s"= ${Dedup.benchRem}") && !buildStr.contains("NOT"),
      s"broadcast build side is not the benchmark slice:\n$buildStr")
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

  test("span dedup: hand-built corpus yields exactly the expected merged spans") {
    import spark.implicits._
    val run = "a b c d e f g h" // spanK = 8 shared tokens
    val docs = Seq(
      (0L, s"$run qa qb"),          // run at tokens [0,8)
      (1L, s"zb $run zc"),          // run at tokens [1,9)
      (2L, s"$run $run"),           // doubled → adjacent islands merge to [0,16)
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")) // all-unique — no spans
    val dir = java.nio.file.Files.createTempDirectory("graft-spans").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == Seq((0L, 0, 8), (1L, 1, 9), (2L, 0, 16)))
  }

  test("span removal: cleaned text equals a driver-side cut of the reported spans") {
    val spans = Dedup.dedupSpans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).groupBy(_._1)
    val got = Dedup.dedupSpansClean(spark, sfDir).collect()
    assert(got.nonEmpty && got.length == spans.size, "one row per affected doc")
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty)).toMap
    got.foreach { r =>
      val id = r.getLong(0)
      val ws = toks(id)
      val covered = spans(id).flatMap { case (_, s, e) => s until e }.toSet
      assert(r.getAs[Long]("n_removed") == covered.size.toLong, s"doc $id removal count")
      assert(r.getAs[String]("clean_text") ==
        ws.indices.filterNot(covered).map(ws).mkString(" "), s"doc $id cleaned text")
    }
  }

  test("span dedup on testdata: every in-span window repeats; spans disjoint and maximal") {
    val k = Dedup.spanK
    val spans = Dedup.dedupSpans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spans.nonEmpty, "testdata's planted near-dups should yield spans")
    // driver-side witness: the corpus k-gram occurrence multiset
    val toksByDoc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)).toMap
    val gramCount = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    toksByDoc.values.foreach(ws =>
      ws.sliding(k).filter(_.length == k).foreach(g => gramCount(g.mkString(" ")) += 1))
    def dup(ws: Array[String], s: Int): Boolean =
      s >= 0 && s + k <= ws.length && gramCount(ws.slice(s, s + k).mkString(" ")) >= 2
    spans.groupBy(_._1).foreach { case (docId, ds) =>
      val ws = toksByDoc(docId)
      val sorted = ds.sortBy(_._2)
      // disjoint, ordered, each ≥ k long
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(e1 < s2, s"overlap in doc $docId")
        case _ =>
      }
      sorted.foreach { case (_, s, e) =>
        assert(e - s >= k)
        // every k-window inside the span is globally duplicated...
        (s to e - k).foreach(i => assert(dup(ws, i), s"doc $docId window $i not duplicated"))
        // ...and the span is maximal: the windows just outside are not
        assert(!dup(ws, s - 1), s"doc $docId span [$s,$e) extendable left")
        assert(!dup(ws, e - k + 1), s"doc $docId span [$s,$e) extendable right")
      }
    }
  }

  test("dedup_best_survivor keeps exactly the argmax-quality member per cluster") {
    val q = graft.operators.TextQuality.docQuality(spark, sfDir)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val members = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))) // (doc_id, cluster_rep)
    assert(members.nonEmpty, "fixture lost its planted near-dup clusters")
    val expected = members.groupBy(_._2).map { case (rep, ms) =>
      rep -> ms.map(_._1).minBy(id => (-q(id), id))
    }
    val got = Dedup.dedupBestSurvivor(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // cluster_rep -> best_doc
    assert(got == expected)
    // the quality criterion is doing real work: on at least one cluster
    // the best member is NOT the min-id representative dedup_survivors
    // would keep (if this ever fails the fixture degenerated, not the op)
    assert(expected.exists { case (rep, best) => best != rep },
      "every cluster's best member is its min-id rep - quality is vacuous here")
  }

  test("split_leakage_safe covers every doc once and never splits a cluster") {
    val splits = Dedup.splitLeakageSafe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(splits.length == nDocs, "split must be a partition of the corpus")
    assert(splits.map(_._1).distinct.length == splits.length)
    // band assignment agrees with the bucket
    splits.foreach { case (_, _, b, s) =>
      val want = if (b < Dedup.splitTrainPermille) "train"
        else if (b < Dedup.splitValPermille) "val" else "test"
      assert(s == want, s"bucket $b mapped to $s")
    }
    // the leakage guard itself: all members of a near-dup cluster land in
    // the SAME split (splitting on raw doc_id hash would violate this)
    val byDoc = splits.map(t => t._1 -> t._4).toMap
    Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(0)))
      .groupBy(_._1).foreach { case (rep, ms) =>
        val ss = ms.map(m => byDoc(m._2)).distinct
        assert(ss.length == 1, s"cluster $rep straddles splits: ${ss.toSeq}")
      }
    // all three bands are populated at 500 groups (P(miss) ~ 1e-11)
    assert(splits.map(_._4).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }

  test("dedup_rate_by_source conserves documents and agrees with the survivors") {
    val rows = graft.operators.Dedup.dedupRateBySource(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Double]("dup_rate")))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2).sum == nDocs, "every document in exactly one source row")
    // total dropped across sources = docs the survivor pass removes
    val survivors = graft.operators.Dedup.dedupSurvivors(spark, sfDir).count()
    assert(rows.map(_._4).sum == nDocs - survivors)
    rows.foreach { case (src, n, clustered, dropped, rate) =>
      assert(dropped <= clustered && clustered <= n, src)
      assert(math.abs(rate - dropped.toDouble / n) < 1e-6, src)
    }
  }

  test("dedup_cluster_profile conserves the cluster table and bounds sizes") {
    val profile = graft.operators.Dedup.dedupClusterProfile(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val clusters = graft.operators.Dedup.dedupClusters(spark, sfDir)
      .collect().map(r => r.getAs[Long]("cluster_rep"))
    val sizes = clusters.groupBy(identity).values.map(_.length.toLong).toSeq
    assert(profile.map(_._2).sum == sizes.length, "every cluster in one bucket")
    assert(profile.map(_._4).sum == clusters.length, "every member counted")
    // pair-graph clusters have >= 2 members, so no bucket-0 row exists
    assert(profile.forall(_._1 >= 1))
    profile.foreach { case (b, _, maxS, _) =>
      assert(maxS >= (1L << b) && maxS < (1L << (b + 1)))
    }
    assert(profile.map(_._3).max == sizes.max)
  }

  test("symmetric-delete blocking is complete: ed<=1 pairs equal brute force " +
       "on adversarial geometries") {
    // every edit KIND at every POSITION (head/middle/tail substitution,
    // insertion, deletion), identical strings, empty-adjacent strings,
    // multibyte codepoints (deleting half a surrogate would fabricate
    // pairs or crash), and decoys at ed=2 that a sloppy variant join
    // would admit. Brute reference: driver-side DP levenshtein.
    val strings = Seq(
      "abcdef",            // base
      "xbcdef", "abcxef", "abcdex",  // substitutions at head/mid/tail
      "abcdefg", "zabcdef",          // insertions tail/head
      "bcdef", "abcde",              // deletions head/tail
      "abcdef",                      // exact duplicate
      "ab", "a", "",                 // short + empty chain
      "caf\u00e9", "caf\u00e9s", "cafe",  // accented + its neighbors
      "\ud83d\ude00ab", "ab",            // emoji-prefixed vs plain
      "qqqqqq", "abzzef")            // decoys: ed 2+ from base
    val sp = spark
    import sp.implicits._
    val names = strings.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = graft.operators.Dedup.editDistancePairs(names)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lev(a: String, b: String): Int = {
      // codepoint-based DP, mirroring Spark/DuckDB levenshtein
      val x = a.codePoints.toArray; val y = b.codePoints.toArray
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val expect = (for {
      i <- strings.indices; j <- strings.indices
      if i < j && lev(strings(i), strings(j)) <= 1
    } yield (i.toLong, j.toLong)).toSet
    assert(got == expect,
      s"missed=${(expect -- got).toSeq.sorted} extra=${(got -- expect).toSeq.sorted}")
    assert(expect.nonEmpty, "vacuous fixture — no qualifying pair")
  }

  // codepoint-based DP, mirroring Spark/DuckDB levenshtein (shared by
  // the k=1 fixture test above and the k=2 / generative tests below)
  private def levRef(a: String, b: String): Int = {
    val x = a.codePoints.toArray; val y = b.codePoints.toArray
    val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to x.length; j <- 1 to y.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    d(x.length)(y.length)
  }

  test("2-deletion blocking is complete: ed<=2 pairs equal brute force " +
       "on adversarial geometries") {
    // the k=2 geometries k=1 never exercises: double substitutions
    // spread head/tail, adjacent TRANSPOSITION (ed=2 under plain
    // levenshtein — no Damerau shortcut), substitution+insertion mixes,
    // double insert/delete, a shared-prefix family where prefix
    // blocking collapses into one bucket, and decoys at exactly ed=3
    // that an over-eager candidate join would admit
    val strings = Seq(
      "abcdef",                       // base
      "xbcdyf", "xycdef", "abxdyf",   // double substitutions
      "bacdef", "abcdfe",             // adjacent transpositions (ed 2)
      "zabcdxf", "abcdefgh",          // insert+substitute, double insert
      "cdef", "abef",                 // double deletions (ends, middle)
      "abcdef",                       // exact duplicate
      "a", "", "ab",                  // short chain (ed<=2 links)
      "café", "cafes", "coffee", // accented neighborhood + decoy
      "😀😁ab", "ab",  // two emoji deletions
      "customer#001", "customer#010", "customer#100",  // shared prefix
      "xyzdef", "abczzz")             // decoys at ed=3 from base
    val sp = spark
    import sp.implicits._
    val names = strings.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = graft.operators.Dedup.editDistancePairs(names, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      i <- strings.indices; j <- strings.indices
      if i < j && levRef(strings(i), strings(j)) <= 2
    } yield (i.toLong, j.toLong)).toSet
    assert(got == expect,
      s"missed=${(expect -- got).toSeq.sorted} extra=${(got -- expect).toSeq.sorted}")
    // the fixture must actually exercise radius 2, not collapse to 1
    val onlyAt2 = (for {
      i <- strings.indices; j <- strings.indices
      if i < j && levRef(strings(i), strings(j)) == 2
    } yield (i, j))
    assert(onlyAt2.nonEmpty, "vacuous fixture — no pair at exactly ed=2")
  }

  test("collapse-exact-first neighbor profile equals the brute row-level " +
       "profile on duplicate-heavy corpora (the branch the all-distinct " +
       "oracle fixture cannot reach)") {
    // geometries: cliques of exact copies (sizes 1/2/5), fuzzy links
    // between cliques, the min1-row-needs-min2 case, a lone value with
    // no neighbors at all (must be absent from the profile), and ids
    // assigned so min ids do NOT follow value order
    val rows = Seq(
      (10L, "alpha"), (3L, "alpha"), (7L, "alpha"), (20L, "alpha"), (15L, "alpha"),
      (2L, "alphb"), (11L, "alphb"),          // ed 1 from alpha
      (30L, "alphax"),                        // ed 1 from alpha (insert)
      (5L, "zzzzz"),                          // lone, no neighbors
      (8L, "beta"), (9L, "beta"),             // clique with no fuzzy nbrs...
      (12L, "betax"))                         // ...except this (ed 1 from beta)
    val sp = spark
    import sp.implicits._
    def lev(a: String, b: String): Int = levRef(a, b)
    for (k <- Seq(1, 2)) {
      val got = graft.operators.Dedup.neighborProfile(rows.toDF("id", "s"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      val brute = rows.flatMap { case (id, s) =>
        val nbrs = rows.filter { case (id2, s2) => id2 != id && lev(s, s2) <= k }
        if (nbrs.isEmpty) Nil
        else List((id, nbrs.size.toLong, nbrs.map(_._1).min))
      }.sortBy(_._1)
      assert(got == brute, s"k=$k: got=$got want=$brute")
      // the fixture must exercise what it claims: a min1 row whose
      // min_neighbor is its value's min2, and an excluded lone value
      assert(!got.exists(_._1 == 5L), "lone value leaked into the profile")
      assert(brute.exists { case (id, _, mn) =>
        rows.find(_._1 == id).exists { case (_, s) =>
          id == rows.filter(_._2 == s).map(_._1).min &&
            rows.filter(_._2 == s).size > 1 && mn > id
        }
      }, "no min1-row-uses-min2 case in the fixture — vacuous")
    }
  }

  test("blocked ed<=k pairs equal brute force on random low-alphabet corpora " +
       "(generative, k=1 and k=2)") {
    // small alphabet + short strings force dense variant collisions —
    // the regime where an incomplete or over-admitting candidate join
    // actually diverges from brute force
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(1013)
    for (k <- Seq(1, 2); trial <- 0 until 3) {
      val strings = Vector.fill(40)(
        (0 until (1 + rng.nextInt(6))).map(_ => ('a' + rng.nextInt(3)).toChar)
          .mkString)
      val names = strings.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val got = graft.operators.Dedup.editDistancePairs(names, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        i <- strings.indices; j <- strings.indices
        if i < j && levRef(strings(i), strings(j)) <= k
      } yield (i.toLong, j.toLong)).toSet
      assert(got == expect,
        s"k=$k trial=$trial: missed=${(expect -- got).size} " +
          s"extra=${(got -- expect).size} over ${strings.distinct.size} strings")
      assert(expect.nonEmpty, s"k=$k trial=$trial: vacuous corpus")
      // the registered profile's collapse-exact-first arithmetic, on the
      // same corpus — random low-alphabet strings duplicate heavily, so
      // this also generatively exercises the copy-clique branches
      val gotProf = graft.operators.Dedup.neighborProfile(names, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      val bruteProf = strings.indices.flatMap { i =>
        val nbrs = strings.indices
          .filter(j => j != i && levRef(strings(i), strings(j)) <= k)
        if (nbrs.isEmpty) Nil
        else List((i.toLong, nbrs.size.toLong, nbrs.min.toLong))
      }.sortBy(_._1).toList
      assert(gotProf == bruteProf, s"k=$k trial=$trial: profile diverged")
    }
  }
}
