package graft

import graft.functions.LogSumExp
import org.apache.spark.sql.functions.{col, length, lit}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Generative properties (ScalaCheck, SURVEY §5.4) for the one genuinely
  * custom aggregate's algebra: [[LogSumExp.aggregator]]'s (zero, reduce,
  * merge, finish) must be a commutative-monoid fold for Spark to be free
  * to partial-aggregate and merge in ANY partitioning and order — the
  * property partition-independence of the whole registry rests on for
  * `ppr_topk_log` / `logsumexp_by_group`. Pure JVM: each trial folds
  * driver-side, so hundreds of generated cases cost milliseconds. */
class PropertiesSpec extends AnyFunSuite {

  /** Drive ScalaCheck directly (the scalatestplus bridge is not in the
    * offline cache): 200 generated cases per property, failure rendered
    * with the shrunk counterexample. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val agg = LogSumExp.aggregator

  /** Safe-range inputs: |x| ≤ 50 keeps naive log(Σ exp) overflow-free so
    * it can serve as the reference implementation. */
  private val xs: Gen[List[Double]] =
    Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50.0, 50.0)))

  private def fold(vals: Seq[Double]): Double =
    agg.finish(vals.foldLeft(agg.zero)(agg.reduce))

  private def close(a: Double, b: Double): Boolean =
    (a == b) || math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("logsumexp equals the naive log-sum-exp on safe ranges") {
    check(forAll(xs) { vals =>
      close(fold(vals), math.log(vals.map(math.exp).sum))
    })
  }

  test("logsumexp is fold-order invariant (any permutation, same result)") {
    check(forAll(xs, Gen.long) { (vals, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(vals)
      close(fold(vals), fold(shuffled))
    })
  }

  test("merge is commutative and agrees with a single sequential fold") {
    // Spark splits a group across partitions arbitrarily: reduce each
    // side then merge must equal the one-pass fold, both merge orders
    check(forAll(xs, xs) { (a, b) =>
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      val m1 = agg.finish(agg.merge(ba, bb))
      val m2 = agg.finish(agg.merge(bb, ba))
      Prop(close(m1, m2) && close(m1, fold(a ++ b)))
    })
  }

  test("merge is associative across a 3-way partition split") {
    check(forAll(xs, xs, xs) { (a, b, c) =>
      def buf(v: Seq[Double]) = v.foldLeft(agg.zero)(agg.reduce)
      val left = agg.finish(agg.merge(agg.merge(buf(a), buf(b)), buf(c)))
      val right = agg.finish(agg.merge(buf(a), agg.merge(buf(b), buf(c))))
      close(left, right)
    })
  }

  test("the empty buffer is a true identity and -inf inputs are absorbed") {
    check(forAll(xs) { vals =>
      val b = vals.foldLeft(agg.zero)(agg.reduce)
      val viaZero = agg.finish(agg.merge(agg.zero, agg.merge(b, agg.zero)))
      // -inf contributes exp(-inf) = 0: must not perturb the sum or NaN it
      val withNegInf = fold(Double.NegativeInfinity +: vals :+ Double.NegativeInfinity)
      Prop(close(viaZero, agg.finish(b)) && close(withNegInf, fold(vals)))
    })
  }

  test("empty and all--inf groups finish at -inf, never NaN") {
    assert(agg.finish(agg.zero) == Double.NegativeInfinity)
    assert(fold(Seq(Double.NegativeInfinity, Double.NegativeInfinity))
      == Double.NegativeInfinity)
  }

  /** The generator source's filter-prune fold (graft.sources): since
    * id-range conjuncts are CONSUMED by the scan (no post-scan
    * re-check), the interval must equal the brute-filtered id set for
    * ANY conjunct combination — this is the exactness the consumption
    * rests on. */
  test("SynthSource.prune equals brute conjunct evaluation on random filter sets") {
    import org.apache.spark.sql.sources._
    val rows = 200L
    val bound = Gen.chooseNum(-20L, 220L)
    val oneFilter: Gen[Filter] = for {
      v <- bound
      f <- Gen.oneOf[Long => Filter](
        GreaterThan("id", _), GreaterThanOrEqual("id", _),
        LessThan("id", _), LessThanOrEqual("id", _), EqualTo("id", _))
    } yield f(v)
    val filters: Gen[List[Filter]] = Gen.chooseNum(0, 5).flatMap(Gen.listOfN(_, oneFilter))
    def holds(id: Long, f: Filter): Boolean = f match {
      case GreaterThan("id", v: Long)        => id > v
      case GreaterThanOrEqual("id", v: Long) => id >= v
      case LessThan("id", v: Long)           => id < v
      case LessThanOrEqual("id", v: Long)    => id <= v
      case EqualTo("id", v: Long)            => id == v
      case other                             => fail(s"unexpected $other")
    }
    check(forAll(filters) { fs =>
      val (lo, hi) = graft.sources.SynthSource.prune(0L, rows, fs)
      val interval = (math.max(0L, lo) until math.min(rows, math.max(lo, hi))).toSet
      val brute = (0L until rows).filter(id => fs.forall(holds(id, _))).toSet
      Prop(interval == brute)
    })
  }

  // ---- graph-family laws (Spark-backed: each trial runs real jobs, so
  // trial counts are sized for coverage-per-second, not the pure-JVM 200) ----

  private lazy val spark = TestSession.spark

  private def checkN(n: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** Random multigraph-ish edge lists on ≤200 nodes: duplicates, self
    * loops, both orientations — everything a dedup pair graph can emit. */
  private val ccEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 200)
    m <- Gen.chooseNum(1, 2 * n)
    es <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0L, (n - 1).toLong)
      b <- Gen.chooseNum(0L, (n - 1).toLong)
    } yield (a, b))
  } yield es

  test("minhash estimator signatures equal a driver-side MessageDigest recompute " +
      "on random corpora") {
    // the semantic gate behind minhash_jaccard_err's ParityWithLaw
    // classification: the whole signature pipeline (md5-60 base hash,
    // Mersenne-mod reduction, the seeded universal-hash permutation
    // family, per-permutation min) recomputed independently with
    // java.security.MessageDigest + BigInteger — no Spark expressions,
    // no shared code path
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    val D = graft.operators.Dedup
    def md5h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % D.mhMod
    }
    val shingleGen = Gen.listOfN(30, for {
      doc <- Gen.choose(0L, 5L)
      sh <- Gen.oneOf("alpha beta", "beta gamma", "γ δ ε", "x y z",
        "", "single", "alpha beta") // duplicates + unicode + empty
    } yield (doc, sh))
    checkN(10)(forAll(shingleGen) { rows =>
      val distinctRows = rows.distinct // set semantics like the shingle table
      val got = D.minhashEstSignatures(distinctRows.toDF("doc_id", "sh"))
        .collect().map(r => r.getLong(0) ->
          (0 until D.minhashK).map(i => r.getLong(1 + i))).toMap
      val want = distinctRows.groupBy(_._1).map { case (doc, shs) =>
        val hs = shs.map(t => md5h(t._2))
        doc -> (0 until D.minhashK).map(i =>
          hs.map(h => (D.mhA(i) * h + D.mhB(i)) % D.mhMod).min)
      }
      got == want
    })
  }

  test("connectedComponents equals a driver-side union-find on random graphs") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    checkN(12)(forAll(ccEdges) { es =>
      val labels = graft.operators.Dedup.connectedComponents(es.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: union-find with path compression; component label is
      // the min node id (hash-to-min's fixed point by construction)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val minOf = nodes.groupBy(find).map { case (root, ns) => root -> ns.min }
      val expected = nodes.map(x => x -> minOf(find(x))).toMap
      Prop(labels == expected) :| s"nodes=${nodes.size} edges=${es.size}"
    })
  }

  /** Random shingle-set corpora engineered toward the J = 0.8 threshold:
    * docs draw from a small shared pool so overlaps (including exact
    * boundary ratios like 4/5) actually occur. */
  private val shingleCorpus: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(3, 25)
    pool <- Gen.chooseNum(6, 20)
    rows <- Gen.sequence[List[List[(Long, String)]], List[(Long, String)]](
      (0 until nDocs).toList.map { d =>
        for {
          base <- Gen.chooseNum(1, pool - 1)
          // near-dup pressure: half the docs copy a sliding window of the
          // pool, so set containments and high overlaps are common
          start <- Gen.chooseNum(0, pool - base)
        } yield (start until (start + base)).toList.map(i => (d.toLong, s"g$i"))
      })
  } yield rows.flatten

  test("prefix-filtered Jaccard join equals a driver-side all-pairs reference " +
      "on random corpora (completeness law for the prefix principle)") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    checkN(10)(forAll(shingleCorpus) { rows =>
      val byDoc = rows.distinct.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }
      val expected = (for {
        (a, sa) <- byDoc; (b, sb) <- byDoc if a < b
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= graft.operators.Dedup.jaccardThreshold
      } yield (a, b, j)).toSet
      val got = graft.operators.Dedup.prefixJaccardPairs(
        graft.operators.Dedup.cappedShingles(
          rows.toDF("doc_id", "sh"), "m_pfx_law"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      Prop(got == expected) :| s"docs=${byDoc.size} expected=${expected.size} got=${got.size}"
    })
  }

  test("bloom bitset build+probe never false-negatives on random strings " +
      "(tiny filter: boundary bits and dense-fill included)") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions.{col, explode, array, broadcast, udaf}
    import graft.functions.BloomFilter
    val sp: SparkSession = spark
    import sp.implicits._
    val nBits = 256L // tiny on purpose: dense fill, word boundaries hit
    val k = 5
    val gen = Gen.listOfN(30, Gen.identifier.map(_.take(10)))
    checkN(8)(forAll(gen) { raw =>
      val inserted = raw.filter(_.nonEmpty).distinct
      (inserted.nonEmpty: Prop) ==> {
        val ins = inserted.toDF("sh")
        val agg = udaf(new BloomFilter.BitsetAgg(nBits.toInt))
        val bloom = ins
          .select(explode(array((0 until k).map(i =>
            BloomFilter.position(col("sh"), i, nBits)): _*)).as("pos"))
          .agg(agg(col("pos")).as("bloom"))
        val probes = (inserted ++ inserted.map(_ + "_absent")).distinct.toDF("sh")
        val hits = probes.crossJoin(broadcast(bloom))
          .filter(BloomFilter.mightContain(col("bloom"), col("sh"), k, nBits))
          .collect().map(_.getString(0)).toSet
        Prop(inserted.forall(hits)) :|
          s"missing=${inserted.filterNot(hits)} (false negative!)"
      }
    })
  }

  /** Reference BPE: greedy over a (word, count) map — max pair by
    * (count desc, pair asc), leftmost non-overlapping merge. Returns the
    * merge log AND each word's final segmentation (the encode side). */
  private def refBpe(words: Map[String, Long], k: Int)
      : (Seq[(String, Long)], Map[String, Seq[String]]) = {
    var forms: Seq[(String, Seq[String], Long)] =
      words.map { case (w, c) => (w, w.map(_.toString) :+ "_", c) }.toSeq
    val out = Seq.newBuilder[(String, Long)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      forms.foreach { case (_, syms, c) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x + " " + y) }
        out += ((a + " " + b, c))
        forms = forms.map { case (w, syms, cnt) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += syms(i); i += 1 }
          }
          (w, merged.toSeq, cnt)
        }
      }
    }
    (out.result(), forms.map { case (w, syms, _) => w -> syms }.toMap)
  }

  test("distributed BPE merge learning equals a driver-side reference " +
       "on random corpora (ties, repeats, single chars)") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    val corpus: Gen[List[String]] = for {
      n <- Gen.chooseNum(1, 30)
      ws <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')) // tiny alphabet forces ties
      } yield cs.mkString)
    } yield ws
    checkN(10)(forAll(corpus) { ws0 =>
      // ScalaCheck's shrinker does not respect the generator's alphabet
      // (it shrinks Chars numerically, below 'a'); normalize to what the
      // pipeline's tokenizer would keep so both sides see one corpus
      val ws = ws0.map(_.filter(c => c >= 'a' && c <= 'z')).filter(_.nonEmpty)
      // drive the REGISTERED pipeline end-to-end: write the corpus as a
      // documents-shaped parquet table and learn merges from it
      val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
      ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("gen").as("source"), length(col("text")).cast("long").as("n_chars"))
        .write.parquet(dir + "/documents.parquet")
      val got =
        if (ws.isEmpty) Seq.empty
        else graft.operators.Bpe.bpeMerges(spark, dir)
          .collect().map(r => (r.getString(1), r.getLong(3))).toSeq
      val expected = refBpe(
        ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong },
        graft.operators.Bpe.merges)._1
      Prop(got == expected) :| s"corpus=$ws\ngot=$got\nexp=$expected"
    })
  }

  /** Reference WordPiece: the same greedy loop with the quantized
    * association key floor(c·10¹²/(uₐ·u_b)) — the independent mirror of
    * pickByRatio's arithmetic (same IEEE multiply/divide/floor). */
  private def refWordpiece(words: Map[String, Long], k: Int)
      : Seq[(String, Long, Long)] = {
    var forms: Seq[(Seq[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString) :+ "_", c) }.toSeq
    val out = Seq.newBuilder[(String, Long, Long)]
    var exhausted = false
    for (_ <- 1 to k if !exhausted) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val uc = scala.collection.mutable.Map.empty[String, Long]
      forms.foreach { case (syms, c) =>
        syms.foreach(s => uc(s) = uc.getOrElse(s, 0L) + c)
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      if (pc.isEmpty) exhausted = true
      else {
        def key(p: (String, String), c: Long): Long =
          math.floor(c.toDouble * 1000000000000L / (uc(p._1) * uc(p._2))).toLong
        val ((a, b), c) = pc.minBy { case (p, n) => (-key(p, n), p._1 + " " + p._2) }
        out += ((a + " " + b, c, key((a, b), c)))
        forms = forms.map { case (syms, cnt) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toSeq, cnt)
        }
      }
    }
    out.result()
  }

  test("distributed WordPiece merge learning equals a driver-side reference " +
       "on random corpora (the association-ratio argmax, quantized key included)") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    val corpus: Gen[List[String]] = for {
      n <- Gen.chooseNum(1, 30)
      ws <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield ws
    checkN(8)(forAll(corpus) { ws0 =>
      val ws = ws0.map(_.filter(c => c >= 'a' && c <= 'z')).filter(_.nonEmpty)
      val dir = java.nio.file.Files.createTempDirectory("graft-wp").toString
      ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("gen").as("source"), length(col("text")).cast("long").as("n_chars"))
        .write.parquet(dir + "/documents.parquet")
      val got =
        if (ws.isEmpty) Seq.empty
        else graft.operators.Bpe.wordpieceMerges(spark, dir)
          .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(4))).toSeq
      val expected = refWordpiece(
        ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong },
        graft.operators.Bpe.merges)
      Prop(got == expected) :| s"corpus=$ws\ngot=$got\nexp=$expected"
    })
  }

  test("bpe_encode per-doc subword counts equal the driver reference's " +
       "final segmentation (the encode leg of the BPE law)") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    // multi-word docs so the dictionary join + grouped aggregation is
    // load-bearing, not just the per-word segmentation
    val corpus: Gen[List[String]] = for {
      n <- Gen.chooseNum(1, 24)
      ws <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield ws
    checkN(6)(forAll(corpus) { ws0 =>
      val ws = ws0.map(_.filter(c => c >= 'a' && c <= 'z')).filter(_.nonEmpty)
      if (ws.isEmpty) Prop(true)
      else {
        val docs = ws.grouped(3).map(_.mkString(" ")).toSeq
        val dir = java.nio.file.Files.createTempDirectory("graft-bpe-enc").toString
        docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
          .select(col("doc_id"), col("text"), lit("en").as("lang"),
            lit("gen").as("source"), length(col("text")).cast("long").as("n_chars"))
          .write.parquet(dir + "/documents.parquet")
        val got = graft.operators.Bpe.bpeEncode(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        val segs = refBpe(
          ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong },
          graft.operators.Bpe.merges)._2
        val expected = docs.zipWithIndex.map { case (t, i) =>
          val toks = t.split(" ").toSeq
          (i.toLong, toks.size.toLong, toks.map(segs(_).size.toLong).sum)
        }
        Prop(got == expected) :| s"docs=$docs\ngot=$got\nexp=$expected"
      }
    })
  }

  /** ≤30-node simple graphs, with a 1-in-5 weight on complete graphs —
    * every degree tied, the orientation's (deg, id) tiebreak fully
    * load-bearing. */
  private val triEdges: Gen[List[(Long, Long)]] = Gen.frequency(
    4 -> (for {
      n <- Gen.chooseNum(3, 30)
      m <- Gen.chooseNum(1, 90)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1)
        b <- Gen.chooseNum(0, n - 1)
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield es.filter(e => e._1 != e._2).distinct),
    1 -> Gen.chooseNum(3, 8).map(k =>
      (for { i <- 0 until k; j <- (i + 1) until k }
        yield (i.toLong, j.toLong)).toList))

  test("triangleStats equals brute-force enumeration, degree-tied cases included") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    checkN(20)(forAll(triEdges) { es =>
      if (es.isEmpty) Prop(true)
      else {
        val r = graft.operators.PageRank
          .triangleStats(spark, es.toDF("u", "v")).collect()(0)
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        val adj = es.toSet
        def conn(a: Long, b: Long) = adj((math.min(a, b), math.max(a, b)))
        val ns = nodes.sorted
        var tri = 0L
        for {
          i <- ns.indices; j <- (i + 1) until ns.length
          if conn(ns(i), ns(j))
          k <- (j + 1) until ns.length
          if conn(ns(j), ns(k)) && conn(ns(i), ns(k))
        } tri += 1
        // wedge count under the documented compact-forward orientation:
        // orient to the (deg, id)-larger endpoint, then Σ C(outdeg, 2)
        val deg = nodes.map(x =>
          x -> es.count(e => e._1 == x || e._2 == x).toLong).toMap
        def lt(a: Long, b: Long) =
          deg(a) < deg(b) || (deg(a) == deg(b) && a < b)
        val out = nodes.map(x => x -> es.count { case (u, v) =>
          (lt(u, v) && u == x) || (lt(v, u) && v == x) }.toLong).toMap
        val wedges = nodes.map { x => val d = out(x); d * (d - 1) / 2 }.sum
        Prop(r.getLong(0) == nodes.length.toLong &&
             r.getLong(1) == es.length.toLong &&
             r.getLong(2) == wedges && r.getLong(3) == tri) :|
          s"n=${nodes.size} m=${es.size} expTri=$tri got=${r.toSeq}"
      }
    })
  }

  test("Lloyd trainer equals an independent reference and obeys its " +
       "algebraic laws (translation equivariance, tail-order invariance, " +
       "1-cell exact floor-mean)") {
    // The IVF/PQ keyed-Lloyd ORACLE replays the trainer's own encoding
    // (parity, by design); these laws are the independent semantic gate
    // the BPE lesson demands. Reference: textbook Lloyd's written in a
    // deliberately different style (groupBy/minBy over indexed
    // centroids, BigInt sums) with the same declared contract — seeds =
    // first `cells` vectors, argmin ties to the lowest index, centroid
    // update = element-wise floorDiv, empty cells keep their centroid.
    def refLloyd(sample: List[List[Long]], cells: Int, iters: Int): List[List[Long]] = {
      def d2(a: List[Long], b: List[Long]): BigInt =
        a.zip(b).map { case (x, y) => BigInt(x - y) * BigInt(x - y) }.sum
      var cents = sample.take(cells)
      for (_ <- 1 to iters) {
        val byCell = sample.groupBy(v => cents.indices.minBy(i => (d2(v, cents(i)), i)))
        cents = cents.indices.map { i =>
          byCell.get(i) match {
            case None => cents(i)
            case Some(vs) =>
              cents(i).indices.map { j =>
                val s = vs.map(v => BigInt(v(j))).sum
                // floorDiv over BigInt: round the true quotient toward -inf
                val (q, r) = s /% vs.size
                (if (r < 0) q - 1 else q).toLong
              }.toList
          }
        }.toList
      }
      cents
    }
    val dimG = Gen.chooseNum(1, 6)
    val samples: Gen[(List[List[Long]], Int, Int)] = for {
      dim <- dimG
      cells <- Gen.chooseNum(1, 4)
      n <- Gen.chooseNum(cells, 40)
      s <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-1000L, 1000L)))
      iters <- Gen.chooseNum(1, 4)
    } yield (s, cells, iters)
    def run(s: List[List[Long]], cells: Int, iters: Int): Seq[Seq[Long]] =
      graft.operators.Similarity
        .trainQuantizer(s.map(_.toArray).toArray, cells, iters).map(_.toSeq).toSeq
    check(forAll(samples) { case (s, cells, iters) =>
      val got = run(s, cells, iters)
      val ref = refLloyd(s, cells, iters).map(_.toSeq)
      val refProp = Prop(got == ref) :| s"ref mismatch: got=$got ref=$ref"
      // translation equivariance: train(S + t) == train(S) + t — floor
      // division commutes with integer translation, argmin with L2
      val t = (s.hashCode % 97).toLong
      val shifted = run(s.map(_.map(_ + t)), cells, iters)
      val transProp = Prop(shifted == got.map(_.map(_ + t))) :| "translation"
      // tail-order invariance: seeds fixed, the REST of the sample in
      // reverse order — integer sums/counts are order-free, which is
      // exactly what makes the trainer replayable as set-aggregations
      val perm = s.take(cells) ++ s.drop(cells).reverse
      val permProp = Prop(run(perm, cells, iters) == got) :| "tail order"
      // 1-cell exact floor-mean
      val oneProp = {
        val one = run(s, 1, 1).head
        val exp = s.head.indices.map { j =>
          Math.floorDiv(s.map(_(j)).sum, s.size.toLong) }
        Prop(one == exp) :| "1-cell mean"
      }
      refProp && transProp && permProp && oneProp
    })
  }

  // ---- codepoint-kernel equivalence (round 12 continuation) ----------
  // The NormalizeKernels/PairStrings kernels replaced regex chains and a
  // self-join on the HOT corpus path; the DuckDB oracles prove value
  // equality on corpus data, these properties prove it over the input
  // SPACE — mixed-case ASCII, every whitespace class the regexes name,
  // punctuation, accented/combining-producing letters (İ lowers to
  // "i" + combining dot), and non-BMP surrogate pairs (both alnum-free
  // and math-alphabet letters), the cases a fixture corpus never hits.

  private val charGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaLowerChar.map(_.toString),
    2 -> Gen.alphaUpperChar.map(_.toString),
    2 -> Gen.numChar.map(_.toString),
    3 -> Gen.oneOf(" ", "\t", "\n", "\r", "\f"),
    3 -> Gen.oneOf(".", ",", "!", "-", "_", "@", "#", "'"),
    2 -> Gen.oneOf("\u00e9", "\u00dc", "\u4e2d", "\u00df", "\u0130",
      new String(Character.toChars(0x1F600)), new String(Character.toChars(0x1D49C))))
  private val textGen: Gen[String] = Gen.listOf(charGen).map(_.mkString)

  /** Mirror of the exact call-site input: Spark's `lower` is
    * UTF8String.toLowerCase, not java.lang.String.toLowerCase. */
  private def sparkLower(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s).toLowerCase.toString

  test("join_alnum_runs == trim(replace(replace(...))) regex chain, generatively") {
    check(forAll(textGen) { raw =>
      val lowered = sparkLower(raw)
      val a = lowered.replaceAll("[^a-z0-9 \t\n\r\f]", " ")
      val b = a.replaceAll("[ \t\n\r\f]+", " ")
      val expect = b.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val got = graft.functions.NormalizeKernels.joinAlnumRuns(
        org.apache.spark.unsafe.types.UTF8String.fromString(lowered)).toString
      Prop(got == expect) :| s"raw=${raw.take(40)} got=$got expect=$expect"
    })
  }

  test("count_non_alnum_space == length(regexp_replace(., '[a-z0-9 ]', '')), generatively") {
    check(forAll(textGen) { raw =>
      val lowered = sparkLower(raw)
      val removed = lowered.replaceAll("[a-z0-9 ]", "")
      val expect = removed.codePointCount(0, removed.length).toLong
      val got = graft.functions.NormalizeKernels.countNonAlnumSpace(
        org.apache.spark.unsafe.types.UTF8String.fromString(lowered))
      Prop(got == expect) :| s"raw=${raw.take(40)} got=$got expect=$expect"
    })
  }

  test("count_bpeish_tokens == regexp_count of the BPE pre-tokenizer pattern, generatively") {
    check(forAll(textGen) { raw =>
      val lowered = sparkLower(raw)
      val m = java.util.regex.Pattern
        .compile("[a-z]+|[0-9]+|[^a-z0-9 ]").matcher(lowered)
      var expect = 0L
      while (m.find()) expect += 1
      val got = graft.functions.NormalizeKernels.countBpeishTokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(lowered))
      Prop(got == expect) :| s"raw=${raw.take(40)} got=$got expect=$expect"
    })
  }

  test("deletion_variants_up_to: k=1 equals the r12 kernel's distinct set " +
       "in order; reference brute neighborhoods at k=2, generatively") {
    import org.apache.spark.unsafe.types.UTF8String
    def arr(g: org.apache.spark.sql.catalyst.util.GenericArrayData): Seq[String] =
      (0 until g.numElements()).map(g.getUTF8String(_).toString)
    // driver-side reference: distinct ≤k-deletion strings, BFS order
    def ref(s: String, k: Int): Seq[String] = {
      val seen = scala.collection.mutable.LinkedHashSet(s)
      var frontier = Seq(s)
      for (_ <- 0 until k) {
        frontier = frontier.flatMap { t =>
          val cps = t.codePoints.toArray
          cps.indices.map(i =>
            new String((cps.take(i) ++ cps.drop(i + 1)).flatMap(Character.toChars)))
        }.filter(seen.add)
      }
      seen.toSeq
    }
    check(forAll(textGen, Gen.choose(0, 3)) { (raw, k) =>
      val u = UTF8String.fromString(raw)
      val got = arr(graft.functions.NormalizeKernels.deletionVariantsUpTo(u, k))
      val expect = ref(raw, k)
      // and at k=1: exactly the proven r12 kernel, first-occurrence order
      val old = arr(graft.functions.NormalizeKernels.deletionVariants(u)).distinct
      val oldProp = Prop(
        arr(graft.functions.NormalizeKernels.deletionVariantsUpTo(u, 1)) == old)
      (Prop(got == expect) :| s"raw=${raw.take(30)} k=$k") && oldProp
    })
  }

  test("deletion_variants_pos: values equal the r12 kernel's order and " +
       "positions index the deleted codepoint, generatively") {
    import org.apache.spark.unsafe.types.UTF8String
    check(forAll(textGen) { raw =>
      val u = UTF8String.fromString(raw)
      val got = graft.functions.NormalizeKernels.deletionVariantsPos(u)
      val vals = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getInt(1))
      }
      val old = graft.functions.NormalizeKernels.deletionVariants(u)
      val oldVals = (0 until old.numElements()).map(old.getUTF8String(_).toString)
      val cps = raw.codePoints.toArray
      val posOk = vals.head._2 == -1 && vals.tail.zipWithIndex.forall {
        case ((v, p), i) =>
          p == i && v == new String(
            (cps.take(i) ++ cps.drop(i + 1)).flatMap(Character.toChars))
      }
      Prop(vals.map(_._1) == oldVals && posOk) :| s"raw=${raw.take(30)}"
    })
  }

  test("deletion_variants_pos2: every codepoint pair i < j once, values " +
       "equal the brute double deletion in original coordinates, generatively") {
    import org.apache.spark.unsafe.types.UTF8String
    check(forAll(textGen) { raw =>
      val u = UTF8String.fromString(raw)
      val got = graft.functions.NormalizeKernels.deletionVariantsPos2(u)
      val vals = (0 until got.numElements()).map { n =>
        val r = got.getStruct(n, 3)
        (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2))
      }
      val cps = raw.codePoints.toArray
      val expect = for {
        i <- cps.indices; j <- cps.indices if i < j
      } yield (new String(cps.indices.filter(m => m != i && m != j)
          .flatMap(m => Character.toChars(cps(m))).toArray), i, j)
      Prop(vals == expect) :|
        s"raw=${raw.take(30)} got=${vals.take(3)} expect=${expect.take(3)}"
    })
  }

  test("count_literals == summed per-needle regexp_count, generatively") {
    import org.apache.spark.unsafe.types.UTF8String
    // needle pool includes self-overlap-prone shapes ("aa" in "aaa",
    // "ata" in "atata") where non-overlapping resume-after semantics
    // differ from advance-by-one — the exact contract regexp_count has
    val pool = Seq("the", "ing", "ata", "aa", "ab", "ion")
    val needleSet: Gen[Seq[String]] =
      Gen.choose(1, pool.size).flatMap(n => Gen.pick(n, pool)).map(_.toSeq)
    check(forAll(textGen, needleSet) { (raw, needles) =>
      val lowered = sparkLower(raw)
      val expect = needles.map { nd =>
        val m = java.util.regex.Pattern.compile(
          java.util.regex.Pattern.quote(nd)).matcher(lowered)
        var c = 0L
        while (m.find()) c += 1
        c
      }.sum
      val got = graft.functions.CountLiterals.compute(
        UTF8String.fromString(lowered),
        needles.map(_.getBytes("US-ASCII")).toArray)
      Prop(got == expect) :| s"raw=${raw.take(30)} needles=$needles got=$got expect=$expect"
    })
  }

  test("md5_int kernel == conv(substring(md5(s),1,n),16,10) reference, generatively") {
    import org.apache.spark.unsafe.types.UTF8String
    check(forAll(textGen, Gen.choose(1, 15)) { (raw, n) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expect = java.lang.Long.parseLong(hex.take(n), 16)
      val got = graft.functions.Md5Int.compute(UTF8String.fromString(raw), n)
      Prop(got == expect) :| s"raw=${raw.take(30)} n=$n got=$got expect=$expect"
    })
  }

  test("distinct_runs on a sorted array == the distinct count, generatively") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // duplicates forced by a small value pool; "" and non-ASCII included.
    // Any total order groups equal values adjacently, so Scala's string
    // sort stands in for array_sort — run counting only needs adjacency
    // of equals, not a specific collation.
    val strs = Gen.listOf(Gen.oneOf("a", "b", "ab", "aa", "x", "yz", "γδ", ""))
    check(forAll(strs) { xs =>
      val arr = new GenericArrayData(
        xs.sorted.map(UTF8String.fromString).toArray[Any])
      val got = graft.functions.DistinctRuns.compute(arr)
      val expect = xs.distinct.size.toLong
      Prop(got == expect) :| s"xs=$xs got=$got expect=$expect"
    })
  }

  test("simhash60 == the hex-string md5Int + per-bit sign-sum reference, generatively") {
    import org.apache.spark.unsafe.types.UTF8String
    // independent reference: per token, parse the leading 15 hex chars
    // of the md5 HEX STRING (the exact arithmetic the DuckDB oracle and
    // the pre-r14 conv(substring(md5(w),1,15),16,10) chain used), then
    // sum ±1 per bit and take the sign — no shared code with the kernel
    def ref(toks: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val counts = new Array[Int](60)
      toks.foreach { t =>
        val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.take(15), 16)
        (0 until 60).foreach { b =>
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        }
      }
      (0 until 60).foldLeft(0L)((fp, b) =>
        if (counts(b) > 0) fp | (1L << b) else fp)
    }
    val tokGen = Gen.frequency(
      8 -> Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)),
      1 -> Gen.oneOf("été", "中文",
        new String(Character.toChars(0x1F600))),
      1 -> Gen.const(""))
    check(forAll(Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, tokGen))) { toks =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val got = graft.functions.Simhash60.compute(arr)
      val expect = ref(toks)
      Prop(got == expect) :| s"n=${toks.size} got=$got expect=$expect"
    })
  }

  test("pair_strings == the ordered-pair double loop, generatively") {
    import org.apache.spark.unsafe.types.UTF8String
    val tokGen = Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString)
    check(forAll(Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokGen))) { toks =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val out = graft.functions.PairStrings.compute(arr)
      val got = (0 until out.numElements()).map(out.getUTF8String(_).toString)
      val expect =
        for { i <- toks.indices; j <- toks.indices if i != j }
          yield s"${toks(i)} ${toks(j)}"
      Prop(got == expect) :| s"n=${toks.size}"
    })
  }
}
