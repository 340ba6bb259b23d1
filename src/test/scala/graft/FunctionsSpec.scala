package graft

import graft.functions.LogSumExp
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class FunctionsSpec extends GraftSpec {
  import spark.implicits._

  test("logsumexp matches the naive formula on safe ranges") {
    val xs = Seq(0.1, 0.5, 1.0, -2.0, 3.3, 0.0)
    val got = xs.toDF("x").agg(LogSumExp.logsumexp(col("x"))).collect()(0).getDouble(0)
    val want = math.log(xs.map(math.exp).sum)
    assert(math.abs(got - want) < 1e-12)
  }

  test("logsumexp survives magnitudes that underflow naive exp") {
    val xs = Seq(-1000.0, -1000.5, -999.5)
    val got = xs.toDF("x").agg(LogSumExp.logsumexp(col("x"))).collect()(0).getDouble(0)
    // factor out the max: -999.5 + ln(1 + e^-0.5 + e^-1)
    val want = -999.5 + math.log(1 + math.exp(-0.5) + math.exp(-1.0))
    assert(math.abs(got - want) < 1e-12)
    assert(!got.isInfinite)
  }

  test("logsumexp tolerates -Inf inputs in any position (log(0) probability rows)") {
    val agg = LogSumExp.aggregator
    val inf = Double.NegativeInfinity
    // -Inf FIRST into an empty buffer used to poison the group with NaN:
    // reduce hit exp(-Inf - -Inf) = NaN before the guards existed.
    val streams = Seq(
      List(inf, 0.0, 1.0), List(0.0, inf, 1.0), List(0.0, 1.0, inf),
      List(inf, inf, -2.0), List(inf), List(inf, inf))
    streams.foreach { xs =>
      val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val finite = xs.filter(_ != inf)
      val want = if (finite.isEmpty) inf else math.log(finite.map(math.exp).sum)
      assert(!got.isNaN, s"NaN for $xs")
      assert(got == want || math.abs(got - want) < 1e-12, s"$got != $want for $xs")
    }
    // and through a real grouped plan with the -Inf seed row leading the
    // partition stream (ascending sort puts -Inf first — the PPR seed shape)
    val rows = Seq(("a", inf), ("a", 0.0), ("b", inf)).toDF("k", "x")
      .repartition(1).sortWithinPartitions("x")
      .groupBy("k").agg(LogSumExp.logsumexp(col("x")).as("lse"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows("a") - 0.0) < 1e-12)
    assert(rows("b") == inf)
  }

  test("logsumexp buffer merge is split-point-insensitive (property sweep)") {
    val agg = LogSumExp.aggregator
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val xs = List.fill(1 + rng.nextInt(30))(rng.nextDouble() * 100 - 50)
      val whole = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val split = rng.nextInt(xs.length)
      val (l, r) = xs.splitAt(split)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)))
      assert(math.abs(whole - merged) < 1e-9, s"split $split of $xs")
    }
  }

  test("declarative logsumexp matches the typed Aggregator and stays in HashAggregate") {
    val rng = new scala.util.Random(23)
    val rows = (1 to 500).map(i => ((i % 23).toString, rng.nextDouble() * 2000 - 1000)) ++
      (0 until 23).map(i => (i.toString, Double.NegativeInfinity))
    val df = rows.toDF("k", "x").cache()
    df.count()
    def resOf(c: org.apache.spark.sql.Column): (Map[String, Double], org.apache.spark.sql.DataFrame) = {
      val out = df.groupBy("k").agg(c.as("lse"))
      (out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap, out)
    }
    val (native, nativeDf) = resOf(LogSumExp.logsumexp(col("x")))
    val (viaUdaf, _) = resOf(LogSumExp.logsumexpUdaf(col("x")))
    assert(native.keySet == viaUdaf.keySet)
    native.foreach { case (k, v) =>
      // identical per-row arithmetic; tolerance only covers cross-partition
      // merge-order nondeterminism in the shuffle fetch
      assert(v == viaUdaf(k) || math.abs(v - viaUdaf(k)) < 1e-9,
        s"key $k: native $v vs udaf ${viaUdaf(k)}")
    }
    // the point of the declarative form: primitive-buffer hash aggregation
    // (codegen), not the UDAF's object aggregation
    val nodes = physicalNodes(nativeDf).map(_.nodeName)
    assert(nodes.exists(_.contains("HashAggregate")) &&
      !nodes.exists(_.contains("ObjectHashAggregate")), nodes.mkString(", "))
    df.unpersist()
  }

  test("native cosine_similarity expression matches driver-side math (codegen path)") {
    import graft.functions.CosineSimilarity.cosine_similarity
    val rows = Seq(
      (Seq(1.0, 0.0, 2.0), Seq(0.5, 1.0, -1.0)),
      (Seq(1.0, 1.0), Seq(1.0, 1.0)),
      (Seq(0.0, 0.0), Seq(1.0, 2.0)), // zero norm → 0.0
      (Seq(1.0), Seq(1.0, 2.0)))      // length mismatch → 0.0
      .toDF("a", "b")
      // through a real plan (projection inside whole-stage codegen)
      .select(cosine_similarity(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    def ref(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(math.abs(rows(0) - ref(Seq(1.0, 0.0, 2.0), Seq(0.5, 1.0, -1.0))) < 1e-15)
    assert(math.abs(rows(1) - 1.0) < 1e-15)
    assert(rows(2) == 0.0)
    assert(rows(3) == 0.0)
  }

  test("gopher kernels equal the HOF forms on Unicode and boundary edges") {
    import graft.functions.GopherKernels
    // the exact value-compatibility contract the kernels' scaladoc claims:
    // each kernel vs the higher-order-function expression it replaced,
    // on inputs chosen to hit the seams — Kelvin sign K (U+212A) lowers
    // to ASCII k under Unicode rules, the bullet is a 3-byte UTF-8
    // sequence, trims are space-only (tabs must NOT trim), and empty
    // strings/arrays sit at every boundary
    val words = Seq(
      Seq("THE", "123", "K", "...", "", "café", "-x"),
      Seq(), Seq(""), Seq("***"), Seq("ABC", "abc", "A1", "1A"))
    val lines = Seq(
      Seq("  - bullet", "	- tab-led", "* star", "• dot", "plain", ""),
      Seq("ends...", "ends...  ", "ends...	", "...", "  "),
      Seq())
    val wdf = words.toDF("w")
    val ldf = lines.toDF("ls")
    def col1[T](df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.collect().toSeq.map(_.get(0))
    assert(col1(wdf.select(GopherKernels.count_nonempty(col("w")))) ==
      col1(wdf.select(size(filter(col("w"), x => length(x) > lit(0))).cast("long"))))
    assert(col1(wdf.select(GopherKernels.count_alpha(col("w")))) ==
      col1(wdf.select(size(filter(col("w"), x =>
        regexp_count(lower(x), lit("[a-z]")) > 0)).cast("long"))))
    assert(col1(wdf.select(GopherKernels.count_in_lower(col("w"),
        graft.operators.TextQuality.gopherStops))) ==
      col1(wdf.select(graft.functions.CountIn.count_in(
        transform(col("w"), x => lower(x)),
        graft.operators.TextQuality.gopherStops).cast("long"))))
    assert(col1(ldf.select(GopherKernels.count_bullet_lines(col("ls")))) ==
      col1(ldf.select(size(filter(col("ls"), l =>
        substring(ltrim(l), 1, 1).isin("-", "*", "•"))).cast("long"))))
    assert(col1(ldf.select(GopherKernels.count_ellipsis_lines(col("ls")))) ==
      col1(ldf.select(size(filter(col("ls"), l =>
        rtrim(l).endsWith("..."))).cast("long"))))
  }

  test("z_value Morton interleave: bijective on the grid, bit-exact vs a naive loop") {
    import graft.functions.ZOrder
    def naive(a: Long, b: Long): Long = {
      var r = 0L
      for (i <- 0 until 16)
        r |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      r
    }
    val rng = new scala.util.Random(11)
    val pts = Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L),
      (1L, 2L), (32768L, 32767L)) ++
      Seq.fill(500)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    pts.foreach { case (a, b) =>
      assert(ZOrder.morton(a, b) == naive(a, b), s"($a,$b)")
    }
    // bijectivity on a subgrid: distinct inputs -> distinct codes
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield ZOrder.morton(a, b)
    assert(grid.distinct.size == grid.size)
    // out-of-grid inputs clamp rather than corrupt neighboring bits
    assert(ZOrder.morton(-5L, 70000L) == ZOrder.morton(0L, 65535L))
    // the codegen'd Column path agrees with the direct call
    val df = pts.toDF("a", "b")
      .select(ZOrder.z_value(col("a"), col("b")).as("z")).collect().map(_.getLong(0))
    assert(df.toSeq == pts.map { case (a, b) => ZOrder.morton(a, b) })
  }

  test("C4 kernels equal the HOF forms on boundary edges") {
    import graft.functions.C4Kernels
    // kernel-vs-HOF value compatibility on the seams: space-only rtrim
    // (a tab after the period must NOT trim), the end-quote terminal,
    // the 3-word floor (2 words rejected, 3 accepted), mixed-case
    // "JavaScript" containment, multi-byte UTF-8 words, empty
    // lines/arrays, and multiple terminals per kept line
    val lines = Seq(
      Seq("one two three.", "one two.", "a b c?", "x y z!", "q w \"e\""),
      Seq("ends here.  ", "ends here.\t", "Uses JavaScript today.", ""),
      Seq("café süß weiß.", "Dr. A. B. said yes! Go? Now.", "no terminal x y"),
      Seq("   ", "w1 w2 \"quoted end\""),
      Seq())
    val ldf = lines.toDF("ls")
    def col1(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.collect().toSeq.map(_.get(0))
    def keptHof(l: org.apache.spark.sql.Column) =
      (rtrim(l).endsWith(".") || rtrim(l).endsWith("!") ||
        rtrim(l).endsWith("?") || rtrim(l).endsWith("\"")) &&
        (size(filter(split(l, "\\s+"), x => length(x) > lit(0)))
          >= lit(C4Kernels.minWordsPerLine)) &&
        !contains(lower(l), lit("javascript"))
    assert(col1(ldf.select(C4Kernels.count_c4_kept_lines(col("ls")))) ==
      col1(ldf.select(size(filter(col("ls"), keptHof _)).cast("long"))))
    assert(col1(ldf.select(C4Kernels.sum_c4_sentences(col("ls")))) ==
      col1(ldf.select(aggregate(filter(col("ls"), keptHof _), lit(0L),
        (acc, l) => acc + regexp_count(l, lit("[.!?]")).cast("long")))))

    // the RE2-vs-Java \s seam (r10 advice): the kernel follows the
    // ORACLE's regex engine, where \x0B does not split words — so it is
    // pinned directly, not via the Java-regex HOF law above (Spark's
    // split("\\s+") would count "ab\u000Bcd" as two words and disagree).
    // Line 1: 2 RE2-words -> rejected by the 3-word floor; line 2: 3 ->
    // kept. The registered quality_c4_rules row -7 hash-checks the same
    // seam against DuckDB.
    val vt = Seq(Seq("ab\u000Bcd ef.", "ab\u000Bcd ef gh.")).toDF("ls")
    assert(col1(vt.select(C4Kernels.count_c4_kept_lines(col("ls")))) == Seq(1L))
  }

  test("byte kernels equal the per-byte HOF forms on ASCII, UTF-8 and boundary edges") {
    import graft.functions.ByteKernels
    // the exact value-compatibility contract the kernels' scaladoc
    // claims — each vs the ascii(substr) lambda chain it replaced. On
    // ASCII inputs (the corpus premise) they agree; the high-byte row
    // documents WHERE the equivalence stops: ascii() works on decoded
    // CODE POINTS while the kernel sums raw bytes, which is exactly why
    // the blob family's oracle family is stated over an ASCII corpus.
    val asciiRows = Seq("hello world", "a", "", "1234567890" * 7, "\t\n !~")
    val df = asciiRows.toDF("s").select(encode(col("s"), "UTF-8").as("b"), col("s"))
    def col1(d: org.apache.spark.sql.DataFrame): Seq[Any] =
      d.collect().toSeq.map(_.get(0))
    assert(col1(df.select(ByteKernels.sum_bytes(col("b")))) ==
      col1(df.select(aggregate(
        transform(sequence(lit(1), length(col("s"))),
          j => ascii(col("s").substr(j, lit(1))).cast("long")),
        lit(0L), (acc, x) => acc + x))))
    Seq(1, 3, 8).foreach { stride =>
      assert(col1(df.select(ByteKernels.stride_sum_bytes(col("b"), stride))) ==
        col1(df.select(aggregate(
          transform(sequence(lit(0),
            greatest(floor((length(col("s")) - 1) / stride).cast("int"), lit(0))),
            i => ascii(col("s").substr(i * stride + 1, lit(1))).cast("long")),
          lit(0L), (acc, x) => acc + x))), s"stride $stride")
    }
    // raw-byte semantics on non-ASCII: é is 0xC3 0xA9 in UTF-8
    val utf = Seq(Array(0xC3.toByte, 0xA9.toByte)).toDF("b")
    assert(col1(utf.select(ByteKernels.sum_bytes(col("b")))) == Seq(0xC3 + 0xA9))
    // empty binary sums to zero at every stride
    val empty = Seq(Array.empty[Byte]).toDF("b")
    assert(col1(empty.select(ByteKernels.sum_bytes(col("b")))) == Seq(0L))
    assert(col1(empty.select(ByteKernels.stride_sum_bytes(col("b"), 8))) == Seq(0L))
  }

  test("multimodal features agree with direct computation on the blob") {
    val rows = Multimodal.mediaFeatures(spark, sfDir).collect()
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.take(50).foreach { r =>
      val bytes = texts(r.getLong(0)).getBytes("UTF-8")
      assert(r.getLong(1) == bytes.length)
      assert(r.getLong(2) == bytes.take(Multimodal.headerBytes).map(_ & 0xff).sum)
      assert(r.getLong(3) == (bytes.length + Multimodal.frameBytes - 1) / Multimodal.frameBytes)
    }
  }

  test("image table holds REAL PNGs; decode reproduces every pixel exactly") {
    // the golden the DuckDB oracle can't provide: decode the executor-
    // encoded PNG here with an independent ImageIO call and compare
    // PIXEL BY PIXEL against the closed form — lossless round trip, no
    // channel swizzle, no row/column transposition
    val rows = Multimodal.imageTable(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 5)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      // PNG magic bytes: a real container, not a labeled blob
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
        bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte,
        s"doc $id media is not a PNG")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == Multimodal.imgWidth(id))
      assert(img.getHeight == Multimodal.imgHeight(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xff) == Multimodal.pix(id, x, y, 0), s"R at ($x,$y) doc $id")
        assert(((p >> 8) & 0xff) == Multimodal.pix(id, x, y, 1), s"G at ($x,$y) doc $id")
        assert((p & 0xff) == Multimodal.pix(id, x, y, 2), s"B at ($x,$y) doc $id")
      }
    }
  }

  test("image resize halves dimensions and keeps exactly the stride-2 pixels") {
    val feat = Multimodal.imageResize(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 5)
      .collect()
    feat.foreach { r =>
      val id = r.getLong(0)
      val ow = Multimodal.imgWidth(id) / 2
      val oh = Multimodal.imgHeight(id) / 2
      assert(r.getInt(1) == ow && r.getInt(2) == oh)
      var rs = 0L; var gs = 0L; var bs = 0L
      for (y <- 0 until oh; x <- 0 until ow) {
        rs += Multimodal.pix(id, 2 * x, 2 * y, 0)
        gs += Multimodal.pix(id, 2 * x, 2 * y, 1)
        bs += Multimodal.pix(id, 2 * x, 2 * y, 2)
      }
      assert(r.getLong(3) == rs && r.getLong(4) == gs && r.getLong(5) == bs,
        s"doc $id resized channel sums drift from the stride-2 closed form")
    }
  }

  test("SQL surface: cosine_similarity and log_sum_exp are registered functions") {
    // the extension registers both customs with the function registry -
    // spark.sql users get the same surface the Column API exposes
    val c = spark.sql(
      "SELECT cosine_similarity(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c")
      .head.getDouble(0)
    assert(c == 1.0)
    val l = spark.sql(
      "SELECT log_sum_exp(x) AS l FROM VALUES (ln(2.0D)), (ln(3.0D)) AS t(x)")
      .head.getDouble(0)
    assert(math.abs(l - math.log(5.0)) < 1e-12, s"log_sum_exp: $l")
    // grouped use goes through partial+final merge like any aggregate
    val g = spark.sql(
      """SELECT k, log_sum_exp(x) AS l FROM VALUES
         (1, ln(1.0D)), (1, ln(4.0D)), (2, ln(9.0D)) AS t(k, x)
         GROUP BY k ORDER BY k""").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(math.abs(g(0)._2 - math.log(5.0)) < 1e-12)
    assert(math.abs(g(1)._2 - math.log(9.0)) < 1e-12)
  }
}
