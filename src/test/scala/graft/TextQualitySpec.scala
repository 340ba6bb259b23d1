package graft

import graft.operators.TextQuality

class TextQualitySpec extends GraftSpec {

  test("pii_redact scrubs the engineered rows exactly; corpus untouched") {
    import graft.operators.TextQuality
    val rows = TextQuality.piiRedact(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"),
          r.getAs[Int]("n_ips")), r.getAs[String]("redacted"))).toMap
    assert(rows(-1L) == ((2, 0, 0),
      "contact <EMAIL> or <EMAIL> today"))
    assert(rows(-2L) == ((0, 2, 0), "call <PHONE> or <PHONE> before noon"))
    assert(rows(-3L) == ((0, 0, 2), "server at <IP> and <IP> responded"))
    // ordering: the email must win before phone/IP see its digits
    assert(rows(-4L) == ((1, 1, 1),
      "mixed: <EMAIL> pinged <IP> then dialed <PHONE>"))
    assert(rows(-5L) == ((0, 0, 0), "no pii here at all"))
    // the synthetic corpus is digit-free: every real doc passes through
    // unredacted with zero counts (a regression here means a pattern
    // started matching plain prose)
    val corpus = rows.filter(_._1 >= 0)
    assert(corpus.nonEmpty &&
      corpus.values.forall { case (counts, _) => counts == ((0, 0, 0)) })
  }

  test("doc_logprob matches a driver-side unigram-model recompute") {
    val rows = TextQuality.docLogprob(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq).toMap
    val withToks = docs.filter(_._2.nonEmpty)
    assert(rows.length == withToks.size, "one row per non-empty doc")
    val n = withToks.values.map(_.size.toLong).sum
    val gf = withToks.values.flatten.groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    // mirror Spark's round(x, d): BigDecimal HALF_UP at the given scale
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val micro = gf.map { case (w, c) =>
      w -> BigDecimal(r6(math.log10(c.toDouble / n)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ws = withToks(id)
      val wantSum = ws.map(micro).sum
      assert(r.getAs[Long]("n_toks") == ws.size.toLong)
      assert(r.getAs[Long]("logprob_micro") == wantSum,
        s"doc $id micro sum mismatch")
      val avg = r.getAs[Double]("avg_logprob")
      assert(avg == wantSum.toDouble / (ws.size.toLong * 1000000L))
      assert(avg < 0, s"doc $id: unigram log-prob must be negative, got $avg")
    }
  }

  test("doc_logprob_bigram matches a driver-side interpolated-LM recompute") {
    val rows = TextQuality.docLogprobBigram(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq).toMap
    val docBigrams = docs.view.mapValues(ws => ws.zip(ws.drop(1))).toMap
      .filter(_._2.nonEmpty)
    assert(rows.length == docBigrams.size, "one row per doc with >= 2 tokens")
    val cab = docBigrams.values.flatten.groupBy(identity)
      .map { case (b, bs) => b -> bs.size.toLong }
    val ca = cab.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val cb = cab.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val n = cab.values.sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the IDENTICAL interpolation arithmetic, in the identical order
    val micro = cab.map { case (bg @ (a, b), c) =>
      val p = TextQuality.lmLambda * (c.toDouble / ca(a)) +
        TextQuality.lmMu * (cb(b).toDouble / n)
      bg -> BigDecimal(r6(math.log10(p)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bgs = docBigrams(id)
      val wantSum = bgs.map(micro).sum
      assert(r.getAs[Long]("n_bigrams") == bgs.size.toLong)
      assert(r.getAs[Long]("logprob_micro") == wantSum, s"doc $id micro sum mismatch")
      assert(r.getAs[Double]("avg_logprob") ==
        wantSum.toDouble / (bgs.size.toLong * 1000000L))
    }
  }

  test("C4 rules match a driver-side recompute, and the engineered rows hit every rule") {
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap ++
      TextQuality.c4Samples
    val rows = TextQuality.qualityC4Rules(spark, sfDir).collect()
    assert(rows.length == texts.size)
    def keptLine(l: String): Boolean = {
      val rt = l.replaceAll(" +$", "")
      // the explicit class is RE2's \s — [\t\n\f\r ] without \x0B —
      // because the oracle's word split runs on RE2 (r10 advice; Java's
      // \s would disagree on the engineered -7 row)
      rt.nonEmpty && Set('.', '!', '?', '"')(rt.last) &&
        l.split("[\\t\\n\\f\\r ]+").count(_.nonEmpty) >= 3 &&
        !l.toLowerCase.contains("javascript")
    }
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val lines = t.split("\n", -1)
      val kept = lines.filter(keptLine)
      val sentences = kept.map(_.count(c => c == '.' || c == '!' || c == '?')).sum.toLong
      val lorem = t.toLowerCase.contains("lorem ipsum")
      val brace = t.contains("{")
      assert(r.getAs[Long]("n_lines") == lines.length.toLong)
      assert(r.getAs[Long]("n_kept_lines") == kept.length.toLong)
      assert(r.getAs[Long]("n_sentences") == sentences)
      assert(r.getAs[Boolean]("has_lorem") == lorem)
      assert(r.getAs[Boolean]("has_brace") == brace)
      assert(r.getAs[Boolean]("keep") ==
        (sentences >= TextQuality.c4MinSentences && !lorem && !brace))
    }
    // the engineered rows discriminate exactly as designed: keeper,
    // sentence-floor reject, javascript-line drop (page still kept),
    // lorem reject, brace reject, end-quote terminal keeper
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(byId(-1L) && !byId(-2L) && byId(-3L) && !byId(-4L) && !byId(-5L) && byId(-6L))
    val minus3 = rows.find(_.getAs[Long]("doc_id") == -3L).get
    assert(minus3.getAs[Long]("n_kept_lines") == 1L,
      "the javascript line must be dropped at line level")
  }

  test("quality_agreement equals a driver-side cross-tab of the two batteries") {
    val g = TextQuality.qualityGopherRules(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val c = TextQuality.qualityC4Rules(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val qm = TextQuality.docQuality(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        math.round(r.getAs[Double]("quality") * 1e6)).toMap
    val ids = g.keySet.intersect(c.keySet).intersect(qm.keySet)
    assert(ids.nonEmpty && !ids.exists(_ < 0), "engineered rows must drop out")
    val want = ids.groupBy(id => (g(id), c(id))).map { case (k, ds) =>
      k -> (ds.size.toLong, ds.toSeq.map(qm).sum)
    }
    val rows = TextQuality.qualityAgreement(spark, sfDir).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val k = (r.getAs[Boolean]("keep_gopher"), r.getAs[Boolean]("keep_c4"))
      val (n, qsum) = want(k)
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("quality_micro_sum") == qsum)
      assert(r.getAs[Double]("avg_quality") == qsum.toDouble / (n * 1000000L))
    }
  }

  test("gopher rules match a driver-side recompute from the raw text, every doc") {
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = TextQuality.qualityGopherRules(spark, sfDir).collect()
    assert(rows.length == texts.size)
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length, "rule battery should discriminate")
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val words = t.split("\\s+").filter(_.nonEmpty)
      val lines = t.split("\n", -1) // keep trailing empties: string_split does
      val nSym = "#".r.findAllIn(t).size + "\\.\\.\\.".r.findAllIn(t).size
      assert(r.getAs[Long]("n_words") == words.length.toLong)
      assert(r.getAs[Double]("mean_word_len") ==
        words.map(_.length).sum.toDouble / words.length)
      assert(r.getAs[Double]("symbol_ratio") == nSym.toDouble / words.length)
      assert(r.getAs[Double]("bullet_frac") ==
        lines.count(l => Set("-", "*", "•")(l.replaceAll("^ +", "").take(1)))
          .toDouble / lines.length)
      assert(r.getAs[Double]("ellipsis_frac") ==
        lines.count(_.replaceAll(" +$", "").endsWith("...")).toDouble / lines.length)
      assert(r.getAs[Double]("alpha_frac") ==
        words.count(_.toLowerCase.exists(c => c >= 'a' && c <= 'z')).toDouble
          / words.length)
      assert(r.getAs[Long]("stop_hits") ==
        words.count(w => TextQuality.gopherStops.contains(w.toLowerCase)).toLong)
      val keepWant =
        r.getAs[Long]("n_words") >= TextQuality.gopherMinWords &&
          r.getAs[Long]("n_words") <= TextQuality.gopherMaxWords &&
          r.getAs[Double]("mean_word_len") >= TextQuality.gopherMinMeanWordLen &&
          r.getAs[Double]("mean_word_len") <= TextQuality.gopherMaxMeanWordLen &&
          r.getAs[Double]("symbol_ratio") <= TextQuality.gopherMaxSymbolRatio &&
          r.getAs[Double]("bullet_frac") <= TextQuality.gopherMaxBulletFrac &&
          r.getAs[Double]("ellipsis_frac") <= TextQuality.gopherMaxEllipsisFrac &&
          r.getAs[Double]("alpha_frac") >= TextQuality.gopherMinAlphaFrac &&
          r.getAs[Long]("stop_hits") >= TextQuality.gopherMinStopHits
      assert(r.getAs[Boolean]("keep") == keepWant)
    }
  }
}
