package graft

import graft.operators.CorpusPipeline
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends GraftSpec {

  test("stratified sample is deterministic and respects the rate table") {
    val s1 = CorpusPipeline.sampleStratified(spark, sfDir).collect().toSeq
    val s2 = CorpusPipeline.sampleStratified(spark, sfDir).collect().toSeq
    assert(s1 == s2, "hash sampling must be resample-stable")
    assert(s1.nonEmpty)
    // every kept row's bucket is under its stratum rate
    assert(s1.forall(r => r.getLong(2) < r.getLong(3)))
  }

  test("temperature sampling flattens the language head, keeps the tail whole") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = CorpusPipeline.sampleTemperature(spark, sfDir).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val thr = CorpusPipeline.sampleTemperature(spark, sfDir).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    // the rarest language keeps EVERYTHING (threshold saturates at 1e6)
    val rarest = docs.minBy(_._2)._1
    assert(thr(rarest) == 1000000L, s"rarest '$rarest' threshold ${thr(rarest)}")
    assert(kept(rarest) == docs(rarest), "rarest language lost rows")
    // thresholds are anti-monotone in corpus share: a bigger language
    // never gets a higher keep rate than a smaller one (the flattening)
    val byCount = docs.toSeq.sortBy(_._2).map { case (l, _) => thr(l) }
    assert(byCount.zip(byCount.tail).forall { case (a, b) => a >= b },
      s"thresholds not anti-monotone in language size: $docs -> $thr")
    // and the head IS actually downsampled
    val head = docs.maxBy(_._2)._1
    assert(kept(head) < docs(head), "head language was not downsampled")
  }

  test("repetition stats are internally consistent") {
    val rows = CorpusPipeline.docRepetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, uniq, maxRep, dup) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(uniq <= n && maxRep <= n && maxRep >= 1)
      assert(dup >= 0.0 && dup < 1.0)
      assert(math.abs(dup - (n - uniq).toDouble / n) == 0.0)
    }
  }

  test("normalization is a fixpoint (normalizing twice changes nothing)") {
    val once = CorpusPipeline.textNormalize(spark, sfDir)
    val twice = once.select(col("doc_id"),
      trim(regexp_replace(
        regexp_replace(lower(col("norm_text")), "[^a-z0-9 \t\n\r\f]", " "),
        "[ \t\n\r\f]+", " ")).as("renorm"))
    val diff = once.join(twice, "doc_id")
      .filter(col("norm_text") =!= col("renorm")).count()
    assert(diff == 0)
    // normalization never grows the text
    assert(once.filter(col("n_after") > col("n_before")).count() == 0)
  }

  test("language shards prune at the partition level and lose no rows") {
    // under target/ so sbt clean reclaims it (tempdirs would accumulate)
    val out = s"target/graft-shards-test/${System.nanoTime()}"
    try {
      CorpusPipeline.writeLanguageShards(spark, sfDir, out)
      val back = spark.read.parquet(out)
      // per-language counts survive the shard round-trip
      val want = Tables.documents(spark, sfDir).groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = back.groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
      // the lang predicate must appear INSIDE the PartitionFilters
      // bracket — the plan string prints "PartitionFilters: []" even
      // when nothing is pushed, so contains("PartitionFilters") alone
      // would be vacuous
      val plan = back.filter(col("lang") === "en")
        .queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined,
        s"expected the lang filter pushed as a partition filter:\n$plan")
      // clustered write: one file per language partition, not P×L
      for (l <- got.keys) {
        val files = new java.io.File(s"$out/lang=$l")
          .listFiles().count(_.getName.endsWith(".parquet"))
        assert(files == 1, s"lang=$l has $files files, expected 1")
      }
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("balanced sample: exact k per language, lowered to the bounded-PQ top-k") {
    val df = CorpusPipeline.sampleBalanced(spark, sfDir)
    val perLang = df.collect().groupBy(_.getAs[String]("lang"))
    val strata = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(perLang.keySet == strata.keySet)
    perLang.foreach { case (l, rows) =>
      assert(rows.length == math.min(CorpusPipeline.balancedK.toLong, strata(l)),
        s"lang $l: got ${rows.length} of stratum ${strata(l)}")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPartial") && plan.contains("GraftTopKFinal"), plan)
  }

  test("sequence packing matches a driver-side greedy fold per shard") {
    val got = CorpusPipeline.packSequences(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, packId, off) =>
        assert(packId == cum / CorpusPipeline.packBudget)
        assert(off == cum % CorpusPipeline.packBudget)
        cum += n
      }
    }
  }

  test("funnel stages are monotonically non-increasing") {
    val stages = CorpusPipeline.corpusFunnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val order = Seq("1_total", "2_nonshort", "3_quality", "4_exact_unique", "5_sampled")
    assert(stages.keySet == order.toSet)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(stages(a) >= stages(b), s"$a=${stages(a)} < $b=${stages(b)}")
    }
    assert(stages("1_total") > 0)
  }

  test("doc_chunks: stride grid covers every token exactly; zero exchanges") {
    val k = CorpusPipeline.chunkSize
    val s = CorpusPipeline.chunkStride
    val df = CorpusPipeline.docChunks(spark, sfDir)
    // map-only up to the presentation ORDER BY (whose rangepartitioning
    // exchange is the only one allowed): no hash exchange anywhere
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
      "chunking must stay map-only below the presentation sort")
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq).toMap
    df.collect().groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val ws = toks(id)
      val chunks = rows.sortBy(_.getAs[Long]("chunk_idx"))
        .map(r => (r.getAs[Long]("start_tok"), r.getAs[Long]("n_toks"),
          r.getAs[String]("chunk_text")))
      // grid: starts advance by the stride from 0
      chunks.zipWithIndex.foreach { case ((st, n, text), i) =>
        assert(st == i.toLong * s)
        assert(n == math.min(st + k, ws.length) - st, s"doc $id chunk $i length")
        assert(text == ws.slice(st.toInt, (st + n).toInt).mkString(" "))
      }
      // coverage: last chunk reaches the end; no chunk is redundant
      val (lastS, lastN, _) = chunks.last
      assert(lastS + lastN == ws.length, s"doc $id: tail tokens uncovered")
      if (chunks.length > 1)
        assert(chunks.last._1 + chunks.last._2 >
          chunks(chunks.length - 2)._1 + chunks(chunks.length - 2)._2,
          s"doc $id: final chunk adds no new tokens")
    }
  }

  test("source_cap keeps the quality-top-K docs of every source, via the bounded-PQ operator") {
    val q = graft.operators.TextQuality.docQuality(spark, sfDir)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map(_._1).sortBy(id => (-q(id), id)).take(CorpusPipeline.sourceCapK)
        .zipWithIndex.map { case (id, i) => (id, src, i + 1) }
    }.toSet
    val df = CorpusPipeline.sourceCap(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSet
    assert(got == expected)
    // the per-source window lowers to the bounded-PQ top-k operator: a
    // hot domain costs a k-row heap per partition, not a domain sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPartial") && plan.contains("GraftTopKFinal"), plan)
  }

  test("quality deciles partition the corpus with monotone bin boundaries") {
    val bins = CorpusPipeline.qualityDeciles(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(bins.map(_._2).sum == corpus, "bins must partition the corpus")
    assert(bins.forall { case (b, _, _, _) => b >= 0 && b <= 9 })
    // within-bin ranges are consistent and bins never overlap in quality
    bins.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    bins.sliding(2).foreach {
      case Array((_, _, _, hiPrev), (_, _, loNext, _)) =>
        assert(hiPrev <= loNext, s"bin overlap: $hiPrev > $loNext")
      case _ =>
    }
    // the binning is doing real work: more than one populated bin
    assert(bins.length > 5, s"only ${bins.length} populated bins")
  }

  test("weighted sample equals a driver-side sequential-Poisson brute recompute") {
    val got = CorpusPipeline.sampleWeighted(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    def md5Int12(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12), 16)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val brute = docs
      .map { case (id, lang, n) =>
        (id, lang, (md5Int12(id.toString) + 1).toDouble / 281474976710656.0 / n)
      }
      .groupBy(_._2).toSeq
      .flatMap { case (_, rows) =>
        rows.sortBy { case (id, _, pk) => (pk, id) }
          .take(CorpusPipeline.weightedK).zipWithIndex
          .map { case ((id, lang, _), i) => (id, lang, i + 1) }
      }
      .sortBy { case (id, lang, rk) => (lang, rk) }
    assert(got.toSeq == brute, "selection or ranking diverged from the scheme")
    // the weighting is doing real work: the selected docs' mean length
    // exceeds the corpus mean (longer docs draw higher inclusion odds)
    val byId = docs.map(d => d._1 -> d._3).toMap
    val meanSel = got.map(g => byId(g._1)).sum.toDouble / got.length
    val meanAll = docs.map(_._3).sum.toDouble / docs.length
    assert(meanSel > meanAll,
      s"selected mean $meanSel not above corpus mean $meanAll")
  }

  test("shard manifest: shards partition the corpus, assignment is append-stable, " +
      "token balance is servable") {
    val rows = CorpusPipeline.shardManifest(spark, sfDir).collect()
    assert(rows.length == CorpusPipeline.nShards)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs, "not a partition")
    // every doc's shard is a pure function of its id: adding documents
    // can only APPEND to shards — pinned by recomputing one shard's
    // membership on the doc-id set alone (no corpus state involved)
    val md = java.security.MessageDigest.getInstance("MD5")
    def shardOf(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Math.floorMod(java.lang.Long.parseLong(hex, 16), CorpusPipeline.nShards.toLong)
    }
    val ids = Tables.documents(spark, sfDir).select("doc_id").collect()
      .map(_.getLong(0))
    val wantPerShard = ids.groupBy(shardOf).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        wantPerShard(r.getAs[Long]("shard_id")), s"shard ${r.get(0)}")
    }
    // balance: each shard's token share within ±50% of uniform at this
    // tiny fixture (multinomial spread shrinks as shards fill; the
    // manifest's token_share column is the production check)
    val uniform = 1.0 / CorpusPipeline.nShards
    rows.foreach { r =>
      val share = r.getAs[Double]("token_share")
      assert(share > uniform * 0.5 && share < uniform * 1.5,
        s"shard ${r.get(0)} share $share")
    }
    assert(math.abs(rows.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-4)
  }
}
