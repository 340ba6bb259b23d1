package graft

import graft.operators.SpamClassifier

class SpamSpec extends GraftSpec {
  import spark.implicits._

  /** Cleanly separable synthetic corpus: features 0–9 appear only in spam,
    * 10–19 only in ham, 20–29 in both (noise). */
  private def synthetic(n: Int): org.apache.spark.sql.DataFrame = {
    val rng = new scala.util.Random(7)
    (0 until n).map { i =>
      val label = i % 2
      val signal = if (label == 1) Seq(i % 10) else Seq(10 + i % 10)
      val noise = Seq(20 + rng.nextInt(10), 20 + rng.nextInt(10)).distinct
      (i.toLong, label, (signal ++ noise).sorted.map(_.toLong))
    }.toDF("doc_id", "label", "features")
  }

  test("training is deterministic (sequential fold in fixed order)") {
    val w1 = SpamClassifier.spamTrain(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w2 = SpamClassifier.spamTrain(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w1 == w2)
    assert(w1.nonEmpty)
  }

  test("seeded shuffle training is deterministic but order-sensitive") {
    val s1 = SpamClassifier.spamTrainShuffled(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s2 = SpamClassifier.spamTrainShuffled(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1 == s2, "seeded shuffle must be reproducible")
    val unshuffled = SpamClassifier.spamTrain(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // sequential SGD is order-sensitive: a different order is a different model
    assert(s1 != unshuffled)
  }

  test("single-pass SGD separates a linearly-separable corpus") {
    val inst = synthetic(400)
    val model = SpamClassifier.train(spark, inst)
    val rows = SpamClassifier.score(inst, model, "score").collect()
    val acc = rows.count(r =>
      (r.getAs[Double]("score") > 0) == (r.getAs[Int]("label") == 1)
    ).toDouble / rows.length
    assert(acc >= 0.95, s"train accuracy $acc")
  }

  test("1-ROCA% metric (reference G9, compute_spam_metrics.c): synthetic model beats chance") {
    // AUC via rank-sum inversion counting, exactly the reference metric's
    // core (bootstrap resampling omitted — test-side only per SURVEY §5)
    val inst = synthetic(400)
    val model = SpamClassifier.train(spark, inst)
    val scored = SpamClassifier.score(inst, model, "score").collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Double]("score")))
    val ranked = scored.sortBy(_._2).zipWithIndex // rank by score asc
    val nPos = scored.count(_._1 == 1).toDouble
    val nNeg = scored.length - nPos
    val posRankSum = ranked.collect { case ((1, _), i) => (i + 1).toDouble }.sum
    val auc = (posRankSum - nPos * (nPos + 1) / 2) / (nPos * nNeg)
    val rocaPct = (1.0 - auc) * 100
    assert(rocaPct < 5.0, s"1-ROCA% $rocaPct")
  }

  test("spam queries run end-to-end on documents and stay consistent") {
    val applied = SpamClassifier.spamApply(spark, sfDir).collect()
    assert(applied.nonEmpty)
    // pred must equal score>0 row-wise
    applied.foreach { r =>
      assert(r.getAs[Boolean]("pred_spam") == (r.getAs[Double]("score") > 0))
    }
    val ens = SpamClassifier.spamEnsemble(spark, sfDir).collect()
    assert(ens.length == applied.length)
  }

  test("spam_roca (registered G9) equals the driver-side tie-averaged AUC") {
    val scored = SpamClassifier.spamApply(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Double]("score")))
    // independent computation: average ranks over score-ascending order
    val n = scored.length
    val byScore = scored.groupBy(_._2).toSeq.sortBy(_._1)
    var cum = 0L; var rSpam = 0.0
    byScore.foreach { case (_, rows) =>
      val avgRank = cum + (rows.length + 1) / 2.0
      rSpam += rows.count(_._1 == 1) * avgRank
      cum += rows.length
    }
    val nSpam = scored.count(_._1 == 1).toLong
    val nHam = n - nSpam
    val wantAuc = (rSpam - nSpam * (nSpam + 1) / 2.0) / (nSpam.toDouble * nHam)
    val row = SpamClassifier.spamRoca(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_ham") == nHam)
    assert(row.getAs[Long]("n_spam") == nSpam)
    assert(math.abs(row.getAs[Double]("auc") - wantAuc) < 1e-6)
    assert(math.abs(row.getAs[Double]("roca_pct") - (1 - wantAuc) * 100) < 1e-4)
    // the trained model must beat chance on its own training corpus
    assert(row.getAs[Double]("auc") > 0.5, s"AUC ${row.getAs[Double]("auc")}")
  }
}
