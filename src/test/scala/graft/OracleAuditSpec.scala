package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-classification contract (r7 verdict #4, applied
  * registry-wide in r9): every query whose oracle replays the
  * implementation's encoding must carry a NAMED semantic gate — a
  * generative law against an independent reference, or a recall bar
  * against an Independent-class exact baseline. Parity-only is not a
  * representable state. */
class OracleAuditSpec extends AnyFunSuite {

  private val registered = SparkEntry.queries.keySet

  test("every explicit classification names a registered query") {
    val ghosts = OracleAudit.classes.keySet.diff(registered)
    assert(ghosts.isEmpty, s"classified but not registered: $ghosts")
  }

  test("every registered query resolves to a class with a citation") {
    registered.foreach { q =>
      val (_, cite) = OracleAudit.of(q)
      assert(cite.nonEmpty, s"$q has an empty gate citation")
    }
  }

  test("encoded families never fall through to the Independent default") {
    val encoded = registered.filter(q =>
      OracleAudit.encodedPrefixes.exists(q.startsWith))
    val defaulted = encoded.filterNot(OracleAudit.classes.contains)
    assert(defaulted.isEmpty,
      s"oracle replays the implementation's encoding but no semantic " +
      s"gate is declared (the parity-only hole): $defaulted")
    encoded.foreach { q =>
      val (cls, cite) = OracleAudit.of(q)
      assert(cls != OracleAudit.Independent,
        s"$q is in an encoded family but classified Independent")
      // the citation must point into the test tree, not be prose
      assert(cite.contains("Spec:"),
        s"$q's gate citation does not name a spec location: $cite")
    }
  }

  test("recall-class queries cite a gate and their exact baseline is " +
       "registered and Independent") {
    val recallBaselines = Map(
      "ann_ivf_cosine" -> "knn_brute_cosine",
      "ann_pq_cosine" -> "knn_brute_cosine",
      "ann_ivfpq_cosine" -> "knn_brute_cosine",
      "ann_sq_cosine" -> "knn_brute_cosine",
      "ann_lsh_cosine" -> "knn_brute_cosine",
      "dedup_embedding_cosine" -> "dedup_embedding_exact",
      "doc_embedding_neardup" -> "doc_embedding_exact")
    OracleAudit.classes.collect {
      case (q, (OracleAudit.ParityWithRecall, _)) => q
    }.foreach { q =>
      val baseline = recallBaselines.getOrElse(q,
        fail(s"recall-class query $q has no declared exact baseline"))
      assert(registered.contains(baseline),
        s"$q's exact baseline $baseline is not registered")
      assert(OracleAudit.of(baseline)._1 == OracleAudit.Independent,
        s"$q's baseline $baseline must itself be Independent-class")
    }
  }
}
