package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's a6 surface: online logistic-regression spam
  * classification (`TrainSpamClassifier.scala`, `ApplySpamClassifier.scala`,
  * `ApplyEnsembleSpamClassifier.scala`) over hashed term features.
  *
  * The reference's core semantic quirk is **enforced sequentiality**: it
  * trains with `groupByKey(1)` so a single reducer folds every instance in
  * order, updating a mutable weight map (`TrainSpamClassifier.scala:70-99`,
  * SGD step `w[f] += (y−p)·δ`, δ=0.002). That sequential fold IS the
  * algorithm (order changes the model), so here it is a
  * `repartition(1).sortWithinPartitions(...).mapPartitions` fold — the one
  * place in this engine where a semantic demands giving up parallelism
  * (SURVEY G6). Everything around it (featurization, scoring, ensembling)
  * is fully distributed.
  *
  * The reference's corpus isn't in-repo (FIXTURES §2), so instances are
  * derived deterministically from `documents`: features = md5-hashed
  * tokens mod B (the reference's hashed-feature space with a
  * cross-engine-replicable hash), label = presence of the token "spark"
  * (a learnable target whose signal is one feature — the trained model
  * must discover it, which the ScalaTest asserts via training-set
  * accuracy).
  *
  * Oracle story: the sequential fold is replicated in DuckDB as a
  * recursive CTE carrying the weight list as state — one recursion step
  * per training instance, the same IEEE operations in the same order
  * (the weight-sum iterates features in sorted order on both sides).
  * The only transcendental is `exp` in the logistic; outputs are rounded
  * to 6dp per the float discipline, which absorbs any last-ulp libm skew.
  * All four spam queries are fully oracle-checked — the shuffled
  * trainer's permutation key is md5(doc_id), replicable in SQL.
  *
  * Scoring (G7): explode features ⋈ broadcast weights → per-doc sum —
  * spamminess = Σ w(f), spam iff > 0 (`ApplySpamClassifier.scala:60-82`).
  * Ensemble (G8): three models on doc_id mod 3 splits; mean score and
  * majority vote (`ApplyEnsembleSpamClassifier.scala:75-107`).
  */
object SpamClassifier {

  val featureBuckets = 1009
  val delta = 0.002
  val labelToken = "spark"

  /** (doc_id, label, features[long]) — deterministic hashed featurization
    * with the cross-engine md5-32-bit hash (see TextFunctions.md5Int). */
  def instances(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokenize(col("text")).as("ws"))
      .select(
        col("doc_id"),
        when(array_contains(col("ws"), labelToken), 1).otherwise(0).as("label"),
        array_sort(array_distinct(transform(col("ws"),
          w => pmod(md5Int(w, 8), lit(featureBuckets.toLong))))).as("features"))

  private val fmemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), String]

  /** Family build: the featurization (tokenize + one md5 per token over
    * the whole corpus) materialized ONCE per (session, sf) and read by
    * every spam query — the retrieval-family treatment (r6d:
    * "probe the persisted index instead of rebuilding it"). Before
    * this, spam_apply featurized the corpus twice and spam_ensemble
    * four times, each pass a crypto-hash scan (measured 2.7 s at sf1);
    * at 100 TB re-featurizing per consumer is re-reading the corpus
    * per consumer. Bench prices the build as `spam_family_build`. */
  def featurizedFor(spark: SparkSession, dir: String): String =
    fmemo.synchronized {
      fmemo.getOrElseUpdate((spark, dir), {
        // collision-proof path (r11 advice): the sanitized tag alone can
        // collide ("data/sf1" vs "data.sf1" both tag to data_sf1), and a
        // SECOND session in the same JVM re-keying the memo must not
        // overwrite an artifact whose lazy plans the first session still
        // holds — so both a dir-hash discriminator and a session token
        // ride in the path (Lakehouse's artifact-name discipline).
        val out = s"target/graft-spam/${dir.replaceAll("[^A-Za-z0-9]", "_")}" +
          s"_${Integer.toHexString(dir.hashCode)}" +
          s"_${Integer.toHexString(System.identityHashCode(spark))}"
        instances(spark, dir).write.mode("overwrite").parquet(out)
        out
      })
    }

  def buildFamilyArtifacts(spark: SparkSession, dir: String): Unit =
    featurizedFor(spark, dir)

  def clearMemos(): Unit = fmemo.synchronized(fmemo.clear())

  val familyMembers: Set[String] = Set("spam_train", "spam_train_shuffled",
    "spam_apply", "spam_roca", "spam_ensemble")

  private def instancesMaterialized(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(featurizedFor(spark, dir))

  /** G6: sequential single-pass SGD in doc_id order; returns the model as
    * a small (feature, weight) DataFrame with RAW weights (rounding is an
    * output concern — scoring consumes the raw model). */
  def train(spark: SparkSession, instancesDf: DataFrame): DataFrame = {
    val sp = spark
    import sp.implicits._
    val folded = instancesDf
      .select(col("doc_id"), col("label"), col("features"))
      .as[(Long, Int, Seq[Long])]
      .repartition(1)
      .sortWithinPartitions("doc_id")
      .mapPartitions { it =>
        // dense weight array over the FIXED bucket space (r11): the
        // boxed Map[Long, Double] version spent the sequential fold —
        // the one leg that cannot parallelize — on hash probes and
        // boxing (measured via the enclosing query: spam_apply
        // 8.87 → 8.17 s at sf1 from this change alone; the fold is
        // ~0.75 s of the train leg after it). Same IEEE operations in
        // the same order: features are sorted, the score sum iterates
        // them identically, and `touched` reproduces the map's keyset
        // exactly (a weight updated back to 0.0 still emits, as the
        // map version did).
        val w = new Array[Double](featureBuckets)
        val touched = new Array[Boolean](featureBuckets)
        it.foreach { case (_, label, features) =>
          var score = 0.0
          features.foreach(f => score += w(f.toInt))
          val p = 1.0 / (1.0 + math.exp(-score))
          val g = (label - p) * delta
          features.foreach { f =>
            w(f.toInt) += g; touched(f.toInt) = true
          }
        }
        (0 until featureBuckets).iterator
          .filter(touched)
          .map(f => (f.toLong, w(f)))
      }
    folded.toDF("feature", "weight")
  }

  def spamTrain(spark: SparkSession, dir: String): DataFrame =
    train(spark, instancesMaterialized(spark, dir))
      .select(col("feature"), round(col("weight"), 6).as("weight"))
      .orderBy("feature")

  /** O7/F12: the reference shuffles training order with random sort keys
    * before the sequential fold (`TrainSpamClassifier.scala:63-68`).
    * The shuffle key is md5(doc_id) — a deterministic pseudo-random
    * permutation (uniform, uncorrelated with doc order) rather than
    * `rand(seed)`: same statistical effect on SGD, but reproducible
    * bit-for-bit on any engine and any partitioning, which makes the
    * shuffled trainer fully oracle-checkable. The fold consumes rows in
    * shuffled order via a precomputed rank. */
  def spamTrainShuffled(spark: SparkSession, dir: String): DataFrame = {
    // the unpartitioned window (Spark warns "no partition defined") is
    // the SEMANTIC here: one global total training order. The data at
    // this point is the instance stream that feeds an enforced
    // single-partition sequential fold anyway — there is no parallel
    // version of "train in this exact order".
    val shuffled = instancesMaterialized(spark, dir)
      .withColumn("shuffle_key", md5(col("doc_id").cast("string")))
      .withColumn("doc_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("shuffle_key", "doc_id")).cast("long"))
      .select("doc_id", "label", "features")
    train(spark, shuffled)
      .select(col("feature"), round(col("weight"), 6).as("weight"))
      .orderBy("feature")
  }

  /** G7: score = Σ w(f) over the doc's features; spam iff score > 0. */
  def score(instancesDf: DataFrame, model: DataFrame, scoreName: String): DataFrame =
    instancesDf
      .select(col("doc_id"), col("label"), explode(col("features")).as("feature"))
      .join(broadcast(model), Seq("feature"), "left")
      .na.fill(0.0, Seq("weight"))
      .groupBy("doc_id", "label")
      .agg(sum("weight").as(scoreName))

  def spamApply(spark: SparkSession, dir: String): DataFrame = {
    val inst = instancesMaterialized(spark, dir)
    score(inst, train(spark, inst), "raw_score")
      // threshold applies to the ROUNDED score on both engines (float
      // discipline): the rounded value is the published one, so the
      // prediction must be a function of it
      .select(col("doc_id"), col("label"), round(col("raw_score"), 6).as("score"))
      .withColumn("pred_spam", col("score") > 0)
      .orderBy("doc_id")
  }

  /** G8: three models on disjoint doc_id mod 3 splits; average-score and
    * majority-vote ensembles, both over the per-model ROUNDED scores. */
  def spamEnsemble(spark: SparkSession, dir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    // every leg reads the materialized featurization (r11) — the old
    // cache-train-unpersist dance re-featurized the corpus for each of
    // the three scoring passes because the returned lazy plan could not
    // reference a cache released inside this method
    val inst = instancesMaterialized(spark, dir)
    // the three folds train CONCURRENTLY (r14, guide §2.6): each train is
    // a deliberately sequential one-task fold (repartition(1) SGD), so
    // running them serially left 31 of 32 cores idle three times over;
    // the folds are independent (disjoint doc_id mod 3 slices of the
    // shared materialized featurization) and each lands in its own
    // bounded driver collect, so a 3-thread pool overlaps them without
    // changing any fold's sequential semantics
    val modelRows = new Array[Seq[(Long, Double)]](3)
    graft.Tables.runConcurrently("graft-spam-ensemble", (0 until 3).map(k => () => {
      modelRows(k) = train(spark, inst.filter(pmod(col("doc_id"), lit(3)) === k))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }))
    val models = (0 until 3).map(k => modelRows(k).toDF("feature", "weight"))
    val scored = (0 until 3).map { k =>
      score(instancesMaterialized(spark, dir), models(k), s"raw$k")
        .withColumn(s"score$k", round(col(s"raw$k"), 6))
        .drop(s"raw$k")
    }
    scored.reduce((a, b) => a.join(b, Seq("doc_id", "label")))
      .withColumn("avg_score",
        round((col("score0") + col("score1") + col("score2")) / 3.0, 6))
      .withColumn("votes",
        (col("score0") > 0).cast("int") + (col("score1") > 0).cast("int") +
          (col("score2") > 0).cast("int"))
      .select(col("doc_id"), col("label"), col("avg_score"),
        (col("avg_score") > 0).as("pred_avg"), (col("votes") >= 2).as("pred_vote"))
      .orderBy("doc_id")
  }

  /** G9 as a registered query (r9 verdict item 6): 1-ROCA% — the area
    * ABOVE the ROC curve, in percent — over [[spamApply]]'s published
    * (rounded) scores, via rank-sum inversion counting: AUC equals the
    * normalized Mann-Whitney U of the spam-score ranks, which is the
    * reference's `inversions/(hams*spams)` (`compute_spam_metrics.c:
    * 68-146`) with ties averaged instead of jitter-broken (the reference
    * adds `random()*1e-20` per score; a deterministic metric needs the
    * tie-averaged form). Every rank term is a multiple of 0.5 and far
    * below 2^53, so the rank sum is EXACT in double regardless of
    * partial-aggregation order — both engines reach bit-identical AUC.
    *
    * Scale: the global order-by window runs over the DISTINCT-score
    * table (a grouped count of the corpus scan), not per document — the
    * corpus-sized leg is one groupBy; only the collapsed score
    * distribution pays a single-partition window, the same bounded-side
    * discipline as the mixture/funnel queries. */
  def spamRoca(spark: SparkSession, dir: String): DataFrame = {
    val byScore = spamApply(spark, dir)
      .groupBy("score")
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("n_spam_at"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("score")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val agg = byScore
      .withColumn("cum_less", coalesce(sum(col("n_all")).over(w), lit(0L)))
      .agg(
        sum(col("n_spam_at") *
          (col("cum_less") + (col("n_all") + lit(1)) / lit(2.0))).as("r_spam"),
        sum(col("n_spam_at")).cast("long").as("n_spam"),
        sum(col("n_all")).cast("long").as("n_all"))
    val auc = (col("r_spam") - col("n_spam") * (col("n_spam") + lit(1L)) / lit(2.0)) /
      (col("n_spam") * (col("n_all") - col("n_spam")))
    agg.select(
      (col("n_all") - col("n_spam")).as("n_ham"),
      col("n_spam"),
      round(auc, 6).as("auc"),
      round((lit(1.0) - auc) * 100, 6).as("roca_pct"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "spam_train" -> (spamTrain _),
    "spam_train_shuffled" -> (spamTrainShuffled _),
    "spam_apply" -> (spamApply _),
    "spam_roca" -> (spamRoca _),
    "spam_ensemble" -> (spamEnsemble _))

  /** Featurized instances CTE — the exact mirror of [[instances]]. */
  private val instSql =
    s"""inst AS MATERIALIZED (
         SELECT doc_id,
                CASE WHEN list_contains(ws, '$labelToken') THEN 1 ELSE 0 END AS label,
                list_sort(list_distinct(
                  [${md5IntSql("w", 8)} % $featureBuckets for w in ws])) AS features
         FROM (SELECT doc_id, $tokenizeSql AS ws FROM documents))"""

  /** The sequential SGD fold as a recursive CTE: state = the weight list,
    * one recursion step per instance in training order. `suffix` names the
    * CTEs so the ensemble can instantiate three independent trainers;
    * `where` restricts the training split. */
  private def sgdSql(suffix: String, where: String,
                     orderBy: String = "doc_id"): String =
    // MATERIALIZED: the recursive fold joins docs once per step — an
    // inlined CTE would re-tokenize and re-rank the corpus every one of
    // the N recursion steps (quadratic; the reason the sf0.1 oracle
    // sweep used to crawl)
    s"""docs$suffix AS MATERIALIZED (
         SELECT row_number() OVER (ORDER BY $orderBy) AS i, label, features
         FROM inst $where),
       sgd$suffix(i, w) AS (
         SELECT 0::BIGINT, []::STRUCT(f BIGINT, wt DOUBLE)[]
         UNION ALL
         SELECT u.i,
           [CASE WHEN list_contains(u.feats, x.f)
                 THEN {'f': x.f, 'wt': x.wt + u.g} ELSE x END for x in u.w]
           || [{'f': f, 'wt': u.g} for f in u.feats
               if NOT list_contains([x.f for x in u.w], f)]
         FROM (
           SELECT d.i AS i, s.w AS w, d.features AS feats,
                  (d.label - 1.0/(1.0 + exp(-coalesce(list_sum(
                    [coalesce(list_sum([x.wt for x in s.w if x.f = f]), 0.0)
                     for f in d.features]), 0.0)))) * $delta AS g
           FROM sgd$suffix s JOIN docs$suffix d ON d.i = s.i + 1
         ) u),
       model$suffix AS (
         SELECT x.f AS feature, x.wt AS weight
         FROM (SELECT unnest(w) AS x FROM sgd$suffix
               WHERE i = (SELECT max(i) FROM sgd$suffix)))"""

  /** Scoring CTE over the full instance set with model `m$suffix` —
    * explode + left join + sum, mirroring [[score]]. */
  private def scoredSql(suffix: String): String =
    s"""scored$suffix AS (
         SELECT t.doc_id, t.label, coalesce(sum(m.weight), 0.0) AS score
         FROM (SELECT doc_id, label, unnest(features) AS feature FROM inst) t
         LEFT JOIN model$suffix m USING (feature)
         GROUP BY t.doc_id, t.label)"""

  val oracleSql: Map[String, String] = Map(
    "spam_train" ->
      s"""WITH RECURSIVE $instSql, ${sgdSql("", "")}
          SELECT feature, round(weight, 6) AS weight
          FROM model ORDER BY feature""",
    // same fold, md5-permuted training order — md5's hex is compared
    // bytewise identically in both engines, doc_id breaks (impossible)
    // ties, so the recursion visits instances in the exact Spark order
    "spam_train_shuffled" ->
      s"""WITH RECURSIVE $instSql,
          ${sgdSql("", "", orderBy = "md5(doc_id::VARCHAR), doc_id")}
          SELECT feature, round(weight, 6) AS weight
          FROM model ORDER BY feature""",
    "spam_apply" ->
      s"""WITH RECURSIVE $instSql, ${sgdSql("", "")}, ${scoredSql("")}
          SELECT doc_id, label, round(score, 6) AS score,
                 round(score, 6) > 0 AS pred_spam
          FROM scored ORDER BY doc_id""",
    // tie-averaged Mann-Whitney rank sum over the ROUNDED scores — the
    // identical arithmetic as [[spamRoca]]; every term is a multiple of
    // 0.5 so the double sums are order-independent and exact
    "spam_roca" ->
      s"""WITH RECURSIVE $instSql, ${sgdSql("", "")}, ${scoredSql("")},
          r AS (SELECT round(score, 6) AS score, label FROM scored),
          by_score AS (
            SELECT score, count(*)::BIGINT AS n_all,
                   sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)::BIGINT
                     AS n_spam_at
            FROM r GROUP BY score),
          ranked AS (
            SELECT n_all, n_spam_at,
                   coalesce(sum(n_all) OVER (ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0)::BIGINT AS cum_less
            FROM by_score),
          agg AS (
            SELECT sum(n_spam_at * (cum_less + (n_all + 1) / 2.0)) AS r_spam,
                   sum(n_spam_at)::BIGINT AS n_spam,
                   sum(n_all)::BIGINT AS n_all
            FROM ranked)
          SELECT (n_all - n_spam) AS n_ham, n_spam,
                 round((r_spam - n_spam * (n_spam + 1) / 2.0)
                       / (n_spam * (n_all - n_spam)), 6) AS auc,
                 round((1.0 - (r_spam - n_spam * (n_spam + 1) / 2.0)
                       / (n_spam * (n_all - n_spam))) * 100, 6) AS roca_pct
          FROM agg""",
    "spam_ensemble" ->
      s"""WITH RECURSIVE $instSql,
          ${sgdSql("0", "WHERE doc_id % 3 = 0")},
          ${sgdSql("1", "WHERE doc_id % 3 = 1")},
          ${sgdSql("2", "WHERE doc_id % 3 = 2")},
          ${scoredSql("0")}, ${scoredSql("1")}, ${scoredSql("2")},
          rounded AS (
            SELECT a.doc_id, a.label,
                   round(a.score, 6) AS s0, round(b.score, 6) AS s1,
                   round(c.score, 6) AS s2
            FROM scored0 a
            JOIN scored1 b ON a.doc_id = b.doc_id AND a.label = b.label
            JOIN scored2 c ON a.doc_id = c.doc_id AND a.label = c.label)
          SELECT doc_id, label,
                 round((s0 + s1 + s2) / 3.0, 6) AS avg_score,
                 round((s0 + s1 + s2) / 3.0, 6) > 0 AS pred_avg,
                 (CASE WHEN s0 > 0 THEN 1 ELSE 0 END +
                  CASE WHEN s1 > 0 THEN 1 ELSE 0 END +
                  CASE WHEN s2 > 0 THEN 1 ELSE 0 END) >= 2 AS pred_vote
          FROM rounded ORDER BY doc_id""")
}
