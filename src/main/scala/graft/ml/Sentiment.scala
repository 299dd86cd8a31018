package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.{LinearSVC, LogisticRegression, NaiveBayes}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** End-to-end sentiment classification, re-expressing the reference's
  * mllib-RDD flow (/root/reference/Scalable_Project_ML_Model_Analysis.py:172-344:
  * SVMWithSGD / LogisticRegressionWithLBFGS / NaiveBayes over LabeledPoint
  * RDDs) on the modern spark.ml DataFrame API: LinearSVC / LogisticRegression
  * / NaiveBayes as pipeline stages after [[Featurize]]. No RDD round-trips,
  * no driver-side LabeledPoint conversion — features stay columnar from scan
  * to model.
  *
  * The model is one `PipelineModel` artifact (tokenizer+stopwords+cv+idf+clf),
  * mirroring — and simplifying — the reference's four separately persisted
  * models (Scalable_Project_SVM_Model_Deployment.py:126,156,178,237).
  */
object Sentiment {

  /** Label documents the way the reference binarizes stars (≥4 → 1):
    * here n_chars ≥ threshold → 1, plus the reference's clean step. */
  def prepare(docs: DataFrame, textCol: String = "text",
              lengthThreshold: Double = 300.0): DataFrame =
    docs
      .withColumn("text", TextFunctions.cleanText(col(textCol)))
      .withColumn("label",
        TextFunctions.binarize(col("n_chars"), lengthThreshold).cast("double"))

  private def classifier(algo: String): PipelineStage = algo match {
    // ref uses 50 iters / reg 0.3 for SVMWithSGD; LinearSVC converges much
    // faster per iteration, 10 keeps bench time sane at identical quality
    case "svm" => new LinearSVC()
      .setFeaturesCol("tfidf").setLabelCol("label")
      .setMaxIter(10).setRegParam(0.3)
    case "lr" => new LogisticRegression()
      .setFeaturesCol("tfidf").setLabelCol("label")
      .setMaxIter(10).setRegParam(0.3)
    // multinomial NB models term COUNTS; feeding it IDF-weighted reals both
    // violates the model and measurably hurts F1 (0.41 -> parity with the
    // linear models on tf). The tf column comes from the same pipeline.
    case "nb" => new NaiveBayes()
      .setFeaturesCol("tf").setLabelCol("label")
      .setSmoothing(1.0).setModelType("multinomial")
    case other => throw new IllegalArgumentException(s"unknown algo: $other")
  }

  /** Featurize + classify as one pipeline. `hashing = true` swaps
    * CountVectorizer for HashingTF (the no-driver-vocab 100 TB path). */
  def pipeline(algo: String, vocabSize: Int = 4096,
               hashing: Boolean = false): Pipeline =
    new Pipeline().setStages(
      Featurize.pipeline(vocabSize = vocabSize, hashing = hashing).getStages :+
        classifier(algo))

  /** 80/20 split (ref seed=100, Scalable_Project_ML_Model_Analysis.py:172-174),
    * train, predict, F1. Returns (model, f1, test predictions). */
  def trainEval(labeled: DataFrame, algo: String,
                seed: Long = 100L, vocabSize: Int = 4096,
                hashing: Boolean = false)
      : (PipelineModel, Double, DataFrame) = {
    val Array(train, test) = labeled.randomSplit(Array(0.8, 0.2), seed)
    train.cache(); test.cache()
    val model = pipeline(algo, vocabSize, hashing).fit(train)
    val preds = model.transform(test)
    (model, f1(preds), preds)
  }

  /** The reference's headline deliverable — the three-model F1 comparison
    * (Scalable_Project_ML_Model_Analysis.py:209-344 trains SVM / LR / NB and
    * reports each F1) — as one DataFrame of (algo, f1). The featurization
    * (tokenize → stopwords → CV → IDF) is fitted ONCE and its train/test
    * outputs cached; only the classifier heads refit per algo, so the
    * comparison costs one featurize pass + three head fits, not three full
    * pipeline fits. */
  def compareModels(labeled: DataFrame,
                    algos: Seq[String] = Seq("svm", "lr", "nb"),
                    seed: Long = 100L, vocabSize: Int = 4096): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val Array(train, test) = labeled.randomSplit(Array(0.8, 0.2), seed)
    // cache the RAW split too (as trainEval does): the featurize fit makes
    // two passes over train (CV fit, then IDF fit) and transform re-reads
    // both sides — uncached, each pass re-derives split + cleaning
    train.cache(); test.cache()
    val feat = Featurize.pipeline(vocabSize = vocabSize).fit(train)
    val fTrain = feat.transform(train).select("label", "tf", "tfidf").cache()
    val fTest = feat.transform(test).select("label", "tf", "tfidf").cache()
    val rows = algos.map { algo =>
      // one-stage Pipeline wrapper: fits any classifier head to a
      // Transformer without per-algo type gymnastics
      val head = new Pipeline().setStages(Array(classifier(algo))).fit(fTrain)
      algo -> f1(head.transform(fTest))
    }
    fTrain.unpersist(); fTest.unpersist(); train.unpersist(); test.unpersist()
    rows.toDF("algo", "f1")
  }

  /** k-fold cross-validated regParam sweep — the reference imports
    * CrossValidator/ParamGridBuilder in all four ML files (e.g.
    * Scalable_Project_ML_Model_Analysis.py:24-25) but never invokes
    * them; this closes that last dead-import surface with the real
    * spark.ml tuning loop. The WHOLE pipeline (featurize + head) is the
    * CV estimator, so each fold refits its own vocabulary — no
    * train/validation leakage through a shared CountVectorizer fit.
    * All three heads sweep: the linear heads (svm/lr) grid their
    * `regParam`; nb grids its Laplace `smoothing` α — the same
    * one-regularizer-per-head shape, reported in the same column.
    * Output: one row per grid point, (algo, reg_param_m, avg_f1_uu,
    * std_f1_uu, is_best) with the repo's floored micro-unit convention
    * (q167) — avg from the engine's `avgMetrics`, dispersion the
    * POPULATION std across true per-fold F1s, the number a real tuning
    * decision reads next to the mean.
    *
    * Per-fold metrics: Spark 4.1's CrossValidatorModel exposes only
    * `avgMetrics`, so the sweep collects sub-models and re-evaluates
    * each on ITS OWN validation fold, reconstructed by replaying the
    * exact split CrossValidator.fit performs —
    * `MLUtils.kFold(dataset.toDF.rdd, numFolds, seed)` on the same
    * cached frame (per-partition seeded sampling: same plan, same
    * partitioning, same folds). The replay is self-verifying: the
    * per-fold mean must reproduce the engine's avgMetric to 1e-6;
    * on drift (an engine-version change to kFold, nondeterministic
    * re-partitioning) the sweep DEGRADES to avg-only rows — std_f1_uu
    * NULL, loud warning — rather than either failing the caller or
    * reporting a dispersion computed on the wrong folds. The kFold
    * replay contract itself is pinned by MlSpec's "MLUtils.kFold replay
    * contract" test so an upstream change surfaces in CI first.
    *
    * A NaN fold metric (a degenerate fold missing a label class, e.g.
    * numFolds=2 on tiny data) fails fast with a targeted message — the
    * old floor-to-0 silently mislabeled `is_best`. Ties on the best
    * avg metric mark EVERY tied row `is_best` (a deliberate
    * report-all-winners semantics, not first-wins).
    *
    * Scale: fits = numFolds × |grid| full pipelines, dispatched
    * `parallelism` at a time — each fit is the distributed row-21/22
    * path; the sweep adds breadth, not a new shuffle shape. The
    * per-fold re-evaluation adds numFolds × |grid| transform+evaluate
    * passes (no extra fits), dispatched on the same-width thread pool:
    * each pass is a small job whose scheduler latency, not compute,
    * dominates — serializing them would leave the cluster idle between
    * jobs. */
  def cvSweep(labeled: DataFrame, algo: String = "lr",
              regParams: Seq[Double] = Seq(0.01, 0.1, 0.3),
              numFolds: Int = 3, seed: Long = 100L,
              vocabSize: Int = 4096): DataFrame = {
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    val spark = labeled.sparkSession
    import spark.implicits._
    val est = pipeline(algo, vocabSize)
    val grid = est.getStages.last match {
      case h: LinearSVC =>
        new ParamGridBuilder().addGrid(h.regParam, regParams).build()
      case h: LogisticRegression =>
        new ParamGridBuilder().addGrid(h.regParam, regParams).build()
      case h: NaiveBayes =>
        new ParamGridBuilder().addGrid(h.smoothing, regParams).build()
      case other => throw new IllegalArgumentException(
        s"cvSweep has no regularizer grid for head $other")
    }
    val eval = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName("f1")
    val cv = new CrossValidator()
      .setEstimator(est)
      .setEvaluator(eval)
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds)
      .setSeed(seed)
      .setParallelism(math.min(8, numFolds * grid.length))
      .setCollectSubModels(true)
    // cache for the folds×grid re-reads AND the fold replay below,
    // release before returning (the LinkGraph cache-lifetime rule: a
    // bench session runs hundreds of queries in one JVM)
    labeled.cache()
    val (avgMetrics, perFold) =
      try {
        val model = cv.fit(labeled)
        // replay CrossValidator.fit's own split on the same cached frame
        // → identical folds; evaluate each collected sub-model on its
        // validation fold for the true per-fold metric
        val schema = labeled.schema
        val validations = org.apache.spark.mllib.util.MLUtils
          .kFold(labeled.toDF().rdd, numFolds, seed)
          .map { case (_, validation) =>
            spark.createDataFrame(validation, schema) }
        val cachedFolds = validations.map(_.cache())
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, numFolds * grid.length))
        val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
        val pf =
          try {
            val futures = cachedFolds.toSeq.zipWithIndex.map { case (vd, f) =>
              grid.indices.map { g =>
                scala.concurrent.Future {
                  // evaluator params are read-only here but the instance
                  // is not documented thread-safe — one per task
                  new MulticlassClassificationEvaluator()
                    .setLabelCol("label").setPredictionCol("prediction")
                    .setMetricName("f1")
                    .evaluate(model.subModels(f)(g).transform(vd))
                }(ec)
              }
            }
            futures.map(_.map(fut => scala.concurrent.Await.result(
              fut, scala.concurrent.duration.Duration.Inf)))
          } finally {
            pool.shutdown()
            cachedFolds.foreach(_.unpersist())
          }
        (model.avgMetrics, pf)
      } finally labeled.unpersist()
    val rows = grid.toSeq.zipWithIndex.map { case (pm, g) =>
      val rp = pm.toSeq
        .collectFirst { case p
            if p.param.name == "regParam" || p.param.name == "smoothing" =>
          p.value.asInstanceOf[Double] }
        .getOrElse(throw new IllegalStateException("no regularizer in grid"))
      val folds = perFold.map(_(g))
      folds.zipWithIndex.foreach { case (m, f) =>
        require(!m.isNaN, s"fold $f of grid point regParam=$rp evaluated " +
          "to NaN — a degenerate fold (likely a missing label class); " +
          "use fewer folds or more data") }
      val mean = folds.sum / numFolds
      val m = avgMetrics(g)
      // A NaN ENGINE metric must stay a loud failure, not degrade:
      // the degrade branch below would emit floor(NaN*1e6).toLong == 0
      // as an authoritative avg_f1_uu row. (The replayed folds are
      // NaN-checked above; this covers the engine's own folds.)
      require(!m.isNaN, s"CrossValidator avgMetric for grid point $rp " +
        "is NaN — a degenerate engine fold (likely a missing label " +
        "class); use fewer folds or more data")
      // Self-verification of the fold replay: the per-fold mean must
      // reproduce the engine's avgMetric. On drift — an engine-version
      // change to MLUtils.kFold's sampling, or nondeterministic
      // re-partitioning of the cached frame — DEGRADE to avg-only output
      // (std NULL) with a loud warning instead of failing the whole
      // sweep: avgMetrics is authoritative regardless (it comes from the
      // engine's own folds), only the dispersion depends on the replay.
      val replayOk = math.abs(mean - m) < 1e-6
      val std: Option[Long] =
        if (replayOk)
          Some(math.floor(math.sqrt(
            folds.map(x => (x - mean) * (x - mean)).sum / numFolds) * 1e6).toLong)
        else {
          System.err.println(
            s"WARN cvSweep: fold replay drifted from CrossValidator's own " +
              s"folds (per-fold mean $mean vs avgMetric $m, grid point " +
              s"$rp) — reporting avg_f1_uu with NULL std_f1_uu; the " +
              "MLUtils.kFold replay contract is pinned in MlSpec")
          None
        }
      (algo, math.round(rp * 1000), math.floor(m * 1e6).toLong, std)
    }
    val best = rows.map(_._3).max
    rows.map { case (a, rp, f, s) => (a, rp, f, s, f == best) }
      .toDF("algo", "reg_param_m", "avg_f1_uu", "std_f1_uu", "is_best")
  }

  /** F1 via MulticlassClassificationEvaluator
    * (ref Scalable_Project_ML_Model_Analysis.py:227-229). */
  def f1(preds: DataFrame): Double =
    new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName("f1")
      .evaluate(preds)

  /** Persist / restore the whole scoring pipeline as one artifact
    * (ref persists tokenizer/cv/idf/svm separately;
    * Scalable_Project_SVM_Model_Deployment.py:126-237). */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** Top-|weight| vocabulary terms of a fitted linear pipeline — the
    * reference's top-coefficient inspection
    * (/root/reference/Scalable_Project_ML_Model_Analysis.py, "top features")
    * as a DataFrame instead of a driver-side printout. Works for LinearSVC
    * and LogisticRegression heads (anything exposing `coefficients`). */
  def topCoefficients(spark: SparkSession, model: PipelineModel,
                      n: Int = 20): DataFrame = {
    import org.apache.spark.ml.feature.CountVectorizerModel
    val vocab = model.stages.collectFirst {
      case cv: CountVectorizerModel => cv.vocabulary
    }.getOrElse(throw new IllegalArgumentException("no CountVectorizer stage"))
    val coefs = model.stages.last match {
      case m: org.apache.spark.ml.classification.LinearSVCModel => m.coefficients
      case m: org.apache.spark.ml.classification.LogisticRegressionModel => m.coefficients
      case other => throw new IllegalArgumentException(
        s"no linear coefficients on ${other.getClass.getSimpleName}")
    }
    import spark.implicits._
    vocab.zipWithIndex
      .map { case (term, i) => (term, coefs(i)) }
      .sortBy { case (_, w) => -math.abs(w) }
      .take(n).toSeq.toDF("term", "weight")
  }
}
