package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.textstats.TextStats

/** Classifier-based quality filtering — the third leg of the quality
  * triad (heuristic score: TextStats.qualityScore/q23; LM perplexity:
  * LmScore/q77; learned classifier: here), the CCNet/GPT-3-style
  * component: train a linear classifier to separate "good" from "bad"
  * text, score the whole corpus, filter on the probability. Reference
  * pipelines label with a trusted corpus (Wikipedia) vs the raw crawl;
  * the self-contained variant weak-labels from the heuristic score's own
  * quantiles (top tercile positive, bottom negative, middle unlabeled) so
  * the driver row needs no external corpus — swapping the labeler for a
  * trusted/raw split is a one-line change at the `labeled` frame.
  *
  * Featurization is the declared 100 TB path: HashingTF (no driver-side
  * vocabulary fit) → IDF, shared with q36 via [[Featurize.pipeline]].
  * Training data is the labeled subset (bounded by the quantile gates);
  * scoring is one model.transform over the corpus — embarrassingly
  * parallel, no shuffle beyond the featurize pipeline's own.
  *
  * Rows-only by the q14/q36/q50 justification: LR probabilities are
  * float-iterative and engine-specific; QualityClassifierSpec pins the
  * semantics instead (planted garbled-vs-fluent separation, probability
  * bounds, one output row per input).
  */
object QualityClassifier {

  /** Train the featurizer + classifier on the weakly-labeled terciles.
    * Both halves are standard ML writables, so callers can persist them
    * once (the train-once/score-many split every production quality
    * filter runs — see the q111 staged declaration). */
  def train(docs: DataFrame, idCol: String, textCol: String,
            numFeatures: Int = 4096, labelQuantile: Double = 0.3)
      : (PipelineModel, LogisticRegressionModel) = {
    require(labelQuantile > 0 && labelQuantile < 0.5,
      s"labelQuantile must be in (0, 0.5), got $labelQuantile")
    // null text drops out of labeling naturally (null q_bp fails both
    // quantile gates); the quantiles themselves ignore nulls too
    val scored = docs.select(col(idCol).as("id"), col(textCol).as("text"),
      TextStats.qualityScore(col(textCol)).as("q_bp"))
    // exact percentile (integral column) — deterministic weak-label gates
    val thr = scored.agg(expr(
      s"percentile(q_bp, array($labelQuantile, ${1 - labelQuantile}))")
      .as("t")).head().getSeq[Double](0)
    val (lo, hi) = (thr(0), thr(1))
    // lo == hi means both gates select the same mass and every labeled
    // row would get label 1 — a silently degenerate all-"good" classifier
    // on a low-variance (boilerplate-heavy) corpus; fail loudly instead
    require(lo < hi,
      s"quality distribution is degenerate (p$labelQuantile == " +
        s"p${1 - labelQuantile} == $lo): weak labeling needs separable " +
        "terciles — label from a trusted/raw corpus split instead")
    val labeled = scored
      .filter(col("q_bp") <= lo || col("q_bp") >= hi)
      .withColumn("label", when(col("q_bp") >= hi, 1.0).otherwise(0.0))
    val featurizer = Featurize.pipeline(
      inputCol = "text", vocabSize = numFeatures, hashing = true)
      .fit(labeled)
    // maxIter bounded the q14 way: the bench measures pipeline overhead,
    // not model capacity, and the weakly-labeled split separates in few
    // iterations (each LBFGS iteration is a full treeAggregate job)
    val model = new LogisticRegression()
      .setFeaturesCol("tfidf").setLabelCol("label")
      .setMaxIter(10).setRegParam(0.01)
      .fit(featurizer.transform(labeled))
    (featurizer, model)
  }

  /** Score every document with a trained (featurizer, classifier) pair:
    * (id, q_bp, p_good_uu, pred_good) — heuristic score, probability of
    * "good" in micro-units, 0/1 prediction. One transform over the
    * corpus, no training work. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            featurizer: PipelineModel,
            model: LogisticRegressionModel): DataFrame = {
    // NULL text featurizes as "" (spark.ml Tokenizer's udf NPEs on null,
    // which would kill the whole job for one bad row); q_bp stays the raw
    // column's score (null) so the caller can still see the row was empty
    val scored = docs.select(col(idCol).as("id"),
      coalesce(col(textCol), lit("")).as("text"),
      TextStats.qualityScore(col(textCol)).as("q_bp"))
    model.transform(featurizer.transform(scored))
      .select(col("id"), col("q_bp"),
        floor(element_at(vector_to_array(col("probability")), 2) * 1e6)
          .cast("long").as("p_good_uu"),
        col("prediction").cast("int").as("pred_good"))
  }

  /** [[train]] + [[score]] in one call — the self-contained form the
    * spec exercises. */
  def trainScore(docs: DataFrame, idCol: String, textCol: String,
                 numFeatures: Int = 4096, labelQuantile: Double = 0.3)
      : DataFrame = {
    val (featurizer, model) =
      train(docs, idCol, textCol, numFeatures, labelQuantile)
    score(docs, idCol, textCol, featurizer, model)
  }
}
