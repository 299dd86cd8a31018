package graft

import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

import graft.ml.{QualityClassifier, Sentiment}
import graft.sources.Tables

/** Sixth adversarial batch — value-pinning the LINEAR-MODEL prediction
  * rows (q14 SVM, q165 LR, q36 hashing-SVM, q111 quality classifier)
  * and the NB row (q166): given the TRAINED parameters, every
  * prediction is a deterministic function of the feature vector, so the
  * head is replayed locally — margin = Σ_k x[k]·w[idx[k]] (ascending
  * sparse-index accumulation, the BLAS.dot convention) + intercept for
  * the linear heads, per-class score = π_c + Σ_k x[k]·θ[c, idx[k]]
  * with first-max argmax for multinomial NB, and the LR probability as
  * 1/(1+e^{−margin}). Equality is BIT-exact on the engine's raw margins
  * and row-for-row on predictions — moving these five rows-only entries
  * from invariant-pinned (F1 floors, determinism) to value-pinned: a
  * drift in the engine's scoring path, vector layout, or tie-breaking
  * fails an equality here, not just a quality floor. (Training itself —
  * the iterative LBFGS/SMO fit — remains the documented rows-only
  * justification; what is pinned is that the DECLARED OUTPUT follows
  * exactly from the trained parameters.) */
class AdversarialPropertySpec6 extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Sentiment.prepare(Tables.documents(spark, sfDir))

  /** BLAS.dot(sparse x, dense w): ascending-index accumulate in double. */
  private def marginOf(features: Vector, coef: Vector,
                       intercept: Double): Double = {
    var s = 0.0
    features match {
      case sv: SparseVector =>
        var k = 0
        while (k < sv.indices.length) {
          s += sv.values(k) * coef(sv.indices(k)); k += 1
        }
      case dv: DenseVector =>
        var i = 0
        while (i < dv.size) { s += dv(i) * coef(i); i += 1 }
    }
    s + intercept
  }

  private def linearCase(algo: String, hashing: Boolean): Unit = {
    val (model, _, preds) = Sentiment.trainEval(docs, algo, seed = 100L,
      vocabSize = 1024, hashing = hashing)
    val (coef, intercept) = model.stages.last match {
      case m: org.apache.spark.ml.classification.LinearSVCModel =>
        (m.coefficients, m.intercept)
      case m: org.apache.spark.ml.classification.LogisticRegressionModel =>
        (m.coefficients, m.intercept)
    }
    // LinearSVC emits no probability column — select it only for lr
    val p1 = if (algo == "lr")
      element_at(vector_to_array(col("probability")), 2)
    else lit(null).cast("double")
    val rows = preds.select(col("tfidf"),
        element_at(vector_to_array(col("rawPrediction")), 2).as("raw1"),
        col("prediction"), p1.as("p1"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getAs[Vector](0)
      val m = marginOf(x, coef, intercept)
      // the engine's raw margin must be OUR margin bit-for-bit
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(m),
        s"$algo raw margin drifted: engine ${r.getDouble(1)} vs replay $m")
      // decision rule: margin > 0 → 1.0 (both heads at default threshold)
      assert(r.getDouble(2) == (if (m > 0.0) 1.0 else 0.0),
        s"$algo prediction drifted at margin $m")
      if (algo == "lr") {
        // the engine fills P(class 0) = 1/(1+e^m) first and derives
        // P(class 1) = 1 − P(0): the complement association, NOT the
        // textbook 1/(1+e^−m) — off by an ulp if replayed the wrong way
        val p = 1.0 - 1.0 / (1.0 + math.exp(m))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
          java.lang.Double.doubleToLongBits(p),
          s"lr probability drifted: engine ${r.getDouble(3)} vs replay $p " +
            s"(textbook ${1.0 / (1.0 + math.exp(-m))})")
      }
    }
  }

  test("q14 LinearSVC predictions == local margin replay (bit-exact raw " +
    "margins, row-for-row decisions)") {
    linearCase("svm", hashing = false)
  }

  test("q165 LogisticRegression predictions AND probabilities == local " +
    "sigmoid-margin replay") {
    linearCase("lr", hashing = false)
  }

  test("q36 HashingTF+LinearSVC predictions == local margin replay " +
    "(the no-vocab featurization changes x, never the head's arithmetic)") {
    linearCase("svm", hashing = true)
  }

  test("q166 multinomial NaiveBayes == local per-class log-likelihood " +
    "replay with first-max argmax") {
    val (model, _, preds) = Sentiment.trainEval(docs, "nb", seed = 100L,
      vocabSize = 1024)
    val nb = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.NaiveBayesModel]
    val pi = nb.pi.toArray          // log class priors
    val theta = nb.theta            // numClasses × numFeatures log-likelihoods
    val rows = preds.select(col("tf"),
        vector_to_array(col("rawPrediction")).as("raw"),
        col("prediction")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getAs[Vector](0)
      val raw = r.getSeq[Double](1).toArray
      // the engine computes θ·x first and axpy's π in AFTERWARDS — the
      // association (Σ terms) + π, not π + Σ terms; replaying the wrong
      // order is a reproducible 1-ulp drift
      val scores = Array.tabulate(pi.length) { c =>
        var s = 0.0
        x match {
          case sv: SparseVector =>
            var k = 0
            while (k < sv.indices.length) {
              s += sv.values(k) * theta(c, sv.indices(k)); k += 1
            }
          case dv: DenseVector =>
            var i = 0
            while (i < dv.size) { s += dv(i) * theta(c, i); i += 1 }
        }
        s + pi(c)
      }
      // class scores bit-exact, then the engine's own first-max argmax
      scores.indices.foreach { c =>
        assert(java.lang.Double.doubleToLongBits(raw(c)) ==
          java.lang.Double.doubleToLongBits(scores(c)),
          s"nb class-$c score drifted: engine ${raw(c)} vs ${scores(c)}")
      }
      val amax = scores.indices.maxBy(c => (scores(c), -c))
      assert(r.getDouble(2) == amax.toDouble,
        s"nb argmax drifted: engine ${r.getDouble(2)} vs $amax " +
          s"(${scores.mkString(",")})")
    }
  }

  test("q167/q50 F1 == local weighted-F1 replay from confusion counts " +
    "(bit-exact: the engine's per-class division/association order)") {
    // the evaluator's \"f1\" is MulticlassMetrics.weightedFMeasure —
    // per class c: p = tp/(tp+fp), r = tp/(tp+fn),
    // f1_c = (1+β²)·p·r / (β²·p + r) at β=1, then Σ (f1_c·n_c)/N.
    // All counts are exact small integers in double, divisions replayed
    // in the engine's order; binary labels make the 2-term sum
    // order-insensitive (IEEE addition is commutative) — so the scalar
    // behind q167 (and q50's per-algo column) is a deterministic
    // function of the prediction rows Spec6 already value-pins.
    val (_, engineF1, preds) = Sentiment.trainEval(docs, "svm",
      seed = 100L, vocabSize = 1024)
    val rows = preds.select("label", "prediction").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val labels = rows.map(_._1).distinct.sorted
    val total = rows.length.toDouble
    val replay = labels.map { c =>
      val tp = rows.count { case (l, p) => l == c && p == c }.toDouble
      val fp = rows.count { case (l, p) => l != c && p == c }.toDouble
      val fn = rows.count { case (l, p) => l == c && p != c }.toDouble
      val nC = rows.count(_._1 == c).toDouble
      val p = if (tp + fp == 0) 0.0 else tp / (tp + fp)
      val r = if (tp + fn == 0) 0.0 else tp / (tp + fn)
      val f1c = if (p + r == 0) 0.0 else (1 + 1.0) * p * r / (1.0 * p + r)
      f1c * nC / total
    }.sum
    assert(java.lang.Double.doubleToLongBits(replay) ==
      java.lang.Double.doubleToLongBits(engineF1),
      s"weighted F1 drifted: engine $engineF1 vs replay $replay")
    // and the declared q167 value is its floor in micro-units
    assert(math.floor(engineF1 * 1e6).toLong ==
      math.floor(replay * 1e6).toLong)
  }

  test("q111 quality classifier: p_good_uu and pred_good == local " +
    "sigmoid-margin replay over the engine's feature vectors") {
    val raw = Tables.documents(spark, sfDir)
    val (featurizer, lr) = QualityClassifier.train(raw, "doc_id", "text")
    val declared = QualityClassifier.score(raw, "doc_id", "text",
        featurizer, lr)
      .select("id", "p_good_uu", "pred_good").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // the same featurization the scorer runs (null-safe text), replayed
    // only through the HEAD locally
    val feats = featurizer.transform(
        raw.select(col("doc_id").as("id"),
          coalesce(col("text"), lit("")).as("text")))
      .select("id", "tfidf").collect()
    assert(feats.nonEmpty && feats.length == declared.size)
    feats.foreach { r =>
      val id = r.getLong(0)
      val m = marginOf(r.getAs[Vector](1), lr.coefficients, lr.intercept)
      val p = 1.0 / (1.0 + math.exp(-m))
      val (pUu, pred) = declared(id)
      assert(pUu == math.floor(p * 1e6).toLong,
        s"doc $id p_good_uu drifted: declared $pUu vs replay $p")
      assert(pred == (if (m > 0.0) 1 else 0),
        s"doc $id pred_good drifted at margin $m")
    }
  }
}
