package graft

import org.apache.spark.sql.functions._

import graft.ml.QualityClassifier

/** Classifier quality filter: planted fluent-vs-garbled separation,
  * probability bounds, and full-corpus coverage. */
class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  // fluent prose (long, low stopword-free ratio variance) vs garbled
  // fragments (short, no stopwords) — separable by the weak labeler AND
  // by token features, so the classifier must recover the split
  private val fluent = (0L until 30L).map { i =>
    (i, ("the quick brown fox jumps over the lazy dog and then " +
      s"wanders through the quiet forest path number $i looking for " +
      "food and shelter before the long winter arrives in the valley"))
  }
  private val garbled = (100L until 130L).map { i =>
    (i, s"zx$i qq#@ t$i")
  }

  test("fluent docs score above garbled docs; every doc scored once") {
    val docs = (fluent ++ garbled).toDF("doc_id", "text")
    val out = QualityClassifier.trainScore(docs, "doc_id", "text",
      numFeatures = 512).collect()
    assert(out.length == 60, "one row per input document")
    val p = out.map(r => r.getAs[Long]("id") -> r.getAs[Long]("p_good_uu"))
      .toMap
    assert(p.values.forall(v => v >= 0L && v <= 1000000L),
      "probabilities must be micro-units in [0, 1e6]")
    val fluentMin = fluent.map(f => p(f._1)).min
    val garbledMax = garbled.map(g => p(g._1)).max
    assert(fluentMin > garbledMax,
      s"classifier failed to separate: fluent min $fluentMin <= " +
        s"garbled max $garbledMax")
    // predictions agree with the separation
    val pred = out.map(r => r.getAs[Long]("id") -> r.getAs[Int]("pred_good"))
      .toMap
    assert(fluent.forall(f => pred(f._1) == 1))
    assert(garbled.forall(g => pred(g._1) == 0))
  }

  test("NULL text scores as empty (no NPE) with a null q_bp") {
    val docs = (fluent ++ garbled).toDF("doc_id", "text")
      .unionByName(Seq((999L, Option.empty[String])).toDF("doc_id", "text"))
    val out = QualityClassifier.trainScore(docs, "doc_id", "text",
      numFeatures = 512)
    val row = out.filter(col("id") === 999L).collect().head
    assert(row.isNullAt(row.fieldIndex("q_bp")),
      "null text must keep a null heuristic score")
    val p = row.getAs[Long]("p_good_uu")
    assert(p >= 0L && p <= 1000000L, s"null-text probability bounds: $p")
  }

  test("labelQuantile is validated") {
    val docs = fluent.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      QualityClassifier.trainScore(docs, "doc_id", "text",
        labelQuantile = 0.5)
    }
  }
}
