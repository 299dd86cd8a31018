package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{CountVectorizer, HashingTF, IDF, StopWordsRemover, Tokenizer}
import org.apache.spark.sql.DataFrame

/** Text featurization: Tokenizer → StopWordsRemover → CountVectorizer → IDF,
  * the reference's chain (/root/reference/Scalable_Project_ML_Model_Analysis.py:99-158)
  * as a single spark.ml `Pipeline` (instead of four hand-sequenced
  * transforms), so it persists/loads as one artifact and `transform` works
  * identically on batch and streaming frames.
  *
  * `vocabSize` is bounded: at 100 TB an unbounded CountVectorizer vocabulary
  * is a driver-memory incident; the reference's unbounded default is not
  * preserved deliberately.
  */
object Featurize {

  /** Custom stopwords from the reference EDA (Scalable_EDA_Final.py:65-67). */
  val customStopwords: Array[String] = Array("one", "s")

  def pipeline(inputCol: String = "text",
               vocabSize: Int = 4096,
               minDF: Double = 1.0,
               extraStopwords: Array[String] = customStopwords,
               hashing: Boolean = false): Pipeline = {
    val tok = new Tokenizer()
      .setInputCol(inputCol).setOutputCol("words")
    val sw = new StopWordsRemover()
      .setInputCol("words").setOutputCol("words_nsw")
      .setStopWords(StopWordsRemover.loadDefaultStopWords("english") ++ extraStopwords)
    // CountVectorizer matches the reference; HashingTF is the 100 TB path —
    // no vocabulary fit (the CV vocab is collected ON THE DRIVER), one less
    // full pass over the corpus, at the cost of hash-bucket collisions and
    // no term names for coefficient inspection.
    val tf = if (hashing)
      new HashingTF().setInputCol("words_nsw").setOutputCol("tf")
        .setNumFeatures(vocabSize)
    else
      new CountVectorizer().setInputCol("words_nsw").setOutputCol("tf")
        .setVocabSize(vocabSize).setMinDF(minDF)
    val idf = new IDF()
      .setInputCol("tf").setOutputCol("tfidf")
    new Pipeline().setStages(Array(tok, sw, tf, idf))
  }

  def fit(df: DataFrame, inputCol: String = "text",
          vocabSize: Int = 4096): PipelineModel =
    pipeline(inputCol, vocabSize).fit(df)
}
