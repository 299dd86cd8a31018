package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Class-based TF-IDF — "what characterizes this source/cluster", the
  * BERTopic c-TF-IDF formulation (Grootendorst 2022): each class is
  * treated as ONE concatenated document, so a term scores high for a
  * class when it is frequent THERE and rare corpus-wide. The
  * source-auditing companion to per-document keywords (row 78): mixture
  * decisions need "what is src7 actually full of", not per-doc signals.
  *
  *   score_u(t, c) = tf_{t,c} · idf_u(t)
  *   idf_u(t)     = ⌊ln((f_t + A) / f_t) · 10⁶⌋      (= ln(1 + A/f_t))
  *
  * with f_t the corpus-wide count of t and A = total_tokens div n_classes
  * (the average class mass, integer division by design). Exactness is the
  * q104 recipe: integer counts, ONE correctly-rounded double division,
  * one ln·10⁶ floor per term (the documented q77 libm-ulp caveat), then
  * int64 products — engine-replayable bit-for-bit.
  *
  * Scale shape: tf is one map-side-combined (class, token) aggregate
  * (token instances never shuffle as rows); f_t and the single-row totals
  * are aggregates OF tf; idf broadcasts back onto tf via the token join;
  * per-class top-k runs on the typed [[graft.functions.TopKStrAggregator]]
  * — map-side partials cap each partition at k rows per class, so the
  * class-vocabulary-sized window sort the row_number formulation needs
  * never happens. */
object ClassTfIdf {

  /** (classCol, token, score_u, rank): the top-`k` distinctive terms per
    * class by (score_u desc, token asc). */
  def topClassTerms(docs: DataFrame, classCol: String, textCol: String,
                    k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs
      .select(col(classCol).cast("string").as("__c"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("__c", "token")
      .agg(count(lit(1)).as("tf"))
    val ft = tf.groupBy("token").agg(sum("tf").as("ft"))
    val tot = tf.agg(sum("tf").as("tot"),
      countDistinct("__c").as("nc"))
    val idf = ft.crossJoin(broadcast(tot))
      .withColumn("__a", expr("tot div nc"))
      .withColumn("idf_u",
        floor(log((col("ft") + col("__a")).cast("double") /
          col("ft").cast("double")) * 1e6).cast("long"))
      .select("token", "idf_u")
    val scored = tf.join(idf, "token")
      .select(col("__c"), col("token"),
        (col("tf") * col("idf_u")).as("score_u"))
    val topk = new graft.functions.TopKStrAggregator(k).toColumn
    scored.as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, t, s) => (t, s) }
      .agg(topk.name("topk"))
      .toDF(classCol, "topk")
      .select(col(classCol), posexplode(col("topk")))
      .select(col(classCol), col("col._1").as("token"),
        col("col._2").as("score_u"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
