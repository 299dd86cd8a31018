package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs per group.
  *
  * The window-function formulation of per-key top-k
  * (`row_number().over(partitionBy(key).orderBy(desc(score)))` then
  * `filter(rank <= k)`) shuffles EVERY scored row to the key's reducer and
  * sorts it there. This `Aggregator` runs inside a regular aggregation, so
  * map-side partial aggregation reduces each partition's contribution to at
  * most k rows BEFORE the exchange — for ANN scoring, the shuffle shrinks
  * from |corpus ∩ bucket| rows per query to k rows per (query, partition).
  * That difference is the whole game when scoring 100 TB of candidates.
  *
  * The buffer is a plain sorted list capped at k (k is small — top-10/100);
  * insertion keeps it ordered descending by (score, then ascending id for
  * determinism).
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), List[(Double, Long)], Seq[(Long, Double)]] {

  require(k > 0, "k must be positive")

  private def insert(buf: List[(Double, Long)],
                     score: Double, id: Long): List[(Double, Long)] = {
    // descending score, ascending id on ties
    val (better, worse) = buf.span { case (s, i) =>
      s > score || (s == score && i < id)
    }
    val merged = better ::: ((score, id) :: worse)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
                      row: (Long, Double)): List[(Double, Long)] =
    insert(buf, row._2, row._1)

  override def merge(a: List[(Double, Long)],
                     b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a) { case (acc, (s, i)) => insert(acc, s, i) }

  override def finish(buf: List[(Double, Long)]): Seq[(Long, Double)] =
    buf.map { case (s, i) => (i, s) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** String-payload sibling of [[TopKAggregator]] with EXACT int64 scores:
  * keeps the k largest (score_u, token) pairs per group, descending
  * score, ascending token on ties. Long scores stay long through the
  * buffer — no double round-trip, so integer micro-unit scores compare
  * exactly at any magnitude. Same scale story: map-side partial
  * aggregation caps each partition's shuffle contribution at k rows per
  * group, where the window formulation shuffles every scored row. */
class TopKStrAggregator(k: Int)
  extends Aggregator[(String, Long), List[(Long, String)], Seq[(String, Long)]] {

  require(k > 0, "k must be positive")

  private def insert(buf: List[(Long, String)],
                     score: Long, tok: String): List[(Long, String)] = {
    val (better, worse) = buf.span { case (s, t) =>
      s > score || (s == score && t < tok)
    }
    val merged = better ::: ((score, tok) :: worse)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Long, String)] = Nil

  override def reduce(buf: List[(Long, String)],
                      row: (String, Long)): List[(Long, String)] =
    insert(buf, row._2, row._1)

  override def merge(a: List[(Long, String)],
                     b: List[(Long, String)]): List[(Long, String)] =
    b.foldLeft(a) { case (acc, (s, t)) => insert(acc, s, t) }

  override def finish(buf: List[(Long, String)]): Seq[(String, Long)] =
    buf.map { case (s, t) => (t, s) }

  override def bufferEncoder: Encoder[List[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
