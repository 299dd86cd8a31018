package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.textstats.TextStats

/** Row-level diff between two dataset versions by unique key — the
  * dataset-release audit ("what changed between v1 and v2?") run before
  * shipping a corpus refresh or accepting an upstream re-crawl: every key
  * classified `added` (v2 only), `removed` (v1 only), or `changed` (both,
  * different content); UNCHANGED rows — the overwhelming bulk of any real
  * refresh — are filtered out and never emitted.
  *
  * Content identity is the [[Profile.datasetFingerprint]] convention: the
  * q25 polynomial hash of the '|'-encoded `encodeCols` in two independent
  * base channels (31, 37), computed AT THE SCAN — the full-outer shuffle
  * join on the key (the one unavoidable co-location) carries (key, two
  * longs) per side, never the content. A false `unchanged` needs the same
  * key to collide in both channels simultaneously.
  *
  * Preconditions (documented, the fingerprint rule): `keyCol` unique per
  * side; `encodeCols` string forms canonical on both engines.
  */
object SnapshotDiff {

  def diff(v1: DataFrame, v2: DataFrame, keyCol: String,
           encodeCols: Seq[String]): DataFrame = {
    require(encodeCols.nonEmpty, "diff needs encode columns")
    def enc(df: DataFrame, tag: String) = {
      val e = concat_ws("|", encodeCols.map(c => col(c).cast("string")): _*)
      df.select(col(keyCol).as(s"__k_$tag"),
        TextStats.fingerprintBase(e, 31).as(s"__${tag}31"),
        TextStats.fingerprintBase(e, 37).as(s"__${tag}37"))
    }
    val status = when(col("__k_a").isNull, "added")
      .when(col("__k_b").isNull, "removed")
      .when(col("__a31") =!= col("__b31") || col("__a37") =!= col("__b37"),
        "changed")
    enc(v1, "a")
      .join(enc(v2, "b"), col("__k_a") === col("__k_b"), "full_outer")
      .select(coalesce(col("__k_a"), col("__k_b")).as(keyCol),
        status.as("status"))
      .filter(col("status").isNotNull)
  }
}
