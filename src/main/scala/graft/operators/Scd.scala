package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD Type 2) build — the Kimball warehouse
  * staple: collapse a change log into effective-dated attribute versions,
  * one row per key per DISTINCT attribute state, valid over
  * [eff_start_us, eff_end_us) with the current version open (NULL end).
  * No-op updates (consecutive log rows with an unchanged attribute tuple)
  * are dropped — the change-detection half real CDC feeds need, since
  * upstream systems re-emit rows they didn't change. The versioned output
  * is what row 54's as-of join / row 55's range join probe: build here,
  * probe there.
  *
  * Change detection is a per-key lag compare on the attribute STRUCT
  * (null-safe: a NULL attribute equals NULL — absence is a state, not a
  * change); version numbers and end timestamps are a per-key row_number /
  * lead over the surviving change rows. Every window partitions by key
  * and is bounded by that key's history — the engine's partitioned-window
  * rule, never a corpus frame. Ties at the same timestamp order by the
  * caller's tie column so both engines agree on a total order.
  */
object Scd {

  /** (key, attrs..., eff_start_us, eff_end_us, version) — one row per
    * distinct consecutive attribute state per key. `tsUsCol` is epoch
    * micros (long); `tieCol` breaks same-instant ties deterministically.
    * Null-key rows are excluded (no principal to version). */
  def buildScd2(df: DataFrame, keyCol: String, tsUsCol: String,
                tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "buildScd2 needs attribute columns")
    val w = Window.partitionBy(keyCol).orderBy(col(tsUsCol), col(tieCol))
    val state = struct(attrCols.map(col): _*)
    val changes = df
      .filter(col(keyCol).isNotNull && col(tsUsCol).isNotNull)
      .withColumn("__prev", lag(state, 1).over(w))
      // first row per key (lag null — the struct itself is never null)
      // or a null-safe attribute change
      .filter(col("__prev").isNull || not(state <=> col("__prev")))
      .drop("__prev")
    val w2 = Window.partitionBy(keyCol).orderBy(col(tsUsCol), col(tieCol))
    changes
      .withColumn("eff_start_us", col(tsUsCol))
      .withColumn("eff_end_us", lead(col(tsUsCol), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("int"))
      .select((keyCol +: attrCols).map(col) ++
        Seq(col("eff_start_us"), col("eff_end_us"), col("version")): _*)
  }
}
