package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the cross-table half of row 163's
  * declarative quality rules (those are row-local; foreign keys need a
  * join): for every declared child.fk → parent.pk pair, how many child
  * rows exist, how many are ORPHANS (non-null FK with no parent row),
  * how many carry a NULL FK, and the orphan rate in bp. The ingest gate
  * run before any join-dependent pipeline ships — an orphan rate that
  * moved is an upstream extraction bug caught here, not as silently
  * shrunken join output three stages later.
  *
  * Shape: per pair, the parent's DISTINCT key frame (dimension-sized,
  * broadcastable — AQE decides) left-joins under the child scan and ONE
  * map-side-combined indicator aggregate reduces it; child rows never
  * shuffle beyond the key. NULL FKs are counted separately, never as
  * orphans — SQL FK semantics, where NULL means "no reference", not "a
  * broken one". */
object Integrity {

  /** One row per declared pair: (fk_name, n_rows, n_orphans, n_null_fk,
    * orphan_bp). */
  def fkAudit(pairs: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(pairs.nonEmpty, "fkAudit needs at least one FK pair")
    pairs.map { case (name, child, fk, parent, pk) =>
      val p = parent.select(col(pk).as("__pk")).distinct()
      child.select(col(fk).as("__fk"))
        .join(p, col("__fk") === col("__pk"), "left")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("__fk").isNotNull && col("__pk").isNull, 1L)
            .otherwise(0L)).as("n_orphans"),
          sum(when(col("__fk").isNull, 1L).otherwise(0L)).as("n_null_fk"))
        .select(lit(name).as("fk_name"), col("n_rows"), col("n_orphans"),
          col("n_null_fk"),
          expr("(10000 * n_orphans) div greatest(n_rows, 1)")
            .as("orphan_bp"))
    }.reduce(_ unionAll _)
  }
}
