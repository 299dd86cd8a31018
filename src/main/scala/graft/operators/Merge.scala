package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC / MERGE apply — the lakehouse upsert primitive (Delta/Iceberg
  * `MERGE INTO`, re-expressed relationally): a corpus snapshot plus a
  * change batch (insert / update / delete per id) yields the next
  * snapshot. The maintenance shape every living corpus needs — takedowns
  * are deletes, re-crawls are updates, new shards are inserts — without
  * rewriting history by hand.
  *
  * Semantics, all documented:
  *   - delete removes the id (an unmatched delete is a no-op);
  *   - insert and update are both UPSERT (replace when matched, add when
  *     not) — the idempotent behavior a replayed CDC feed needs; the
  *     distinction is kept in the API because audits care which was
  *     intended;
  *   - ops outside the closed set raise (`raise_error`), loudly, at
  *     execution — a typo'd op must not silently drop a change;
  *   - ONE change per id per batch is the caller contract (enforce
  *     upstream with [[graft.dedup.ExactDedup.keepFirst]] on the feed);
  *     duplicate change ids would fan out the join.
  *
  * Scale shape: one full-outer equi-join on the id — both sides shuffle
  * once on the key, nothing else moves; payload columns ride the join,
  * coalesced per side. At 100 TB this is the standard copy-on-write
  * merge pass, and the id-bucketed layout (row 47) makes it
  * exchange-free. */
object Merge {

  /** Apply `changes` (idCol, `opCol`, payload columns named as in
    * `base`) to snapshot `base`; returns the next snapshot with `base`'s
    * column set. */
  def applyChanges(base: DataFrame, changes: DataFrame, idCol: String,
                   opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == idCol).toSeq
    val ch = changes.select(
      (col(idCol).as("__cid") +: col(opCol).as("__op") +:
        payload.map(c => col(c).as(s"__c_$c"))): _*)
    // the no-matching-change sentinel is CHANGE-SIDE PRESENCE (__cid),
    // never __op: a change row carrying a NULL op must hit the
    // raise_error branch (CASE NULL matches no WHEN), not silently
    // no-op when matched — or worse, insert a ghost all-NULL-payload
    // row when unmatched
    base.join(ch, col(idCol) === col("__cid"), "full_outer")
      .filter(expr(
        "__cid IS NULL OR CASE __op WHEN 'delete' THEN false " +
          "WHEN 'insert' THEN true WHEN 'update' THEN true " +
          "ELSE CAST(raise_error(concat('unknown merge op: ', " +
          "coalesce(__op, 'NULL'))) AS BOOLEAN) END"))
      .select(coalesce(col(idCol), col("__cid")).as(idCol) +:
        payload.map(c =>
          when(col("__cid").isNotNull, col(s"__c_$c"))
            .otherwise(col(c)).as(c)): _*)
  }
}
