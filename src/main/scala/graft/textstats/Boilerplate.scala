package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet/RefinedWeb-style line-level boilerplate removal: a (normalized)
  * line appearing in more than `maxDocs` distinct documents is boilerplate
  * — cookie banners, nav bars, license headers — and is dropped from EVERY
  * document; each document is reassembled in original line order. Document-
  * level dedup never catches these (the documents differ); line-level
  * frequency does.
  *
  * Shuffle economics at 100 TB: the doc-frequency aggregation shuffles
  * (line-hash, doc-id) pairs — never line text; the hot set (lines ABOVE
  * the threshold) is small by construction — boilerplate has few DISTINCT
  * lines, that is the point — so the drop is a broadcast anti-join probed
  * at the scan. The only full-width shuffle is the per-document rebuild
  * groupBy, inherent to reassembly. Lines diamond (feeds the count and the
  * anti-join) is persisted once.
  */
object Boilerplate {

  /** Returns (idCol, textCol) with hot lines removed; documents whose every
    * line was hot disappear (callers wanting empty husks can left-join the
    * originals back). Lines are trim-normalized both for counting and in
    * the rebuilt text.
    *
    * Collision mode, stated honestly: doc-frequency is counted on
    * `xxhash64(line)`, so two DISTINCT lines colliding in 64 bits would
    * merge their counts and could delete a legitimate line corpus-wide —
    * silent data loss, not an error. Expected collisions among d distinct
    * lines ≈ d²/2⁶⁵: negligible through ~10⁸ distinct lines, but at
    * 100 TB line cardinalities (10¹⁰+) confirm candidates against the
    * line STRING before the anti-join (one extra semi-join over the small
    * hot set) — or hash with two independent seeds. */
  def removeHotLines(df: DataFrame, idCol: String, textCol: String,
                     maxDocs: Int): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    // regexp, not trim(): trim strips only ASCII spaces (tab-padded
    // boilerplate variants would evade the count) — \s+ unifies them
    val lines = graft.Guards.materialize(df
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .select(col(idCol), col("pos"),
        regexp_replace(col("col"), "^\\s+|\\s+$", "").as("line"))
      .withColumn("lh", xxhash64(col("line"))))
    // EMPTY normalized lines are exempt from hotness: '' is the most
    // frequent "line" in any real corpus (every blank separator), so
    // counting it would mark it hot and silently delete every paragraph
    // break corpus-wide — the CCNet implementations exempt blanks for
    // exactly this reason
    val hot = lines.filter(col("line") =!= "").groupBy("lh")
      .agg(countDistinct(col(idCol)).as("__dfd"))
      .filter(col("__dfd") > maxDocs)
      .select("lh")
    lines.join(broadcast(hot), Seq("lh"), "left_anti")
      .groupBy(idCol)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line")), "\n").as(textCol))
  }
}
