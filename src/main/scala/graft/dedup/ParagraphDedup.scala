package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup with KEEP-FIRST semantics (the paragraph
  * granularity of Lee et al.'s "Deduplicating Training Data Makes Language
  * Models Better" exact-substring dedup): a paragraph keeps exactly its
  * first occurrence in the corpus — ordered by (doc id, position within
  * doc) — and every later occurrence is dropped; documents are reassembled
  * in original paragraph order. This is the complement of
  * [[graft.textstats.Boilerplate]]: boilerplate removal drops hot lines
  * from EVERY document (frequency threshold), keep-first retains one
  * canonical copy of EVERY repeated paragraph (dedup proper).
  *
  * Shuffle economics at 100 TB: keep-first is ONE aggregation, not a
  * join — groupBy(paragraph) with min(struct(id, pos)) is map-side
  * combined, so each partition ships one row per DISTINCT paragraph it
  * contains, and no "firsts" table is ever materialized or joined back.
  * Grouping is on the paragraph STRING, so there is no hash-collision
  * data-loss mode at all; at extreme cardinalities the key can be narrowed
  * to xxhash64(paragraph) at the cost of the collision mode documented on
  * [[graft.textstats.Boilerplate.removeHotLines]]. The per-document
  * rebuild groupBy is inherent to reassembly (same as Boilerplate's).
  */
object ParagraphDedup {

  /** Returns (idCol, n_paras, textCol): each document's surviving
    * paragraphs rejoined with `sep`, plus the surviving count. A document
    * whose every paragraph first occurred elsewhere disappears (its id
    * keeps no rows); callers wanting empty husks can left-join the
    * originals back. A paragraph repeated WITHIN one document also keeps
    * only its first position — same rule, no special case. */
  def keepFirst(df: DataFrame, idCol: String, textCol: String,
                sep: String = "\n"): DataFrame = {
    // split() takes a REGEX; the separator is a literal (quoted), so a
    // "|" or "." separator splits on the character, not the pattern
    val paras = df
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .select(col(idCol), col("pos"), col("col").as("para"))
    val kept = paras.groupBy("para")
      .agg(min(struct(col(idCol).as("id"), col("pos").as("pos"))).as("first"))
      .select(col("first").getField("id").as(idCol),
        col("first").getField("pos").as("pos"), col("para"))
    kept.groupBy(idCol).agg(
      count(lit(1)).as("n_paras"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          x => x("para")), sep).as(textCol))
  }
}
