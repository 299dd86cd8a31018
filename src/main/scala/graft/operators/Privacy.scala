package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-ops primitives for a data pipeline that ships user-derived
  * corpora: the k-anonymity audit (Sweeney 2002 — how re-identifiable is
  * this table through its quasi-identifiers) and deterministic
  * pseudonymization with referential integrity (the same principal maps
  * to the same pseudonym EVERYWHERE, so joins and per-user aggregates
  * survive the identity scrub).
  */
object Privacy {

  /** k-anonymity group-size spectrum over the declared quasi-identifier
    * columns: one row per observed group SIZE with the number of QI
    * groups of that size, the rows they hold, and the at-risk flag
    * (size < k — rows whose QI combination is too rare to hide in).
    * The sizes-of-sizes reduction (the row-142 duplication-spectrum
    * shape): two map-side-combined aggregates, the first bounded by
    * distinct QI combinations, the second by distinct sizes. NULL QI
    * values form their own groups (SQL GROUP BY semantics) — absence is
    * itself a quasi-identifier. */
  def kAnonymitySpectrum(df: DataFrame, qiCols: Seq[String],
                         k: Int = 5): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymitySpectrum needs QI columns")
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__gs"))
      .groupBy(col("__gs").as("group_size"))
      .agg(count(lit(1)).as("n_groups"))
      .withColumn("n_rows", col("group_size") * col("n_groups"))
      .withColumn("at_risk", (col("group_size") < k).cast("long"))
  }

  /** Deterministic pseudonym for a key column: the portable q25
    * polynomial hash over `salt || '|' || key-as-string` — the same
    * engine-replayable recurrence as every fingerprint in the library,
    * so downstream systems (and the oracle) can verify the mapping
    * without a secret-key service. The salt separates domains (the same
    * user id pseudonymized for two datasets must not correlate).
    *
    * HONEST LIMITS, documented not hidden: a 30-bit-range hash is
    * pseudonymization (reversible by anyone holding the salt and the id
    * space — adequate for internal-leak surface reduction and
    * join-preserving test data), NOT anonymization; collisions are
    * possible at ~2¹⁵ keys (birthday bound on mod 1e9+7) and a
    * production deployment swaps in a keyed 128-bit PRF behind the same
    * column contract. Zero shuffles — a pure row expression. */
  def pseudonym(key: Column, salt: String): Column = {
    // '|' is the domain/key delimiter: a salt containing it makes the
    // encoding non-injective ACROSS domains (salt "prod|7" + key "x"
    // collides with salt "prod" + key "7|x"), quietly defeating the
    // must-not-correlate contract — refuse loudly
    require(!salt.contains("|"),
      s"pseudonym salt must not contain '|' (domain delimiter): '$salt'")
    graft.textstats.TextStats.fingerprintBase(
      concat(lit(salt), lit("|"), key.cast("string")), 31)
  }

  /** `df` with `keyCol` replaced by its pseudonym (original dropped,
    * output column named `pseudo`). Computed through a temp column so a
    * keyCol itself named "pseudo" survives the drop; any OTHER
    * pre-existing `pseudo` column is refused rather than silently
    * overwritten. */
  def pseudonymize(df: DataFrame, keyCol: String,
                   salt: String): DataFrame = {
    require(keyCol == "pseudo" || !df.columns.contains("pseudo"),
      "pseudonymize emits a column named 'pseudo', which already exists " +
        "in the input — rename it first")
    df.withColumn("__pseudo_tmp", pseudonym(col(keyCol), salt))
      .drop(keyCol)
      .withColumnRenamed("__pseudo_tmp", "pseudo")
  }

  /** Right-to-be-forgotten deletion audit — the GDPR/CCPA erasure
    * pre-flight: given a subject (deletion-request) list, report per
    * table how many rows a cascade would remove, how many survive, and
    * how many requested subjects actually appear there. Run BEFORE the
    * destructive pass (the numbers a DPO signs off on) and again after
    * (everything must read zero removed). Frames keyed by a PSEUDONYM
    * cascade too — map the subject list through [[pseudonym]] with the
    * frame's salt and audit on the pseudo key; that the mapping supports
    * this is exactly the documented pseudonymization (not anonymization)
    * contract.
    *
    * Scale shape: the subject list broadcasts (deletion requests are
    * tiny next to the corpus) onto each frame's scan; per frame ONE
    * map-side-combined indicator aggregate — no row ever shuffles.
    * NULL-key rows cannot match a subject and count as kept. */
  def deletionAudit(frames: Seq[(String, DataFrame, String)],
                    subjects: DataFrame, subjectCol: String): DataFrame = {
    require(frames.nonEmpty, "deletionAudit needs at least one frame")
    val subj = broadcast(
      subjects.select(col(subjectCol).as("__subj"))
        .filter(col("__subj").isNotNull).distinct())
    frames.map { case (name, df, keyCol) =>
      df.select(col(keyCol).as("__k"))
        .join(subj, col("__k") === col("__subj"), "left")
        .agg(
          count(lit(1)).as("rows_total"),
          // coalesce: sum over an EMPTY frame (post-deletion re-run, a
          // not-yet-populated table) is NULL — the sign-off report must
          // read 0 removed / 0 kept there, not NULL/NULL
          coalesce(sum(when(col("__subj").isNotNull, 1L).otherwise(0L)),
            lit(0L)).as("rows_removed"),
          countDistinct(col("__subj")).as("subjects_present"))
        .select(lit(name).as("table_name"), col("rows_total"),
          col("rows_removed"),
          (col("rows_total") - col("rows_removed")).as("rows_kept"),
          col("subjects_present"))
    }.reduce(_ unionAll _)
  }
}
