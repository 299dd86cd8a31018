package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-touch conversion attribution — every conversion event is credited
  * to the user's LATEST preceding touch event within a lookback window
  * (the marketing-analytics staple, and the label-construction step for
  * conversion-prediction training data: "which click caused this
  * purchase"). Conversions with no in-window touch stay unattributed with
  * a NULL touch id — dropping them would bias any downstream rate.
  *
  * Built on the [[AsOfJoin]] union-tag machinery (one key exchange + one
  * per-key sort, never a per-user theta-join): touches are deduplicated to
  * max-id per (user, µs) first — the q33 determinism contract — then the
  * as-of pick runs, then the lookback window is enforced as a post-filter
  * that NULLs out stale touches (an out-of-window touch must not surface).
  * A touch AT the conversion's exact microsecond matches (inclusive, the
  * as-of tie rule), documented.
  *
  * Exactness: timestamps ride as epoch-µs longs end-to-end; ages are
  * integer differences; the attributed flag is 0/1. Everything replays in
  * SQL as the latest-preceding-row window pick.
  */
object Attribution {

  /** One row per conversion event: (conversion_id, user_id, t_us,
    * touch_id, age_us, attributed). `touch_id`/`age_us` are NULL when no
    * touch of `touchType` precedes the conversion within `windowUs`. */
  def lastTouch(events: DataFrame, userCol: String, tsCol: String,
                idCol: String, typeCol: String,
                convType: String, touchType: String,
                windowUs: Long): DataFrame = {
    val e = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("eid"), col(userCol).as("u"),
        col(typeCol).as("ty"), expr(s"unix_micros($tsCol)").as("t_us"))
    val touches = e.filter(col("ty") === touchType)
      .groupBy(col("u"), col("t_us").as("tt_us"))
      .agg(max("eid").as("touch"))
    val convs = e.filter(col("ty") === convType)
      .select(col("eid").as("conversion_id"), col("u"), col("t_us"))
    val joined = AsOfJoin.asOfJoin(convs, touches,
      "u", "u", "t_us", "tt_us", Seq("touch", "tt_us"))
    val inWindow = col("tt_us").isNotNull &&
      (col("t_us") - col("tt_us")) <= windowUs
    joined.select(
      col("conversion_id"), col("u").as("user_id"),
      col("t_us"),
      when(inWindow, col("touch")).as("touch_id"),
      when(inWindow, col("t_us") - col("tt_us")).as("age_us"),
      when(inWindow, lit(1L)).otherwise(lit(0L)).as("attributed"))
  }
}
