package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured JSON column parsing with an EXPLICIT schema — the
  * ingest step for event properties, API payloads, and crawler metadata
  * that arrive as JSON strings inside an otherwise-columnar table.
  *
  * Explicit-schema `from_json` on purpose (the row-64 JSONL argument, at
  * column granularity): schema INFERENCE over a 100 TB column is a full
  * extra scan and a schema that drifts with the data; a declared schema
  * is one codegen'd parse per row, a frozen output shape, and NULL — not
  * an abort, not a dropped row — for malformed or mistyped cells, so a
  * poisoned record cannot kill the batch (the PERMISSIVE contract; pair
  * with an `isNull` screen when absence is the defect).
  *
  * Scale shape: pure per-row projection, zero shuffles; the parsed
  * struct's fields prune like ordinary columns downstream.
  */
object Semistructured {

  /** Parsed struct column from a JSON-string column under a DDL schema
    * (e.g. `"k INT, tag STRING"`). */
  def jsonStruct(jsonCol: Column, ddl: String): Column =
    from_json(jsonCol, org.apache.spark.sql.types.StructType.fromDDL(ddl))

  /** JSON key inventory — the schema-discovery read run BEFORE anyone
    * declares the [[extractJson]] schema, and the drift audit run after:
    * every top-level key observed in the column with its occurrence
    * count and fill rate in bp against ALL rows (absent-or-malformed
    * rows dilute the rate — that's the point; a key falling from 9800 bp
    * to 200 bp is an upstream producer change caught here). One per-row
    * `json_object_keys` explode (keys only — values never materialize),
    * a key-bounded count aggregate, and the row total as a broadcast
    * single-row attach. */
  def keyInventory(df: DataFrame, jsonCol: String): DataFrame = {
    val total = df.agg(count(lit(1)).as("__tot"))
    df.select(explode(expr(s"json_object_keys($jsonCol)")).as("key"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"))
      .join(broadcast(total))
      .select(col("key"), col("n"),
        expr("(10000 * n) div __tot").as("fill_bp"))
  }

  /** `df` with each declared field of the parsed JSON surfaced as a
    * top-level column (NULL where the cell is malformed or the key is
    * absent). The struct materializes in ONE intermediate projection so
    * the parse runs once per row, not once per declared field. */
  def extractJson(df: DataFrame, jsonCol: String, ddl: String): DataFrame = {
    val tmp = "__graft_json"
    val fields = org.apache.spark.sql.types.StructType.fromDDL(ddl).fields
    fields.foldLeft(
        df.withColumn(tmp, jsonStruct(col(jsonCol), ddl)))(
        (acc, f) => acc.withColumn(f.name, col(tmp).getField(f.name)))
      .drop(tmp)
  }
}
