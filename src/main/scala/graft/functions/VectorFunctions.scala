package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over plain `array<float|double>` columns using Catalyst
  * higher-order functions (`zip_with` + `aggregate`) — no ml.Vector boxing,
  * no UDFs, fully codegen-compatible and usable straight off a parquet
  * `list<float>` column like `embeddings.embedding`.
  */
object VectorFunctions {

  /** Σ uᵢ·vᵢ (computed in double). */
  def dot(u: Column, v: Column): Column =
    aggregate(
      zip_with(u, v, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖u‖₂ */
  def l2Norm(u: Column): Column =
    sqrt(aggregate(u, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** cosine(u, v) ∈ [-1, 1] */
  def cosine(u: Column, v: Column): Column =
    dot(u, v) / (l2Norm(u) * l2Norm(v))

  /** Squared Euclidean distance. */
  def sqDist(u: Column, v: Column): Column =
    aggregate(
      zip_with(u, v, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, x) => acc + x)
}
