package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, VectorExprs}

/** Embedding-column utilities: norms, unit-normalization, per-group mean
  * pooling — the standard preparation steps in front of every similarity
  * / ANN op in this library (cosine assumes nothing about input norms,
  * but a pre-normalized corpus turns cosine top-k into dot-product top-k
  * and halves the per-pair cost).
  *
  * Scale/portability notes: norms ride the native [[VectorExprs.dot]]
  * fold (codegen'd, per-row — no shuffle); mean pooling is one
  * posexplode + hash aggregate over INTEGER-QUANTIZED components (1e-6
  * units) — float addition order across a group is partition-dependent,
  * integer addition is exact, so results are deterministic AND
  * oracle-exact.
  */
object VectorOps {

  /** L2 norm of a float-array column, as double. */
  def l2Norm(v: Column): Column = sqrt(VectorExprs.dot(v, v))

  /** Unit-normalized copy of the vector given a PRE-COMPUTED norm column
    * (null-safe: a zero norm yields nulls rather than dividing by zero
    * loudly). Pass a materialized column (`withColumn("n", l2Norm(v))`),
    * not an inline `l2Norm(v)` expression: higher-order-function lambdas
    * re-evaluate their captured expressions per ELEMENT (no subexpression
    * elimination in the HOF path), so an inline norm turns O(d)
    * normalization into O(d²).
    */
  def l2NormalizeBy(v: Column, norm: Column): Column =
    transform(v, x =>
      when(norm > 0.0, x.cast("double") / norm).otherwise(lit(null).cast("double")))

  /** Convenience one-expression form of [[l2NormalizeBy]] — O(d²) per row
    * for the reason documented there; fine for small d or one-off use,
    * use the two-step form on wide embeddings at scale.
    */
  def l2Normalize(v: Column): Column = l2NormalizeBy(v, l2Norm(v))

  /** Element-wise mean of the group's vectors, one output row per
    * (group, position): the pooling shape that feeds centroid builds and
    * class prototypes. Components are quantized to 1e-6 units and summed
    * as exact integers (the [[Similarity.quantize]] convention): a float
    * sum's value depends on partition order, an integer sum's never does
    * — so pooling is deterministic under any partitioning and its oracle
    * twin is hash-exact. Ragged inputs pool per position over the rows
    * that reach it.
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String = "embedding")
      : DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(TextOps.round4(
        sum(floor(col("x").cast("double") * 1000000.0 + 0.5).cast("bigint"))
          .cast("double") /
          (lit(1000000.0) * count(lit(1)).cast("double"))).as("mean"))
}
