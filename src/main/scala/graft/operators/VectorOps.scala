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
  * posexplode + hash aggregate, with the per-position sum in DECIMAL —
  * float addition order across a group is partition-dependent, decimal
  * addition is exact, so results are deterministic AND oracle-exact (the
  * repo-wide convention from SparkEntry's header).
  */
object VectorOps {

  /** L2 norm of a float-array column, as double. */
  def l2Norm(v: Column): Column = sqrt(VectorExprs.dot(v, v))

  /** Unit-normalized copy of the vector (null-safe: a zero vector
    * normalizes to nulls rather than dividing by zero loudly).
    */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    transform(v, x =>
      when(n > 0.0, x.cast("double") / n).otherwise(lit(null).cast("double")))
  }

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
