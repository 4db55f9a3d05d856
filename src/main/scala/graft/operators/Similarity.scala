package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k with a bounded query set (broadcast
  * the queries, never cross-join the corpus with itself). Scale path:
  * random-hyperplane LSH bucketing — queries only join candidates in their
  * bucket, turning O(Q×N) into O(Q×N/2^bits) expected.
  *
  * Dot products are `zip_with`/`aggregate` higher-order functions —
  * Catalyst expressions, codegen-friendly, no UDFs.
  */
object Similarity {

  /** Cosine similarity via the native codegen'd [[graft.functions.DotProduct]]
    * expression (register per session; done by the top-k builders). The
    * loop is left-to-right sequential — bit-identical to [[cosineFold]]
    * and to the explicit fold the DuckDB oracle runs.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.functions.VectorExprs.dot _
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Higher-order-function fallback (no registration needed): aggregate
    * over zip_with. Kept as the reference implementation the native
    * expression is property-checked against.
    */
  def cosineFold(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0), (acc, e) => acc + e)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Brute-force top-k cosine neighbors for the query subset
    * `vec_id < numQueries` against the full corpus. The query side is tiny
    * and broadcast; the corpus streams through one pass (one wide scan, no
    * shuffle besides the final per-query top-k).
    */
  def bruteForceTopK(embeddings: DataFrame, numQueries: Int, k: Int): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val queries = broadcast(
      embeddings.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")))
    val scored = embeddings.join(queries, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        graft.functions.TextOps.round4(cosine(col("qvec"), col("embedding"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: all (id1 < id2) pairs in the
    * bounded subset with cosine ≥ threshold. Exact (brute force over the
    * subset); the corpus-scale path is [[ivfTopK]]/[[lshTopK]] bucketing
    * followed by this on candidates.
    */
  def embedNearDup(embeddings: DataFrame, maxId: Int, threshold: Double): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val sub = embeddings.filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"))
    val a = sub.select(col("vec_id").as("id1"), col("embedding").as("va"))
    val b = sub.select(col("vec_id").as("id2"), col("embedding").as("vb"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        graft.functions.TextOps.round4(cosine(col("va"), col("vb"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** IVF assignment: nearest of `nCells` deterministic centroids. The
    * "training-free" centroid set is the embeddings of `nCells` fixed
    * probe ids (deterministic, replayable — a real deployment would slot
    * k-means centroids in; the partitioning/probing shape is identical).
    * Returns (vec_id, cell).
    */
  def ivfAssign(embeddings: DataFrame, nCells: Int): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val centroids = broadcast(
      embeddings.filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cell"), col("embedding").as("cvec")))
    embeddings.crossJoin(centroids)
      .select(col("vec_id"), col("embedding"), col("cell"),
        cosine(col("embedding"), col("cvec")).as("csim"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell").asc)))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** IVF top-k: queries probe only their own cell (nprobe=1 — the scale
    * path writes the corpus bucketed by cell). Approximate; recall floor
    * asserted in OperatorSpec.
    */
  def ivfTopK(embeddings: DataFrame, nCells: Int, numQueries: Int, k: Int): DataFrame = {
    val assigned = ivfAssign(embeddings, nCells)
    val queries = broadcast(
      assigned.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("cell").as("qcell")))
    val scored = assigned
      .join(queries, col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        graft.functions.TextOps.round4(cosine(col("qvec"), col("embedding"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** Random-hyperplane LSH bucket id: `bits` pseudo-hyperplanes, plane j's
    * component for dimension d is ±1 from a deterministic splitmix64 bit
    * (no RNG state → replayable). bucket = sum_j sign_j(v) * 2^j.
    *
    * Each plane is materialised as ONE ±1 array literal fed to the native
    * codegen'd DotProduct — O(bits) expression nodes instead of the
    * O(bits×dim) per-element term tree (a 64-dim/4-bit bucket used to be a
    * 256-term column that broadcast >1 MiB task binaries). Requires
    * [[graft.functions.VectorExprs.register]]. Sum order inside the dot is
    * left-to-right over dimensions — identical to the old reduce, so
    * bucket ids are bit-for-bit unchanged.
    *
    * At cluster scale the corpus is written bucketed by this id; queries
    * probe their own bucket plus Hamming-1 neighbors (see [[lshTopK]]).
    */
  def lshBucket(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    val bitCols = (0 until bits).map { j =>
      val plane = Array.tabulate(dim) { d =>
        // deterministic ±1 from splitmix64 — mirrors feed.EventGen.mix64
        val h = graft.feed.EventGen.mix64(seed ^ (j.toLong << 32) ^ d.toLong)
        if ((h & 1L) == 0L) 1.0f else -1.0f
      }
      when(graft.functions.VectorExprs.dot(vec, typedLit(plane)) > 0, lit(1 << j))
        .otherwise(lit(0))
    }
    bitCols.reduce(_ + _).cast("int")
  }

  /** Approximate top-k: same scoring as brute force but only within the
    * query's probe set. With `multiprobe = true` (default) each query
    * probes its own bucket plus every bucket at Hamming distance 1 —
    * (bits+1)× the candidate volume for a large recall gain; the probe
    * fan-out lives on the tiny broadcast query side, never the corpus.
    * Probe buckets of one query are distinct, and a corpus vector lives in
    * exactly one bucket, so no (qid, nid) pair is scored twice. Recall < 1
    * by construction — verified rows-only (no SQL oracle), with a recall
    * assertion in OperatorSpec.
    */
  def lshTopK(embeddings: DataFrame, dim: Int, bits: Int, seed: Long,
              numQueries: Int, k: Int, multiprobe: Boolean = true): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val bucketed = embeddings.withColumn("bucket",
      lshBucket(col("embedding"), dim, bits, seed))
    val base = bucketed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("bucket").as("qbucket"))
    val probes =
      if (!multiprobe) base
      else base
        .select(col("qid"), col("qvec"),
          explode(array((lit(0) +: (0 until bits).map(j => lit(1 << j))): _*)).as("_flip"),
          col("qbucket"))
        .select(col("qid"), col("qvec"),
          col("qbucket").bitwiseXOR(col("_flip")).as("qbucket"))
    val queries = broadcast(probes)
    val scored = bucketed
      .join(queries, col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        graft.functions.TextOps.round4(cosine(col("qvec"), col("embedding"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }
}
