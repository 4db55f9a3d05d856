package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.lake.{LakeFs, LakeTable}
import graft.operators.{DedupOps, Similarity}

/** Embedding-cosine admission control — [[DedupIngest]]'s twin for the
  * vector modality: a stream of `(vec_id, embedding)` rows is filtered
  * against everything admitted so far using the LSH-bucket candidate
  * join + exact cosine verify of [[Similarity.lshNearDupPairs]].
  *
  * Same scale shape as the SimHash path: the index scan (id, embedding,
  * precomputed bucket) is never shuffled — the bucketed batch side
  * broadcasts into it; survivors upsert under the batch epoch
  * (exactly-once), docs sink BEFORE index (the replay-safe order —
  * admission is a pure function of (batch, index state): LSH planes are
  * seed-deterministic and the cosine verify is round4-stable).
  *
  * DEGENERATE VECTORS (null embedding, zero norm) are dropped before
  * admission, deterministically: cosine is undefined for them (and under
  * ANSI mode the division would kill the stream — a single poison row
  * must never wedge ingest, and a null must never slip past the verify
  * filter as a NULL comparison). They are not admitted, not indexed, and
  * not returned as survivors; route them to a quarantine upstream if
  * they matter.
  *
  * The LSH parameters (dim, bits, seed) are PERSISTED next to the index
  * at create time and validated on every batch — stored buckets are a
  * function of the planes, so silently changing the parameters across a
  * restart would stop copies from ever meeting their candidates.
  *
  * ID-REUSE SEMANTICS (same contract as [[DedupIngest]]): a re-sent
  * vec_id with dissimilar content is re-admitted and LWW-overwrites its
  * index row; until compaction the pruned probe (raw live rows) also
  * sees the superseded embedding and can over-reject a future
  * near-match of the OLD vector — recall-only, never a wrong admit, and
  * bounded by the inline-compaction cadence (the compact resolves
  * winners and drops the stale row).
  *
  * Honesty note vs the SimHash path: Hamming-block banding GUARANTEES
  * candidacy within distance 3; LSH buckets only guarantee candidacy for
  * IDENTICAL vectors (same bucket by determinism). Near-but-not-equal
  * vectors across a bucket boundary can slip through — the standard
  * recall trade of LSH admission, bounded by `bits` (fewer bits = higher
  * recall, bigger buckets; see [[Similarity.lshBitsFor]]).
  */
object EmbedIngest {

  val IndexSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType), nullable = true),
    StructField("bucket", IntegerType, nullable = true)))

  /** Load-or-create the index; persists `(dim, bits, seed)` beside it on
    * first create and REQUIRES a match ever after.
    */
  def indexTable(spark: SparkSession, root: String, dim: Int, bits: Int,
                 seed: Long, numBuckets: Int = 8): LakeTable = {
    val fs = LakeFs.forRoot(root)
    val paramsPath = s"$root/aux/lsh.json"
    val params = s"""{"dim":$dim,"bits":$bits,"seed":$seed}"""
    if (fs.exists(paramsPath)) {
      val stored = fs.readString(paramsPath).trim
      require(stored == params,
        s"LSH parameter drift: index at $root was built with $stored, " +
          s"caller passed $params — stored buckets would never match")
    } else {
      fs.createDirectories(s"$root/aux")
      fs.putStringAtomic(paramsPath, params, createOnly = false)
    }
    LakeTable.loadOrCreate(spark, root, IndexSchema, keyCol = "vec_id",
      numBuckets = numBuckets)
  }

  /** Admit one batch of `(vec_id, embedding)` rows: reject vectors with
    * cosine ≥ `threshold` against a same-bucket index member, keep one
    * canonical (min id) per within-batch near-dup component, upsert
    * survivors under `epochId`. Returns the surviving batch rows
    * (degenerate rows excluded — see the object scaladoc).
    */
  def admitBatch(table: LakeTable, batch0: DataFrame, epochId: Long,
                 dim: Int, bits: Int, seed: Long, threshold: Double,
                 docsTable: Option[LakeTable] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"cosine threshold $threshold outside (0, 1]")
    docsTable.foreach { _ =>
      val reserved = Seq("op", "lsn").filter(batch0.columns.contains)
      require(reserved.isEmpty,
        s"vector stream must not carry reserved sink columns: $reserved")
    }
    graft.functions.VectorExprs.register(batch0.sparkSession)
    graft.functions.VectorExprs.register(table.spark)
    // one row per vec_id (re-emitted ids), conf-free content tie-break;
    // degenerate vectors dropped (deterministic — see scaladoc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(xxhash64(struct(batch0.columns.map(col): _*)))
    val batch = batch0
      .filter(col("embedding").isNotNull &&
        graft.functions.VectorExprs.dot(col("embedding"), col("embedding")) > 0.0)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // already-delivered batch (crash after both sink commits, before the
    // streaming checkpoint advanced): the index already contains the
    // batch, so re-deriving would reject everything as self-duplicates —
    // recover the ORIGINAL survivors from the index's lsn stamp instead
    // (same replay-return contract as DedupIngest.admitBatch)
    if (epochId <= table.lastCommittedEpoch)
      return batch.join(
        table.readWithLsn().filter(col(LakeTable.LsnCol) === epochId)
          .select(col("vec_id")),
        Seq("vec_id"), "left_semi")

    val sh = batch
      .withColumn("bucket", Similarity.lshBucket(col("embedding"), dim, bits, seed))
      .select(col("vec_id"), col("embedding"), col("bucket"))
      .localCheckpoint()

    // vs-index: bucket equi-join, batch side broadcast, exact verify.
    // The index is committed CLUSTERED by a ≤16-group coarsening of the
    // LSH bucket (clusterFor), so the literal `bucket IN (batch's
    // buckets)` probe is manifest-pruned: only files whose bucket range
    // intersects the batch open — probe IO scales with the batch's
    // bucket spread, not the admitted corpus. readInsertOnly is sound
    // for REJECTION even though changed-content re-admissions do
    // re-upsert an id (see ID-REUSE above): the raw live rows are a
    // superset of the winners, so the only divergence is over-rejection
    // against a superseded embedding — recall-only, never a wrong
    // admit, bounded by the compaction cadence. It also keeps the scan
    // aggregate-free so the pushed filter reaches the manifest.
    // capped like DedupIngest.MaxProbeKeys: at high `bits` a bulk batch
    // can touch ~batch-size distinct buckets — a six-figure IN literal
    // bloats the plan and prunes nothing, so scan the index whole there
    val batchBuckets = sh.select(col("bucket")).distinct()
      .limit(DedupIngest.MaxProbeKeys + 1).collect().map(_.getInt(0))
    val raw = table.readInsertOnly()
    val prunedIdx =
      if (batchBuckets.length > DedupIngest.MaxProbeKeys) raw
      else raw.filter(col("bucket").isin(batchBuckets.map(Integer.valueOf): _*))
    val idx = prunedIdx
      .select(col("vec_id").as("iid"), col("embedding").as("iemb"), col("bucket"))
    val rejected = idx.join(broadcast(sh), Seq("bucket"))
      .filter(graft.functions.TextOps.round4(
        Similarity.cosine(col("embedding"), col("iemb"))) >= threshold)
      .select(col("vec_id")).distinct()
    val fresh = sh.join(rejected, Seq("vec_id"), "left_anti").localCheckpoint()

    // within-batch: same-bucket pairs + exact verify → component-canonical
    val pairs = fresh.as("a").join(fresh.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.TextOps.round4(
        Similarity.cosine(col("a.embedding"), col("b.embedding"))) >= threshold)
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
    val losers = DedupOps.connectedComponents(pairs, "id1", "id2")
      .filter(col("v") =!= col("comp"))
      .select(col("v").as("vec_id"))
    val admitted = fresh.join(losers, Seq("vec_id"), "left_anti")

    val survivors = batch
      .join(admitted.select(col("vec_id")), Seq("vec_id"), "left_semi")
    docsTable.foreach { dt =>
      dt.upsert(survivors.select(Seq(lit("I").as("op"),
          lit(epochId).as("lsn")) ++ survivors.columns.map(col): _*),
        epochId = epochId, summary = Map("admission" -> "cosine"))
    }
    table.upsert(admitted.select(lit("I").as("op"), col("vec_id"),
        lit(epochId).as("lsn"), col("embedding"), col("bucket")),
      epochId = epochId, summary = Map("admission" -> "cosine"),
      clusterBy = Some(clusterFor(bits)))
    survivors
  }

  /** File-grouping expression for the index: the LSH bucket, coarsened to
    * at most 16 contiguous groups so the per-delta file fan-out stays
    * bounded as `bits` grows with the corpus ([[Similarity.lshBitsFor]]).
    * Order-preserving, so manifest `bucket` ranges stay disjoint across
    * groups and the probe's `bucket IN (…)` prunes files exactly.
    */
  private def clusterFor(bits: Int) =
    shiftright(col("bucket"), math.max(0, bits - 4))

  /** Plane count holding the expected per-bucket index population at
    * `targetBucketSize` — the [[Similarity.lshBitsFor]] bits-vs-N
    * contract applied to ADMISSION: both the vs-index probe join and the
    * within-batch pair join do O(bucketSize) work per batch row, so a
    * fixed small `bits` over an index that grows 1000× is the same
    * quadratic candidate-join trap the batch near-dup operators guard
    * against. Size `bits` from the index's TARGET population (admission
    * refuses parameter drift, so bits cannot be grown in place — plan
    * for the mature index, or rebuild under new planes).
    */
  def bitsFor(expectedIndexSize: Long, targetBucketSize: Long = 1024): Int =
    Similarity.lshBitsFor(expectedIndexSize, targetBucketSize)

  /** Streaming runner — same contract as [[DedupIngest.run]] (optional
    * admitted-vectors sink, inline compaction policy). `bits` has NO
    * default on purpose: a fixed small value is the quadratic bucket-join
    * trap at scale, so the caller must size it — [[bitsFor]] of the
    * index's target population (see its scaladoc for the cost contract).
    */
  def run(vecs: DataFrame, indexRoot: String, checkpointDir: String,
          dim: Int, bits: Int, seed: Long = 42L, threshold: Double = 0.9,
          numBuckets: Int = 8, docsRoot: Option[String] = None,
          maxFilesPerBucket: Int = 0,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = vecs.sparkSession
    val out = docsRoot.map(r => LakeTable.loadOrCreate(spark, r,
      StructType(vecs.schema.fields.toSeq), keyCol = "vec_id",
      numBuckets = numBuckets))
    val idx = indexTable(spark, indexRoot, dim, bits, seed, numBuckets)
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        admitBatch(idx, batch, epochId, dim, bits, seed, threshold,
          docsTable = out)
        if (maxFilesPerBucket > 0) {
          // the index compacts CLUSTERED to keep its files bucket-range
          // pure — a keyhash-only rewrite would erase the probe pruning
          val iv = idx.compactionCandidates(maxFilesPerBucket)
          if (iv.nonEmpty)
            idx.compactBuckets(iv, clusterBy = Some(clusterFor(bits)))
          out.foreach { t =>
            val victims = t.compactionCandidates(maxFilesPerBucket)
            if (victims.nonEmpty) t.compactBuckets(victims)
          }
        }
        ()
      }
      .start()
  }
}
