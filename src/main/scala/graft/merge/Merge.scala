package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.cdc.{Dedup, Lww}
import graft.lake.{LakeTable, Snapshot}

/** MERGE INTO semantics (SURVEY.md §7.2 `merge/`): the standard row-level
  * merge statement
  *
  * {{{
  *   MERGE INTO target USING batch ON target.key = batch.key
  *     WHEN MATCHED AND batch.lsn > target.lsn AND batch.op = 'D' THEN DELETE
  *     WHEN MATCHED AND batch.lsn > target.lsn                    THEN UPDATE *
  *     WHEN NOT MATCHED AND batch.op <> 'D'                       THEN INSERT *
  * }}}
  *
  * mapped onto the engine's merge-on-read mechanism. No target
  * read-modify-write happens at merge time: the batch's per-key winner row
  * (tombstone for DELETE) is appended with its lsn, and the lsn comparison
  * of the MATCHED clauses is enforced structurally at read time — a row is
  * visible iff no same-key row carries a greater lsn ([[LakeTable]]
  * scaladoc). That makes MERGE O(batch) instead of O(target), idempotent
  * under epoch re-delivery, and order-insensitive across batches.
  */
object Merge {

  /** Apply one merge batch. `batch` columns: `op` ("I"|"U"|"D"), `lsn`,
    * key column, payload columns (matched to the target schema by name).
    * Set `dedupExact` when the batch may contain duplicate (key, lsn)
    * deliveries that a stream-level watermark has not already removed.
    */
  def into(target: LakeTable, batch: DataFrame, epochId: Long,
           saltBuckets: Int = 0, dedupExact: Boolean = false): Option[Snapshot] = {
    val src = if (dedupExact) Dedup.exact(batch) else batch
    if (saltBuckets > 1)
      target.upsert(Lww.reduceSalted(src, saltBuckets), epochId, reduce = false)
    else
      target.upsert(src, epochId, reduce = true)
  }

  /** MERGE ... WHEN MATCHED <cond> THEN DELETE over the current table
    * state (no source batch): tombstone every visible row matching `cond`.
    */
  def deleteWhere(target: LakeTable, cond: Column, epochId: Long): Option[Snapshot] =
    target.deleteMatching(cond, epochId)

  /** Batched keyed deletes — the reference's `delete-batched`
    * (/root/reference/grafter.core/src/grafter_2/rdf/protocols.cljc:
    * 563-583; split arithmetic pinned at batching_test.clj:67-100): the
    * key set is tombstoned in `batchSize` groups, one snapshot per group,
    * bounding sink memory however large the delete set is. Returns the
    * committed snapshots (full batches first, then the remainder —
    * [3 3 1] for 7 keys at batch 3).
    */
  def deleteKeysBatched(target: LakeTable, keys: Seq[Any], startEpoch: Long,
                        batchSize: Int = graft.stream.Batching.DefaultBatchSize.toInt): Seq[Snapshot] = {
    require(batchSize > 0, "batchSize must be positive")
    keys.grouped(batchSize).zipWithIndex.flatMap { case (group, i) =>
      target.deleteMatching(col(target.keyCol).isin(group: _*), startEpoch + i)
    }.toSeq
  }

  /** Pure-column helper exposing the visibility rule the read path
    * enforces — useful for reasoning/tests: given winner lsn and the max
    * competing lsn, would the MATCHED-update fire?
    */
  def matchedWins(sourceLsn: Column, targetLsn: Column): Column =
    sourceLsn > targetLsn
}
