package graft.stream

/** Batch-boundary arithmetic — the reference pins exact batch splits
  * (`add-batched` 10 items × batch 3 → [3 3 3 1];
  * /root/reference/grafter.core/test/grafter_2/rdf/batching_test.clj:33-100,
  * default batch size 20000 at protocols.cljc:514-515). Our batches are
  * LSN ranges over the WAL rather than materialised sub-seqs, with the
  * same split rule: full batches then one partial remainder.
  */
object Batching {
  val DefaultBatchSize = 20000L

  /** Inclusive [lo, hi] LSN ranges covering [minLsn, maxLsn]. */
  def lsnRanges(minLsn: Long, maxLsn: Long,
                batchSize: Long = DefaultBatchSize): Seq[(Long, Long)] = {
    require(batchSize > 0, "batchSize must be positive")
    if (maxLsn < minLsn) Seq.empty
    else Iterator.iterate(minLsn)(_ + batchSize)
      .takeWhile(_ <= maxLsn)
      .map(lo => (lo, math.min(maxLsn, lo + batchSize - 1)))
      .toSeq
  }

  /** Split sizes (the reference's observable: [3 3 3 1]). */
  def splitSizes(n: Long, batchSize: Long = DefaultBatchSize): Seq[Long] =
    if (n <= 0) Seq.empty
    else lsnRanges(0, n - 1, batchSize).map { case (lo, hi) => hi - lo + 1 }
}
