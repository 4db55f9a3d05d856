package graft.lake

/** A derived table that can be folded forward to its base(s)' current
  * state — the common face of [[MatView]] (aggregate views) and
  * [[JoinView]] (keyed enrichment views), so ingest loops attach either
  * kind ([[graft.stream.CdcIngest.run]]'s `views`). Implementations are
  * exactly-once per fold and idempotent under crash-replay; `catchUpAll`
  * drains every pending range.
  */
trait Maintainable {
  /** Fold forward until nothing is pending. */
  def catchUpAll(): Unit
}
