package graft.cdc

import org.apache.spark.sql.DataFrame

/** Duplicate-delivery elimination on the change feed.
  *
  * The dedup key is `(doc_id, lsn)` — payload identity while ignoring
  * delivery incidentals, the CDC recast of grafter's graph-insensitive
  * `triple=` (/root/reference/grafter.core/src/grafter_2/rdf/
  * protocols.cljc:457-469).
  */
object Dedup {

  /** Batch dedup: exact, global. Catalyst plans this as a hash aggregate
    * with map-side partial dedup, so duplicate-heavy feeds shrink before
    * the shuffle.
    */
  def exact(events: DataFrame): DataFrame =
    events.dropDuplicates("doc_id", "lsn")

  /** Streaming dedup with bounded state: duplicates are only ever
    * re-delivered within the feed's lateness bound, so state for a key is
    * dropped once the watermark passes it. `dropDuplicatesWithinWatermark`
    * (Spark 3.5+) dedups on a subset without keying state on the event-time
    * column itself.
    */
  def streaming(events: DataFrame, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_id", "lsn")
}
