package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-writer-wins reduce: per `doc_id`, keep the event with max `lsn`.
  *
  * `max_by(struct(...), lsn)` is a declarative aggregate, so Catalyst gives
  * map-side partial aggregation for free (`HashAggregateExec` partial →
  * final): each shuffle partition ships at most one candidate row per
  * (mapper, key), which already absorbs most skew. LSNs are unique per key
  * after dedup, so no tie-break is needed (SURVEY.md §2.5 A2).
  */
object Lww {

  private val payload = Seq("op", "doc_id", "lsn", "ts", "tokens", "n_tok", "source")

  private def payloadCols(df: DataFrame): Seq[String] = {
    // keep any evolved columns (e.g. v2's `lang`) in the winner row
    val known = payload.toSet
    payload.filter(df.columns.contains) ++ df.columns.filterNot(known.contains)
  }

  /** One-phase LWW. The winner row keeps all event columns. */
  def reduce(events: DataFrame): DataFrame = {
    val cols = payloadCols(events)
    events
      .groupBy(col("doc_id"))
      .agg(max_by(struct(cols.map(col): _*), col("lsn")).as("w"))
      .select(cols.map(c => col(s"w.$c")): _*)
  }

  /** Two-phase salted LWW for pathological hot keys: phase 1 reduces
    * (doc_id, salt) groups — splitting a hot key across `saltBuckets`
    * reducers — phase 2 reduces the ≤saltBuckets survivors per key.
    * max-LSN is associative, so salted == unsalted (property-tested in
    * LwwSpec). Salt is derived, not random: `xxhash64(lsn) % saltBuckets`,
    * keeping the plan deterministic for checkpoint replay.
    */
  def reduceSalted(events: DataFrame, saltBuckets: Int): DataFrame = {
    val cols = payloadCols(events)
    val salted = events.withColumn("_salt", pmod(xxhash64(col("lsn")), lit(saltBuckets)))
    val phase1 = salted
      .groupBy(col("doc_id"), col("_salt"))
      .agg(max_by(struct(cols.map(col): _*), col("lsn")).as("w"))
    phase1
      .groupBy(col("doc_id"))
      .agg(max_by(col("w"), col("w.lsn")).as("w"))
      .select(cols.map(c => col(s"w.$c")): _*)
  }
}
