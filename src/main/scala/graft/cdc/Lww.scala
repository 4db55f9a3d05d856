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

  /** Fused bucketed LWW: one explicit `repartition(numBuckets, key)` is the
    * ONLY shuffle — the groupBy's required distribution is already
    * satisfied, so the aggregate runs in the same stage and the writer
    * downstream inherits the bucket placement (task N = bucket N). This is
    * the hot path of [[graft.lake.LakeTable.upsert]].
    */
  def reduceBucketed(events: DataFrame, keyCol: String, numBuckets: Int): DataFrame = {
    val cols = payloadCols(events)
    // sort/window instead of hash aggregate: at high thread counts the
    // per-key hash probes thrash the shared cache (measured ~2.7x CPU
    // inflation at 32 threads), while the sort's sequential access scales;
    // the same sorted pass yields the winner row AND the per-key source
    // offset stats (parquet footer min/max of these columns gives each
    // bucket's consumed offset range for lineage with no extra pass)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("lsn").desc)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events.repartition(numBuckets, col(keyCol))
      .select(cols.map(col) ++ Seq(
        row_number().over(w).as("_rn"),
        min(col("lsn")).over(full).as("_src_min"),
        max(col("lsn")).over(full).as("_src_max")): _*)
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Typed-Aggregator LWW (SURVEY.md §2.11 E6): the `Aggregator` fallback
    * the survey reserves for cases `max_by` cannot express (custom
    * tie-breaks, non-orderable payloads). Semantically identical to
    * [[reduce]] on unique-lsn feeds — property-pinned — and kept as the
    * documented extension point, not the hot path (declarative `max_by`
    * gets Catalyst's partial aggregation and codegen; a typed Aggregator
    * round-trips through object serialization).
    */
  def reduceTyped(events: org.apache.spark.sql.Dataset[graft.model.ChangeEvent])
      : org.apache.spark.sql.Dataset[graft.model.ChangeEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.doc_id)
      .reduceGroups((a, b) => if (a.lsn >= b.lsn) a else b)
      .map(_._2)
  }

  /** Sentinel for `saltBuckets` in [[graft.stream.CdcIngest.applyBatch]]/
    * [[graft.stream.CdcIngest.run]]: route each batch through
    * [[reduceAutoSketched]] — skew probed per batch by the Misra–Gries
    * sketch, salting engaged only when a heavy hitter is actually present.
    */
  val AutoSalt: Int = -1

  /** THE salt fan-out every auto-salting site shares: the sticky route in
    * [[graft.stream.CdcIngest.run]] and the per-batch probe route here
    * must salt identically, or a probe batch and a sticky batch of the
    * same stream would partition the same hot key differently.
    */
  val DefaultSaltBuckets: Int = 16

  /** Skew-adaptive routing via the Misra–Gries sketch
    * ([[HeavyHitters.topShare]]): ONE distributed column-pruned pass over
    * the WHOLE batch with O(sketchSize) state per partition — unlike a
    * bounded head-sample (the removed round-3 `reduceAuto`), which only
    * sees whichever partitions answer first and misses a hot key
    * concentrated elsewhere in the batch. Same contract: routing never changes results (salted
    * == unsalted is property-tested); choose this for feeds with
    * genuinely unknown skew, pass `saltBuckets` explicitly when skew is
    * known. Size `sketchSize ≳ 2/hotShare` so a truly-hot key cannot
    * hide under the sketch's 1/(k+1) undercount.
    */
  def reduceAutoSketched(events: DataFrame, keyCol: String, numBuckets: Int,
                         sketchSize: Int = 64, hotShare: Double = 0.2,
                         saltBuckets: Int = DefaultSaltBuckets): DataFrame =
    reduceAutoSketchedRouted(events, keyCol, numBuckets, sketchSize,
      hotShare, saltBuckets)._1

  /** [[reduceAutoSketched]] plus the routing decision it took (true =
    * salted) — callers that keep the route sticky across micro-batches
    * ([[graft.stream.CdcIngest.run]]) read it instead of re-probing.
    */
  def reduceAutoSketchedRouted(events: DataFrame, keyCol: String,
                               numBuckets: Int, sketchSize: Int = 64,
                               hotShare: Double = 0.2,
                               saltBuckets: Int = DefaultSaltBuckets): (DataFrame, Boolean) = {
    val share = HeavyHitters.topShare(events, keyCol, sketchSize)
    if (share > hotShare)
      (reduceSalted(events, saltBuckets, keyCol).repartition(numBuckets, col(keyCol)), true)
    else (reduceBucketed(events, keyCol, numBuckets), false)
  }

  /** Two-phase salted LWW for pathological hot keys: phase 1 reduces
    * (doc_id, salt) groups — splitting a hot key across `saltBuckets`
    * reducers — phase 2 reduces the ≤saltBuckets survivors per key.
    * max-LSN is associative, so salted == unsalted (property-tested in
    * LwwSpec). Salt is derived, not random: `xxhash64(lsn) % saltBuckets`,
    * keeping the plan deterministic for checkpoint replay.
    */
  def reduceSalted(events: DataFrame, saltBuckets: Int,
                   keyCol: String = "doc_id"): DataFrame = {
    val cols = payloadCols(events)
    val salted = events.withColumn("_salt", pmod(xxhash64(col("lsn")), lit(saltBuckets)))
    val phase1 = salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(max_by(struct(cols.map(col): _*), col("lsn")).as("w"),
        min(col("lsn")).as("_src_min"), max(col("lsn")).as("_src_max"))
    phase1
      .groupBy(col(keyCol))
      .agg(max_by(col("w"), col("w.lsn")).as("w"),
        min(col("_src_min")).as("_src_min"), max(col("_src_max")).as("_src_max"))
      .select(cols.map(c => col(s"w.$c")) ++ Seq(col("_src_min"), col("_src_max")): _*)
  }
}
