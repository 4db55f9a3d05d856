package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cdc.{Dedup, Lww}
import graft.lake.LakeTable
import graft.model.Schemas

/** The end-to-end CDC ingest job: change-feed tail → dedup → LWW reduce →
  * merge-on-read upsert → atomic snapshot commit carrying the epoch id →
  * per-partition lineage.
  *
  * This is the Spark-first recast of grafter's whole write path
  * (`add-batched` → transaction → flush; /root/reference/grafter.core/src/
  * grafter_2/rdf/protocols.cljc:514-545, grafter.repository/src/clj/
  * grafter_2/rdf4j/repository.clj:421-453): the micro-batch is the batch,
  * the snapshot commit is the transaction, and crash-replay is handled by
  * the epoch check instead of rollback.
  */
object CdcIngest {

  /** LWW-reduce → upsert one batch into the table; append lineage rows.
    *
    * In-batch exact dedup is deliberately NOT a separate stage: duplicate
    * deliveries are byte-identical rows, and the LWW `max_by` collapses
    * every (doc_id, lsn) group to one row anyway — a dedup shuffle before
    * the reduce would be pure overhead. Pass `dedup = true` only for
    * feeds where non-identical rows can share (doc_id, lsn) (none of ours
    * can: lsn is a WAL position). Cross-batch duplicates are handled by
    * the watermarked streaming dedup ([[graft.cdc.Dedup.streaming]]).
    *
    * Salting engages only when requested (AQE skew handling is the
    * baseline; see SURVEY.md §4): `saltBuckets > 1` forces the two-phase
    * salted reduce, [[Lww.AutoSalt]] probes each batch with the
    * Misra–Gries sketch ([[Lww.reduceAutoSketched]]) and salts only when
    * a heavy hitter is actually present — routing never changes results
    * (salted == unsalted is property-tested).
    */
  def applyBatch(table: LakeTable, batch: DataFrame, epochId: Long,
                 saltBuckets: Int = 0, dedup: Boolean = false,
                 quarantine: Boolean = false,
                 autoEvolve: Boolean = false,
                 capturePreimages: Boolean = false,
                 preimageColumns: Seq[String] = Seq.empty): Option[graft.lake.Snapshot] = {
    // schema follows the feed (merge-schema): new payload columns append,
    // widenable types widen, BEFORE the projection that would otherwise
    // silently drop them ([[graft.lake.LakeTable.mergeSchemaFrom]]); a
    // no-change batch costs one in-memory compare, no IO
    if (autoEvolve) table.mergeSchemaFrom(batch.schema)
    // exactly-once skip for a re-delivered epoch — but the micro-batch's
    // STATEFUL lineage (the watermarked dedup upstream of foreachBatch)
    // must still execute: every state-store partition has to commit for
    // the batch to complete (Spark validates per-batch commit coverage,
    // and a frame left unconsumed fails the stream), and running it
    // re-advances the dedup state exactly as any idempotent sink would
    // on re-delivery. One foreachPartition drain, no shuffle added.
    if (epochId <= table.lastCommittedEpoch) {
      // the noop sink, not foreachPartition: the drain must execute the
      // batch's OWN incremental plan (df.rdd would replan outside it and
      // the state commits would not register against this batch)
      batch.write.format("noop").mode("overwrite").save()
      return None
    }
    val src0 = if (dedup) Dedup.exact(batch) else batch
    // untrusted feeds: side-output schema-divergent rows with lineage
    // instead of silently nulling them (reference io.clj:185-209 — errors
    // carry the offending record). Single pass: both sides of the split
    // read one cached tagged frame; off by default for trusted WAL feeds.
    val (src, release) =
      if (!quarantine) (src0, () => ())
      else {
        val sp = graft.cdc.Quarantine.split(table, src0)
        // the bad-side write materialises the shared cache; write()
        // detects emptiness from its own output and removes an all-empty
        // epoch dir, so a clean feed accretes nothing
        if (epochId > table.lastCommittedEpoch)
          graft.cdc.Quarantine.write(table, sp.bad, epochId)
        (sp.clean, () => sp.release())
      }
    try {
      // writer-captured preimages (CDF analog): the batch keys' pre-state
      // lands in preimages/epoch-<E> BEFORE the commit, and the commit's
      // summary flag makes it visible — one merged scan per batch,
      // amortized across every attached view's folds (the alternative is
      // one scan per view per fold). Replayed epochs skip: the commit
      // already carries (or doesn't carry) the flag.
      // replayed epochs (epochId <= lastCommittedEpoch) pass Map.empty:
      // upsert no-ops on them and keeps the ORIGINAL commit's summary, so
      // stamping a claimed capture here would be a lie waiting for a
      // future change to that gating to believe it
      val preSummary: Map[String, String] =
        if (capturePreimages && epochId > table.lastCommittedEpoch)
          Map(LakeTable.PreimagesKey ->
            table.capturePreimages(src.select(table.keyCol), epochId, preimageColumns))
        else Map.empty
      val snap =
        if (saltBuckets == Lww.AutoSalt) {
          // pre-shuffle projection, same as upsert's reduce path: event-time
          // and transport columns never cross the wire
          val needed = (Seq(table.keyCol, "lsn", "op") ++
            table.currentSchema.fields.map(_.name).filter(src.columns.contains)).distinct
          val slim = src.select(needed.filter(src.columns.contains).map(col): _*)
            // cache so the sketch probe and the routed reduce share ONE
            // source pass — unpersisted, the probe recomputes the whole
            // upstream (feed read + dedup) and its cost erases the salting
            // win it exists to unlock (measured 2x at 90%-hot feeds)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val (reduced, salted) =
              Lww.reduceAutoSketchedRouted(slim, table.keyCol, table.numBuckets)
            // the route rides in the snapshot summary: durable lineage,
            // and the sticky router in run() reads it back
            table.upsert(reduced, epochId, reduce = false,
              summary = preSummary + ("autoSalt" -> salted.toString))
          } finally slim.unpersist(blocking = false)
        } else if (saltBuckets > 1)
          table.upsert(Lww.reduceSalted(src, saltBuckets), epochId,
            reduce = false, summary = preSummary)
        else
          table.upsert(src, epochId, reduce = true, summary = preSummary)
      // per-partition lineage comes free from the parquet footer stats of
      // the just-written delta files (rows + lsn range per bucket) — zero
      // extra Spark jobs per batch; the whole batch is ONE job
      snap.foreach(s => LineageLog.append(table, epochId, s))
      snap
    } finally release()
  }

  /** Replay a bounded feed directory as a stream with exactly-once commits.
    * `Trigger.AvailableNow` drains everything in rate-limited micro-batches
    * and stops — the replay mode of the north rule. A killed run resumes
    * from `checkpointDir` and re-delivers at most one batch, which the
    * epoch check makes a no-op.
    */
  /** @param feedOptions extra options for the feed file source. At the
    *   10^10-event target the knobs that matter are Spark's own
    *   `cleanSource=archive|delete` + `sourceArchiveDir` and `maxFileAge`:
    *   they bound the file source's seen-files map and the per-trigger
    *   listing over a feed directory that would otherwise accrete
    *   segments forever (the ingest-side mirror of the manifest-driven
    *   CDC-out tail).
    */
  /** @param schema the feed's declared event schema (a streaming file
    *   source's schema is fixed for the query's lifetime — a connector
    *   carrying new columns restarts declaring them here)
    * @param autoEvolve with true, each batch first grows the TABLE
    *   schema to fit the feed ([[graft.lake.LakeTable.mergeSchemaFrom]]):
    *   new payload columns append, widenable types widen, protocol
    *   columns (op/lsn/ts) never leak — the restart needs no manual
    *   evolveSchema step
    */
  /** @param maxFilesPerBucket incremental-compaction policy: after each
    *   committed batch, buckets whose live file count exceeds this are
    *   rewritten via [[graft.lake.LakeTable.compactBuckets]] — bounded
    *   maintenance (O(selected data), never the whole table) that keeps
    *   read amplification flat on unbounded replays; the policy read is
    *   manifest-only. 0 disables. `compactEverySnapshots` remains the
    *   FULL-rewrite cadence (layout evolution, tombstone purge).
    * @param probeEvery with `saltBuckets = Lww.AutoSalt`, the Misra–Gries
    *   probe runs on batch 1 and every this-many batches after; between
    *   probes the last routing decision is STICKY (skew is persistent in
    *   real feeds — a hot document stays hot across triggers). The probe
    *   batch caches its projected frame so sketch + reduce share one
    *   source pass; non-probe batches pay nothing. Measured on 12 M
    *   events at local[32]: per-batch probing costs ~2x on uniform feeds
    *   (cache + full-pass sketch every batch) while sticky probing
    *   amortizes that to ~1/probeEvery, at the cost of reacting to a
    *   skew CHANGE up to probeEvery-1 batches late — salted == plain in
    *   results either way, so a stale route is only ever a speed issue.
    * @param capturePreimages capture each batch's pre-state
    *   ([[graft.lake.LakeTable.capturePreimages]]) so attached views fold
    *   batch-proportionally (one capture scan amortized across all views)
    * @param views [[graft.lake.Maintainable]] derived tables (aggregate
    *   [[graft.lake.MatView]]s over THIS table, [[graft.lake.JoinView]]s
    *   with this table on either side), caught up
    *   on the [[run]]'s `maintainEvery` cadence — derived aggregates stay
    *   fresh with the ingest, each fold bounded by the folded range. View
    *   maintenance has its own exactly-once (view epochs = base snapshot
    *   ids), so a crash between the base commit and a view fold
    *   self-heals on the next maintenance point, and a replayed batch
    *   never double-folds.
    * @param maintainEvery fold attached views forward every this-many
    *   batches (default 1 = after every batch). A fold has a fixed
    *   per-maintain floor (metadata read, winner pairing) on top of its
    *   O(range) term, so at small-batch cadence K-batch folding amortizes
    *   the floor K× while the view lags the base by at most K−1 batches —
    *   the bounded-staleness policy knob. Catch-up folds the WHOLE
    *   accrued range in one maintain (multi-snapshot before-images), and
    *   the lag never extends past the stream: call `catchUpAll()` after
    *   `awaitTermination` for a final sync, or rely on the next run's
    *   first maintenance point (catch-up heals any lag, including
    *   crash-left lag).
    */
  def run(spark: SparkSession, feedDir: String, table: LakeTable,
          checkpointDir: String, maxFilesPerTrigger: Int = 4,
          watermark: String = "1 hour", saltBuckets: Int = 0,
          format: Option[String] = None,
          compactEverySnapshots: Int = 0,
          maxFilesPerBucket: Int = 0,
          quarantine: Boolean = false,
          probeEvery: Int = 8,
          feedOptions: Map[String, String] = Map.empty,
          schema: org.apache.spark.sql.types.StructType = Schemas.changeEvent,
          autoEvolve: Boolean = false,
          views: Seq[graft.lake.Maintainable] = Seq.empty,
          maintainEvery: Int = 1,
          capturePreimages: Boolean = false,
          preimageColumns: Seq[String] = Seq.empty): StreamingQuery = {
    require(maintainEvery > 0, s"maintainEvery must be positive: $maintainEvery")
    // feed codec by explicit format, else extension sniff (S3 registry);
    // maxFilesPerTrigger is the bounded-buffer backpressure knob — the
    // recast of the reference's 32-slot parse queue (io.clj:649-650)
    val events = graft.sources.Codecs.readStream(
      spark, feedDir, schema,
      format.orElse(graft.sources.Codecs.infer(feedDir)).orElse(Some("parquet")),
      options = feedOptions +
        ("maxFilesPerTrigger" -> maxFilesPerTrigger.toString))
    val deduped = Dedup.streaming(events, watermark)
    // sticky AutoSalt routing state (driver-side, rebuilt on restart: the
    // first batch after any restart re-probes, so a checkpoint resume
    // never trusts a stale decision)
    var saltedRoute = false
    var sinceProbe = Int.MaxValue
    // views cadence state (driver-side; resets on restart — the first
    // maintenance point after a resume heals any accrued lag via catchUp)
    var sinceMaintain = 0
    deduped.writeStream
      .queryName("graft-cdc-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // stream already deduped with watermark state; batch-level dedup
        // again is redundant work we skip
        val effSalt =
          if (saltBuckets != Lww.AutoSalt) saltBuckets
          else if (sinceProbe >= probeEvery) Lww.AutoSalt // probe batch
          else if (saltedRoute) Lww.DefaultSaltBuckets
          else 0
        val committed = applyBatch(table, batch, epochId, effSalt,
          dedup = false, quarantine = quarantine, autoEvolve = autoEvolve,
          capturePreimages = capturePreimages, preimageColumns = preimageColumns)
        if (saltBuckets == Lww.AutoSalt && committed.isDefined) {
          if (effSalt == Lww.AutoSalt) {
            // the probe's decision rides in the snapshot summary
            saltedRoute = committed.get.summary.get("autoSalt").contains("true")
            sinceProbe = 1
          } else sinceProbe += 1
        }
        // maintenance inline with ingest: bound file count and tombstone
        // debt on long replays; compaction commits its own snapshot but
        // keeps the epoch, so the exactly-once check is unaffected.
        // Gated on the batch having actually committed — a crash-redelivered
        // (skipped) batch must not trigger a redundant full-table rewrite.
        if (committed.isDefined && compactEverySnapshots > 0 &&
            (table.currentSnapshotId + 1) % compactEverySnapshots == 0) {
          table.compact()
        }
        if (committed.isDefined && maxFilesPerBucket > 0) {
          val victims = table.compactionCandidates(maxFilesPerBucket)
          if (victims.nonEmpty) table.compactBuckets(victims)
        }
        // derived views fold forward on the maintainEvery cadence
        // (catchUp also heals any lag a previous crash left behind); a
        // skipped replay batch still counts toward the cadence — the
        // folds themselves are epoch-gated, so an extra catch-up is at
        // worst a no-op, never a double fold
        sinceMaintain += 1
        if (sinceMaintain >= maintainEvery) {
          views.foreach(_.catchUpAll())
          sinceMaintain = 0
        }
        ()
      }
      .start()
  }
}

/** Per-micro-batch, per-partition lineage records (north_rule): offset
  * range applied, rows, commit snapshot id — appended driver-side as JSONL
  * under `<table>/lineage/` (one file per epoch; no Spark job on the
  * ingest critical path). Timestamps are pinned to epoch 0: replays must
  * be bit-identical, so wall-clock never enters persisted state.
  */
object LineageLog {
  import graft.lake.Snapshot

  def append(table: LakeTable, epochId: Long, snap: Snapshot): Unit = {
    val dir = s"${table.root}/lineage"
    table.fs.createDirectories(dir)
    table.fs.putStringAtomic(f"$dir/epoch-$epochId%012d.jsonl",
      snap.addedData.map { f =>
        s"""{"epoch_id":$epochId,"partition_id":${f.bucket},"offset_start":${f.minLsn},""" +
          s""""offset_end":${f.maxLsn},"rows_applied":${f.rows},""" +
          s""""snapshot_id":${snap.snapshotId},"committed_at":0}"""
      }.mkString("", "\n", "\n"), createOnly = false)
  }

  def read(table: LakeTable): DataFrame =
    table.spark.read
      .schema("epoch_id LONG, partition_id INT, offset_start LONG, " +
        "offset_end LONG, rows_applied LONG, snapshot_id LONG, committed_at LONG")
      .json(s"${table.root}/lineage")

  /** Lineage is derivable state: the snapshot log carries every per-file
    * stat, so after a crash between commit and lineage append (or a lost
    * metrics dir) the whole log can be reconstructed exactly. Overwrites
    * the lineage dir from the snapshot log.
    */
  def rebuild(table: LakeTable): Unit = {
    val dir = s"${table.root}/lineage"
    table.fs.list(dir).foreach(table.fs.deleteIfExists(_))
    table.snapshots
      .filter(_.summary.get("operation").contains("upsert"))
      .foreach(s => append(table, s.epochId, s))
  }
}
