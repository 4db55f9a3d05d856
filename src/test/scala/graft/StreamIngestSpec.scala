package graft

import graft.feed.{ChangeFeed, FeedConfig}
import graft.lake.LakeTable
import graft.model.Schemas
import graft.stream.CdcIngest
import graft.verify.FoldOracle

/** End-to-end Structured Streaming replay: feed directory → watermarked
  * dedup → LWW → snapshot commits, with exactly-once under kill/restart.
  */
class StreamIngestSpec extends SparkSpec {

  val cfg = FeedConfig(seed = 7L, numEvents = 12000L, numDocs = 300L,
    deletePct = 10, maxTokens = 16)

  test("streaming replay (AvailableNow) matches the fold oracle") {
    val dir = tmpDir("stream")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 6, dupPct = 15)
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 8)
    val q = CdcIngest.run(spark, s"$dir/feed", table, s"$dir/ckpt",
      maxFilesPerTrigger = 3)
    q.awaitTermination()
    val errs = FoldOracle.diff(table.read(), FoldOracle.finalState(cfg))
    assert(errs.isEmpty, errs.take(10).mkString("; "))
    assert(table.lastCommittedEpoch >= 0)
  }

  test("inline auto-compaction during streaming keeps state exact and files bounded") {
    val dir = tmpDir("stream-compact")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 10)
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val q = CdcIngest.run(spark, s"$dir/feed", table, s"$dir/ckpt",
      maxFilesPerTrigger = 1, compactEverySnapshots = 3)
    q.awaitTermination()
    assert(FoldOracle.diff(table.read(), FoldOracle.finalState(cfg)).isEmpty)
    // live files bounded by compaction cadence, not total batch count
    assert(table.liveFiles().size <= 4 * table.numBuckets,
      s"files not bounded: ${table.liveFiles().size}")
    assert(table.snapshots.exists(_.summary.get("operation").contains("compact")))
  }

  test("changesStream tails committed winners; compaction is not re-emitted") {
    import org.apache.spark.sql.functions._
    val c0 = cfg.copy(numEvents = 3000L)
    val dir = tmpDir("cdc-out")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    (0 until 3).foreach { c =>
      import spark.implicits._
      val batch = spark.range(c * 1000L, (c + 1) * 1000L)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(c0, i))).toDF()
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
    }
    // drain the tail into a memory sink
    def drain(name: String): Long = {
      val q = table.changesStream()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$dir/ckpt-$name")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).count()
    }
    val emitted = drain("cdcout1")
    val expected = table.changesBetween(-1L, table.currentSnapshotId).count()
    assert(emitted == expected, s"tail emitted $emitted, log says $expected")
    // a compaction rewrite must NOT re-emit rows it merely moved…
    table.compact()
    assert(drain("cdcout2") == expected)
    // …while a genuine new upsert arrives in the tail
    import spark.implicits._
    val more = spark.range(3000L, 3500L)
      .mapPartitions(_.map(i => graft.feed.EventGen.event(c0, i))).toDF()
    CdcIngest.applyBatch(table, more, epochId = 3L)
    val newRows = table.changesBetween(table.currentSnapshotId - 1,
      table.currentSnapshotId).count()
    assert(drain("cdcout3") == expected + newRows)
    // the tail carries versions and tombstone flags
    assert(spark.table("cdcout3").columns.toSet.contains("_lsn"))
    assert(spark.table("cdcout3").filter(col("_tomb")).count() > 0)
  }

  test("CDC tail is manifest-driven: snapshot-id offsets, no globbing, no phantoms") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val c0 = cfg.copy(numEvents = 2000L)
    val dir = tmpDir("cdc-tail")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    def commitBatch(c: Int): Unit = {
      val batch = spark.range(c * 500L, (c + 1) * 500L)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(c0, i))).toDF()
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
    }
    // SHARED checkpoint across drains: each drain resumes from the last
    // committed snapshot-id offset and emits ONLY the new commits
    // (foreachBatch sink — memory sink cannot recover from a checkpoint)
    def drain(name: String): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = table.changesStream()
        .writeStream.queryName(name)
        .option("checkpointLocation", s"$dir/ckpt-shared")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          total.addAndGet(b.count()); ()
        }
        .start()
      q.awaitTermination()
      total.get()
    }
    commitBatch(0)
    val n0 = drain("tail0")
    assert(n0 == table.changesBetween(-1L, 0L).count())
    commitBatch(1)
    commitBatch(2)
    val n12 = drain("tail1")
    assert(n12 == table.changesBetween(0L, 2L).count(),
      s"resumed tail emitted $n12, expected only snapshots 1..2")
    // phantom immunity: a staged-but-never-committed delta dir (crash
    // between the dir move and the snapshot commit) must emit NOTHING —
    // visibility follows the commit, not the filesystem
    val orphanSrc = java.nio.file.Paths.get(
      s"$dir/t/${table.liveFiles().head.path}").getParent // a real delta dir
    val orphanDst = java.nio.file.Paths.get(s"$dir/t/data/snap-99-phantom")
    val sub = java.nio.file.Files.list(orphanSrc).iterator().next()
    java.nio.file.Files.createDirectories(orphanDst)
    java.nio.file.Files.copy(sub, orphanDst.resolve(sub.getFileName))
    assert(drain("tail2") == 0, "uncommitted orphan dir leaked phantom rows")
    // planning is manifest-driven: the batch for offsets (1, 2] reads
    // EXACTLY the files snapshot 2's manifest recorded — nothing listed,
    // nothing extra (the glob design re-listed the whole tree every
    // trigger). changesBetween IS the source's getBatch planning path.
    val planned = table.changesBetween(1L, 2L)
    val snap2Files = LakeTable.load(spark, s"$dir/t").snapshots
      .find(_.snapshotId == 2L).get.addedData.map(f => s"$dir/t/${f.path}").toSet
    assert(planned.inputFiles.map(p => new java.net.URI(p).getPath).toSet == snap2Files,
      s"planned ${planned.inputFiles.length} files, manifest has ${snap2Files.size}")
    // and the source hands the engine a stream-tagged frame of that plan
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val src = new graft.lake.LakeCdcSource(spark.sqlContext, s"$dir/t", 8, None)
    assert(src.getBatch(Some(LongOffset(1L)), LongOffset(2L)).isStreaming)
  }

  test("changelog completeness: a downstream table rebuilt ONLY from the CDC tail matches upstream") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val c0 = cfg.copy(numEvents = 4000L, deletePct = 15)
    val dir = tmpDir("cdc-replicate")
    val up = LakeTable.create(spark, s"$dir/up", Schemas.docRow, numBuckets = 4)
    (0 until 4).foreach { c =>
      val batch = spark.range(c * 1000L, (c + 1) * 1000L)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(c0, i))).toDF()
      CdcIngest.applyBatch(up, batch, epochId = c.toLong)
    }
    // downstream consumer: re-apply each tailed micro-batch as a change
    // batch (op derived from _tomb, lsn from _lsn) — if the tail is a
    // COMPLETE changelog, downstream state must equal upstream state
    val down = LakeTable.create(spark, s"$dir/down", Schemas.docRow, numBuckets = 2)
    val q = up.changesStream(maxSnapshotsPerTrigger = 1)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, epochId: Long) =>
        val asFeed = b.select(
          when(col(LakeTable.TombCol), "D").otherwise("U").as("op"),
          col("doc_id"), col(LakeTable.LsnCol).as("lsn"),
          col("tokens"), col("n_tok"), col("source"))
        CdcIngest.applyBatch(down, asFeed, epochId)
        ()
      }
      .start()
    q.awaitTermination()
    val a = up.read()
    val b = down.read()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "downstream (changelog-replayed) state diverged from upstream")
    assert(b.count() > 0)
  }

  test("CDC tail survives a mid-stream schema evolution (schema pinned at start)") {
    import spark.implicits._
    val c0 = cfg.copy(numEvents = 1000L)
    val dir = tmpDir("cdc-evolve-tail")
    val writer = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    CdcIngest.applyBatch(writer,
      spark.range(0L, 500L).mapPartitions(_.map(i => graft.feed.EventGen.event(c0, i))).toDF(),
      epochId = 0L)
    // source created (schema pinned) BEFORE the evolution
    val src = new graft.lake.LakeCdcSource(spark.sqlContext, s"$dir/t", 8, None)
    val pinnedCols = src.schema.fieldNames.toSeq
    // table evolves and commits a batch carrying the new column
    writer.evolveSchema(org.apache.spark.sql.types.StructType(
      Schemas.docRow.fields :+
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType, nullable = true)))
    CdcIngest.applyBatch(writer,
      spark.range(500L, 1000L)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(c0, i))).toDF()
        .withColumn("lang", org.apache.spark.sql.functions.lit("en")),
      epochId = 1L)
    // the running source keeps its pinned shape — the engine bound its
    // attributes at start; without pinning this batch would carry an
    // extra column and crash the stream mid-run
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val batch = src.getBatch(Some(LongOffset(0L)), LongOffset(1L))
    assert(batch.columns.toSeq == pinnedCols,
      s"mid-stream batch shape changed: ${batch.columns.toSeq} vs $pinnedCols")
    assert(batch.isStreaming)
    // a RESTARTED tail (new source) picks the evolved schema up
    val src2 = new graft.lake.LakeCdcSource(spark.sqlContext, s"$dir/t", 8, None)
    assert(src2.schema.fieldNames.contains("lang"))
  }

  test("kill mid-replay, restart from checkpoint: final state bit-identical") {
    val dir = tmpDir("stream")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 12)
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 8)

    // phase 1: let a few micro-batches commit, then stop abruptly
    val q1 = CdcIngest.run(spark, s"$dir/feed", table, s"$dir/ckpt",
      maxFilesPerTrigger = 1)
    // wait until at least 2 snapshots are committed, then kill
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (table.currentSnapshotId < 2 && System.nanoTime() < deadline)
      Thread.sleep(50)
    q1.stop()
    q1.awaitTermination()
    val midSnapshots = table.currentSnapshotId
    assert(midSnapshots >= 2, "expected some progress before kill")

    // phase 2: restart from the same checkpoint; the first re-delivered
    // epoch must be skipped by the epoch check, the rest applied once.
    // An abrupt stop can leave the state store mid-commit, which Spark 4
    // surfaces as STATE_STORE_COMMIT_VALIDATION_FAILED on the next run —
    // operationally that means "restart again", and exactly-once must
    // still hold across any number of crash+restart cycles.
    var attempts = 0
    var done = false
    while (!done && attempts < 4) {
      val q2 = CdcIngest.run(spark, s"$dir/feed", table, s"$dir/ckpt",
        maxFilesPerTrigger = 1)
      try { q2.awaitTermination(); done = true }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException =>
        attempts += 1
      }
    }
    assert(done, s"stream did not recover after $attempts restarts")

    val expected = FoldOracle.finalState(cfg)
    val errs = FoldOracle.diff(table.read(), expected)
    assert(errs.isEmpty, errs.take(10).mkString("; "))

    // epochs in the snapshot log are strictly increasing — no double-apply
    val epochs = table.snapshots.map(_.epochId)
    assert(epochs == epochs.sorted && epochs.distinct == epochs,
      s"epochs not strictly increasing: $epochs")
  }

  test("incremental auto-compaction keeps per-bucket file count bounded; state exact") {
    val c = cfg.copy(numEvents = 8000L)
    val dir = tmpDir("stream-autocompact")
    ChangeFeed.writeFeed(spark, c, s"$dir/feed", chunks = 8)
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val q = CdcIngest.run(spark, s"$dir/feed", table, s"$dir/ckpt",
      maxFilesPerTrigger = 1, maxFilesPerBucket = 2)
    q.awaitTermination()
    // 8 micro-batches; without maintenance every bucket would carry 8
    // files — the policy must hold each at <= 2 (bound checked AFTER the
    // final batch, whose own maintenance pass ran before stop)
    val perBucket = table.liveFiles().groupBy(_.bucket).map(_._2.size)
    assert(perBucket.max <= 2,
      s"bucket file counts ${perBucket.mkString(",")} exceed the policy bound")
    // only upserts reach the changelog; maintenance rewrites never re-emit
    val emitted = table.changesBetween(-1L, table.currentSnapshotId).count()
    assert(emitted < table.snapshots.map(_.addedData.map(_.rows).sum).sum)
    // and the replayed state is still bit-exact against the fold oracle
    val errs = FoldOracle.diff(table.read(), FoldOracle.finalState(c))
    assert(errs.isEmpty, errs.take(10).mkString("; "))
  }

  test("AutoSalt ingest: sketch-routed skew handling end-to-end, state matches fold") {
    // half the events on 2 hot keys — the per-batch Misra–Gries probe
    // must engage the salted reduce (plan-level engagement pinned in
    // CdcCoreSpec); here: the full streaming replay with AutoSalt lands
    // bit-exactly on the fold oracle
    val hotCfg = cfg.copy(numEvents = 8000L, hotFraction = 0.7, numHot = 2)
    val dir = tmpDir("stream-autosalt")
    ChangeFeed.writeFeed(spark, hotCfg, s"$dir/feed", chunks = 4)
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val q = CdcIngest.run(spark, s"$dir/feed", table, s"$dir/ckpt",
      maxFilesPerTrigger = 2, saltBuckets = graft.cdc.Lww.AutoSalt,
      probeEvery = 2)
    q.awaitTermination()
    val errs = FoldOracle.diff(table.read(), FoldOracle.finalState(hotCfg))
    assert(errs.isEmpty, errs.take(10).mkString("; "))
    // sticky routing: probe batches record their decision in the snapshot
    // summary (durable lineage); this hot feed must probe salted, and
    // with probeEvery=2 every second committed batch is a probe
    // (an empty final AvailableNow trigger legitimately probes "false" —
    // only non-empty batches carry the skew signal)
    val probes = table.snapshots.filter(_.addedData.nonEmpty)
      .flatMap(_.summary.get("autoSalt"))
    assert(probes.nonEmpty && probes.forall(_ == "true"),
      s"hot feed probes must route salted, got $probes")
    assert(probes.size < table.snapshots.count(_.addedData.nonEmpty),
      "between probes the route must be sticky (no summary key)")
  }

  test("CDC start floors: earliest survives expiry, latest skips history; AvailableNow empty-table ceiling") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    import spark.implicits._
    val c0 = cfg.copy(numEvents = 2000L)
    val dir = tmpDir("cdc-floors")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    (0 until 20).foreach { c =>
      val batch = spark.range(c * 100L, (c + 1) * 100L)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(c0, i))).toDF()
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
    }
    assert(table.expireSnapshots(16L) > 0) // history below ckpt-16 is gone

    // planned files straight off the logical plan — a stream-tagged batch
    // frame refuses batch-side analysis (inputFiles/count)
    def planFiles(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.logical.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.inputFiles.toSet
            case _ => Set.empty[String]
          }
      }.flatten.toSet

    // default floor (genesis): a NEW stream on the expired table cannot
    // start — the motivating failure for startingSnapshotId
    val srcDefault = new graft.lake.LakeCdcSource(spark.sqlContext, s"$dir/t", 100, None)
    intercept[IllegalStateException] {
      srcDefault.getBatch(None, LongOffset(19L))
    }

    // earliest: floor = oldest surviving snapshot; first batch plans
    // exactly the surviving range's files — same as changesBetween
    val srcEarliest = new graft.lake.LakeCdcSource(
      spark.sqlContext, s"$dir/t", 100, Some("earliest"))
    val end = srcEarliest.latestOffset(null, ReadLimit.allAvailable())
    assert(end.asInstanceOf[LongOffset].offset == 19L)
    val got = planFiles(srcEarliest.getBatch(None, LongOffset(19L)))
    val want = planFiles(table.changesBetween(table.oldestSnapshotId - 1L, 19L))
    assert(got == want && got.nonEmpty)

    // latest: floor = head at source creation; the first batch is EMPTY
    // (only commits after stream start flow)
    val srcLatest = new graft.lake.LakeCdcSource(
      spark.sqlContext, s"$dir/t", 100, Some("latest"))
    assert(planFiles(srcLatest.getBatch(None, LongOffset(19L))).isEmpty)
    // ...and a post-start commit flows from the pinned floor
    CdcIngest.applyBatch(table,
      spark.range(2000L, 2100L)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(c0, i))).toDF(),
      epochId = 20L)
    val end2 = srcLatest.latestOffset(null, ReadLimit.allAvailable())
    assert(end2.asInstanceOf[LongOffset].offset == 20L)
    assert(planFiles(srcLatest.getBatch(None, LongOffset(20L))) ==
      planFiles(table.changesBetween(19L, 20L)))

    // AvailableNow on an EMPTY table: the drain ceiling pins at "nothing",
    // so commits racing the drain are NOT consumed this run (the -1
    // no-ceiling sentinel bug would have drained them)
    val empty = LakeTable.create(spark, s"$dir/empty", Schemas.docRow, numBuckets = 1)
    val srcEmpty = new graft.lake.LakeCdcSource(spark.sqlContext, s"$dir/empty", 100, None)
    srcEmpty.prepareForTriggerAvailableNow()
    CdcIngest.applyBatch(empty,
      spark.range(0L, 50L)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(c0, i))).toDF(),
      epochId = 0L)
    assert(srcEmpty.latestOffset(null, ReadLimit.allAvailable()) == null,
      "AvailableNow drain on an empty table consumed a mid-drain commit")
  }
}
