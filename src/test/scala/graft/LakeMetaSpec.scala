package graft

import org.apache.spark.sql.functions._

import graft.feed.{ChangeFeed, FeedConfig}
import graft.lake.LakeTable
import graft.model.Schemas
import graft.stream.CdcIngest
import graft.verify.FoldOracle

/** Metadata-plane scale contract: the snapshot log rolls up into periodic
  * checkpoint files, so a cold `load()` parses O(CheckpointInterval)
  * metadata files — NOT O(epochs). At the 10^10-event target (~500k
  * snapshots at 20k-event batches) an O(epochs) cold start would dominate
  * the job; this suite replays 200 epochs and pins the bound.
  */
class LakeMetaSpec extends SparkSpec {

  test("200-epoch replay: cold load parses O(interval) metadata files, state exact") {
    val dir = tmpDir("lake-meta")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 1)
    val cfg = FeedConfig(seed = 11L, numEvents = 1000L, numDocs = 120L,
      deletePct = 10, maxTokens = 4)
    val events = ChangeFeed.events(spark, cfg).toDF().cache()
    events.count()
    (0 until 200).foreach { c =>
      CdcIngest.applyBatch(table,
        events.filter(col("lsn").between(c * 5L, c * 5L + 4L)), epochId = c.toLong)
    }
    assert(table.currentSnapshotId == 199L)
    // roll-up artifacts exist on disk
    import scala.jdk.CollectionConverters._
    val metaNames = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/t/meta"))
      .iterator().asScala.map(_.getFileName.toString).toSeq
    assert(metaNames.count(_.startsWith("ckpt-")) >= 10,
      s"expected periodic checkpoints, found ${metaNames.count(_.startsWith("ckpt-"))}")
    assert(metaNames.count(_.startsWith("snap-")) == 200)

    // COLD load: driving the hot path (state + schema + merged read) may
    // parse the latest checkpoint plus the tail after it — never the
    // whole 200-snapshot log
    val t2 = LakeTable.load(spark, s"$dir/t")
    val merged = t2.read()
    assert(t2.metaFilesParsed <= LakeTable.CheckpointInterval + 4,
      s"cold load parsed ${t2.metaFilesParsed} metadata files — O(epochs) regression")

    // the rolled-up fold is EXACT: merged state matches the event-by-event
    // in-memory oracle bit-for-bit
    val errs = FoldOracle.diff(merged, FoldOracle.finalState(cfg))
    assert(errs.isEmpty, errs.take(10).mkString("; "))

    // a polling reader advances incrementally: one new commit costs one
    // metadata parse, not a re-fold
    CdcIngest.applyBatch(table,
      events.filter(col("lsn") === 0L).withColumn("lsn", lit(5000L)),
      epochId = 200L)
    val before = t2.metaFilesParsed
    t2.refresh()
    assert(t2.currentSnapshotId == 200L)
    assert(t2.metaFilesParsed - before <= 2,
      s"refresh parsed ${t2.metaFilesParsed - before} files for one new commit")

    // full-history APIs (time travel, audits) still see every snapshot
    val t3 = LakeTable.load(spark, s"$dir/t")
    assert(t3.snapshots.size == 201)
    assert(t3.readAt(49L).count() > 0)
    assert(t3.lastCommittedEpoch == 200L)

    // expiry bounds the on-disk metadata file count; the rolled-up fold
    // keeps the current state exact, and expired time travel fails LOUDLY
    val removed = t3.expireSnapshots(180L)
    assert(removed > 150, s"expired only $removed files")
    val left = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/t/meta"))
      .iterator().asScala.map(_.getFileName.toString).toSeq
    assert(left.count(_.startsWith("snap-")) <= 200 - 180 + LakeTable.CheckpointInterval)
    assert(left.count(_.startsWith("ckpt-")) == 1)
    val t4 = LakeTable.load(spark, s"$dir/t")
    // identical merged state before and after expiry (data files untouched)
    assert(t4.read().exceptAll(t3.read()).isEmpty &&
      t3.read().exceptAll(t4.read()).isEmpty)
    assert(t4.metaFilesParsed <= LakeTable.CheckpointInterval + 4)
    val ex = intercept[IllegalArgumentException] { t4.readAt(49L).count() }
    assert(ex.getMessage.contains("expired"))
    // the CDC tail above the horizon still plans (recent range intact)
    assert(t4.changesBetween(195L, 200L).count() > 0)
    // …and a range that crosses the horizon fails LOUDLY (a silently
    // incomplete changelog would corrupt every downstream consumer)
    val gap = intercept[IllegalStateException] { t4.changesBetween(100L, 200L).count() }
    assert(gap.getMessage.contains("expired"))
  }

  test("disk-reclaim lifecycle: compact + expire + gc leaves only live data, state exact") {
    val dir = tmpDir("lake-reclaim")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    val cfg = FeedConfig(seed = 5L, numEvents = 4000L, numDocs = 300L,
      deletePct = 6, maxTokens = 16)
    // 16 upserts put the compaction at snapshot 16 = a checkpoint
    // boundary, so the whole pre-compaction history is expirable (expiry
    // floors at the newest checkpoint — the rolled-up fold must survive)
    val chunks = 16; val per = (cfg.numEvents + chunks - 1) / chunks
    val c0 = cfg
    (0 until chunks).foreach { c =>
      import graft.feed.EventGen
      val lo = c * per; val hi = math.min(cfg.numEvents, lo + per)
      import spark.implicits._
      val batch = spark.range(lo, hi)
        .mapPartitions(_.map(i => EventGen.event(c0, i))).toDF()
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
    }
    val expected = FoldOracle.finalState(cfg)
    assert(FoldOracle.diff(table.read(), expected).isEmpty)
    val dirsBefore = table.fs.list(s"$dir/t/data").size
    assert(dirsBefore >= chunks, "each epoch should have its own delta dir")
    // the reclaim sequence a maintenance job runs: fold the history into
    // one live set, drop the below-horizon snapshots, collect the now
    // unreferenced delta dirs
    table.compact()
    table.expireSnapshots(table.currentSnapshotId)
    val deleted = table.gcOrphanData()
    assert(deleted.nonEmpty, "expired pre-compaction deltas must be reclaimable")
    // disk now holds exactly the dirs the live set references
    val liveDirs = table.liveFiles().map(_.path.split('/')(1)).distinct.size
    assert(table.fs.list(s"$dir/t/data").size == liveDirs,
      "gc must reclaim every unreferenced delta dir and keep every live one")
    // and the table is still bit-exact — cold-loaded, post-reclaim
    assert(FoldOracle.diff(
      LakeTable.load(spark, s"$dir/t").read(), expected).isEmpty)
  }

  test("expiry keeps ABOVE-horizon time travel: asOf folds checkpoint + surviving tail") {
    val dir = tmpDir("lake-expire-tt")
    val writer = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 1)
    val cfg = FeedConfig(seed = 17L, numEvents = 200L, numDocs = 40L,
      deletePct = 10, maxTokens = 4)
    val events = ChangeFeed.events(spark, cfg).toDF().cache()
    events.count()
    (0 until 20).foreach { c =>
      CdcIngest.applyBatch(writer,
        events.filter(col("lsn").between(c * 10L, c * 10L + 9L)), epochId = c.toLong)
    }
    // snapshot states captured BEFORE expiry: at the checkpoint (16),
    // between checkpoint and head (17), and at the head (19)
    val at16 = writer.readAt(16L).collect().toSet
    val at17 = writer.readAt(17L).collect().toSet
    val at19 = writer.readAt(19L).collect().toSet
    assert(writer.expireSnapshots(16L) > 0)
    val t = LakeTable.load(spark, s"$dir/t")
    // above (or at) the surviving checkpoint: bit-identical reconstruction
    assert(t.readAt(16L).collect().toSet == at16)
    assert(t.readAt(17L).collect().toSet == at17)
    assert(t.readAt(19L).collect().toSet == at19)
    // below every surviving checkpoint: loud refusal, honest message
    val ex = intercept[IllegalArgumentException] { t.readAt(3L).count() }
    assert(ex.getMessage.contains("no checkpoint at or below"))
  }

  test("lagging reader rebases onto the checkpoint when its tail is expired under it") {
    val dir = tmpDir("lake-lag")
    val writer = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 1)
    val cfg = FeedConfig(seed = 13L, numEvents = 200L, numDocs = 40L,
      deletePct = 10, maxTokens = 4)
    val events = ChangeFeed.events(spark, cfg).toDF().cache()
    events.count()
    def commitRange(ids: Range): Unit = ids.foreach { c =>
      CdcIngest.applyBatch(writer,
        events.filter(col("lsn").between(c * 10L, c * 10L + 9L)), epochId = c.toLong)
    }
    commitRange(0 until 6)
    // reader folds the tail up to snapshot 5 (no checkpoint exists yet)
    val reader = LakeTable.load(spark, s"$dir/t")
    assert(reader.currentSnapshotId == 5L)
    // writer advances through the roll-up boundary and expires the prefix
    commitRange(6 until 20)
    assert(writer.expireSnapshots(16L) > 0)
    // the reader's next tail file (snap-6) is GONE: a plain probe loop
    // would stall at 5 forever — the version hint forces a rebase onto
    // the newest checkpoint, and state lands exactly on the writer's
    reader.refresh()
    assert(reader.currentSnapshotId == 19L,
      s"lagging reader stalled at ${reader.currentSnapshotId}")
    val a = reader.read()
    val b = writer.read()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
