package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.feed.{ChangeFeed, FeedConfig}
import graft.lake.{LakeTable, MatView}
import graft.model.Schemas
import graft.stream.CdcIngest

/** Incremental aggregate view: equal to the full recompute after every
  * maintain, under updates (group-migrating — the feed's `source` varies
  * per event), deletes, replays, and bounded catch-up steps.
  */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = FeedConfig(seed = 7L, numEvents = 6000L, numDocs = 150L,
    deletePct = 10, maxTokens = 16)

  private def recompute(base: LakeTable): Set[(String, Long, Long)] =
    base.read().groupBy(col("source"))
      .agg(count(lit(1)).as("cnt"),
        sum(coalesce(element_at(col("tokens"), 1).cast("long"), lit(0L))).as("sum_tok0"))
      .as[(String, Long, Long)].collect().toSet

  private def viewSet(v: MatView): Set[(String, Long, Long)] =
    v.read().select(col("source"), col("cnt"), col("sum_tok0"))
      .as[(String, Long, Long)].collect().toSet

  private def replayChunks(dir: String, table: LakeTable, chunks: Int,
                           from: Int, until: Int): Unit = {
    val feed = spark.read.schema(Schemas.changeEvent).parquet(s"$dir/feed")
    val per = math.max(1L, (cfg.numEvents + chunks - 1) / chunks)
    (from until until).foreach { c =>
      val batch = feed.filter(col("lsn").between(c * per, (c + 1) * per - 1))
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
    }
  }

  test("bootstrap == full recompute; incremental steps stay equal to it") {
    val dir = tmpDir("mv1")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 4)
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    replayChunks(dir, base, chunks = 4, from = 0, until = 2)

    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    // bootstrap folds the full current state at the head snapshot
    assert(v.maintain().contains(base.currentSnapshotId))
    assert(viewSet(v) == recompute(base))

    // two more chunks; maintain after each — updates migrate keys across
    // sources and deletes retract, and the view tracks exactly
    (2 until 4).foreach { c =>
      replayChunks(dir, base, chunks = 4, from = c, until = c + 1)
      assert(v.maintain().contains(base.currentSnapshotId))
      assert(viewSet(v) == recompute(base))
    }
  }

  test("maintain is exactly-once: caught-up view no-ops, replays are inert") {
    val dir = tmpDir("mv2")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 2)
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    replayChunks(dir, base, chunks = 2, from = 0, until = 2)
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    assert(v.maintain().isDefined)
    val settled = viewSet(v)
    // no new base snapshots → nothing to fold
    assert(v.maintain().isEmpty)
    assert(viewSet(v) == settled)
    // a reloaded view (crash-restart analog) sees the same frontier
    val r = MatView.load(spark, s"$dir/v", base)
    assert(r.maintain().isEmpty)
    assert(viewSet(r) == settled)
  }

  test("bounded catch-up (maxSnapshots=1) lands on the same view as one shot") {
    val dir = tmpDir("mv3")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 4)
    val baseA = LakeTable.create(spark, s"$dir/ta", Schemas.docRow, numBuckets = 4)
    replayChunks(dir, baseA, chunks = 4, from = 0, until = 4)
    // stepper: bootstrap at snapshot 0's head, then one snapshot at a time
    val stepped = MatView.create(spark, s"$dir/vs", baseA, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    // force the bootstrap to happen mid-history: bootstrap on a second
    // table replayed to chunk 1, then catch up on the full one
    assert(stepped.catchUp(maxSnapshotsPerStep = 1) == baseA.currentSnapshotId)
    val oneShot = MatView.create(spark, s"$dir/vo", baseA, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    oneShot.catchUp()
    assert(viewSet(stepped) == viewSet(oneShot))
    assert(viewSet(stepped) == recompute(baseA))
  }

  test("vanished group is tombstoned out; null group values are distinct groups") {
    val dir = tmpDir("mv4")
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    def batch(rows: Seq[(String, String, Long, Seq[Int], String)], epoch: Long): Unit = {
      val df = rows.toDF("op", "doc_id", "lsn", "tokens", "source")
        .select(col("op"), col("doc_id"), col("lsn"),
          current_timestamp().as("ts"),
          when(col("op") === "D", lit(null)).otherwise(col("tokens")).as("tokens"),
          when(col("op") === "D", lit(null))
            .otherwise(size(col("tokens"))).cast("int").as("n_tok"),
          col("source"))
      CdcIngest.applyBatch(base, df, epochId = epoch)
    }
    batch(Seq(("I", "a", 1L, Seq(5), "g1"), ("I", "b", 2L, Seq(7), "g1"),
      ("I", "c", 3L, Seq(9), null)), 0L)
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    v.maintain()
    assert(viewSet(v) == Set(("g1", 2L, 12L), (null, 1L, 9L)))
    // delete a + migrate b to g2 → g1 vanishes entirely
    batch(Seq(("D", "a", 10L, null, "g1"), ("U", "b", 11L, Seq(8), "g2")), 1L)
    v.maintain()
    assert(viewSet(v) == Set(("g2", 1L, 8L), (null, 1L, 9L)))
    assert(viewSet(v) == recompute(base))
    // the g1 row is a real tombstone in the view table, not a zero row
    assert(v.table.read().filter(col("source") === "g1").isEmpty)
  }

  test("min/max + count(distinct key) stay exact through deletes and value moves " +
      "(decomposable: hybrid fold + cnt-alias); legacy recompute mode too") {
    val dir = tmpDir("mv8")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 4)
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    replayChunks(dir, base, chunks = 4, from = 0, until = 2)
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      sums = Seq("sum_tok0" -> "element_at(tokens, 1)"),
      recomputed = Seq("min_tok0" -> "min(element_at(tokens, 1))",
        "max_ntok" -> "max(n_tok)", "n_docs" -> "count(distinct doc_id)"))
    // the LEGACY affected-group recompute path, still exercised by any
    // non-decomposable entry (count distinct over an EXPRESSION)
    val legacy = MatView.create(spark, s"$dir/vl", base, Seq("source"),
      recomputed = Seq("nd_tok" -> "count(distinct element_at(tokens, 1))"))
    def expectedLegacy: Set[(String, Long, Long)] =
      base.read().groupBy(col("source"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(element_at(col("tokens"), 1)).as("nd"))
        .as[(String, Long, Long)].collect().toSet
    def gotLegacy: Set[(String, Long, Long)] =
      legacy.read().select(col("source"), col("cnt"), col("nd_tok"))
        .as[(String, Long, Long)].collect().toSet
    def expected: Set[(String, Long, Long, Int, Int, Long)] =
      base.read().groupBy(col("source"))
        .agg(count(lit(1)).as("cnt"),
          sum(coalesce(element_at(col("tokens"), 1).cast("long"), lit(0L))).as("s"),
          min(element_at(col("tokens"), 1)).as("mn"),
          max(col("n_tok")).as("mx"),
          countDistinct(col("doc_id")).as("nd"))
        .as[(String, Long, Long, Int, Int, Long)].collect().toSet
    def got: Set[(String, Long, Long, Int, Int, Long)] =
      v.read().select(col("source"), col("cnt"), col("sum_tok0"),
          col("min_tok0"), col("max_ntok"), col("n_docs"))
        .as[(String, Long, Long, Int, Int, Long)].collect().toSet
    v.maintain() // bootstrap carries the recompute aggs too
    legacy.maintain()
    assert(got == expected)
    assert(gotLegacy == expectedLegacy)
    (2 until 4).foreach { c =>
      replayChunks(dir, base, chunks = 4, from = c, until = c + 1)
      assert(v.maintain().contains(base.currentSnapshotId))
      assert(legacy.maintain().contains(base.currentSnapshotId))
      assert(got == expected) // deletes can RAISE the min — hybrid recomputes the hit group
      assert(gotLegacy == expectedLegacy)
      // count(distinct doc_id) rides the cnt-alias: no stack tables
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/v/aux/cd-n_docs-pairs")))
    }
    // a reloaded view keeps its recompute definition
    val r = MatView.load(spark, s"$dir/v", base)
    assert(r.maintain().isEmpty)
    // a non-aggregate recompute expression fails at create, not at maintain
    intercept[Exception] {
      MatView.create(spark, s"$dir/v2", base, Seq("source"),
        recomputed = Seq("bad" -> "element_at(tokens, 1)"))
    }
  }

  test("writer-captured preimages: batch-proportional folds, no base scan") {
    val dir = tmpDir("mv9")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 4)
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val feed = spark.read.schema(Schemas.changeEvent).parquet(s"$dir/feed")
    val per = math.max(1L, (cfg.numEvents + 3) / 4)
    def chunk(c: Int) = feed.filter(col("lsn").between(c * per, (c + 1) * per - 1))
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    (0 until 3).foreach { c =>
      CdcIngest.applyBatch(base, chunk(c), epochId = c.toLong,
        capturePreimages = true)
      assert(v.maintain().contains(base.currentSnapshotId))
      assert(viewSet(v) == recompute(base))
    }
    // the fold's before-image frame reads ONLY preimage files — the
    // proof the fold never scanned the base
    val bi = base.beforeImages(base.snapshots.head.snapshotId,
      base.currentSnapshotId, Seq("source", "tokens"))
    assert(bi.isDefined)
    assert(bi.get.inputFiles.nonEmpty &&
      bi.get.inputFiles.forall(_.contains("/preimages/")), bi.get.inputFiles.toSeq)
    // first-touch stitching: the before-image equals the true as-of state
    val from = base.snapshots.head.snapshotId
    val viaScan = base.mergedWinners(Some(from), Seq("source"))
      .join(base.changesBetween(from, base.currentSnapshotId)
        .select("doc_id").distinct(), Seq("doc_id"), "left_semi")
      .collect().map(_.toString).sorted.toSeq
    val viaPre = base.beforeImages(from, base.currentSnapshotId, Seq("source"))
      .get.collect().map(_.toString).sorted.toSeq
    assert(viaPre == viaScan)
    // a batch ingested WITHOUT capture poisons the range → loud fallback
    // to the scan path, results still exact
    CdcIngest.applyBatch(base, chunk(3), epochId = 3L)
    assert(base.beforeImages(from, base.currentSnapshotId).isEmpty)
    assert(v.maintain().contains(base.currentSnapshotId))
    assert(viewSet(v) == recompute(base))
  }

  test("projected preimage capture: narrower than the view's needs → fallback") {
    val dir = tmpDir("mv10")
    ChangeFeed.writeFeed(spark, cfg.copy(numEvents = 2000L), s"$dir/feed", chunks = 2)
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    val feed = spark.read.schema(Schemas.changeEvent).parquet(s"$dir/feed")
    CdcIngest.applyBatch(base, feed.filter(col("lsn") < 1000), epochId = 0L,
      capturePreimages = true, preimageColumns = Seq("source", "n_tok"))
    val snap0 = base.currentSnapshotId
    CdcIngest.applyBatch(base, feed.filter(col("lsn") >= 1000), epochId = 1L,
      capturePreimages = true, preimageColumns = Seq("source", "n_tok"))
    // covered request: served from preimage files
    val ok = base.beforeImages(snap0, base.currentSnapshotId, Seq("source", "n_tok"))
    assert(ok.isDefined && ok.get.inputFiles.forall(_.contains("/preimages/")))
    // tokens was NOT captured — nulls there would be wrong VALUES, so the
    // request must refuse preimages entirely
    assert(base.beforeImages(snap0, base.currentSnapshotId,
      Seq("source", "tokens")).isEmpty)
    // and a view over the captured columns stays exact end to end
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("s_ntok" -> "n_tok"))
    v.catchUpAll()
    val want = base.read().groupBy(col("source"))
      .agg(count(lit(1)).as("c"),
        sum(coalesce(col("n_tok").cast("long"), lit(0L))).as("s"))
      .collect().map(_.toString).sorted.toSeq
    assert(v.read().select(col("source"), col("cnt"), col("s_ntok"))
      .collect().map(_.toString).sorted.toSeq == want)
  }

  test("key created then updated across two captured snapshots, ONE fold: " +
      "its absence of a before-image is explicit, never a later capture") {
    val dir = tmpDir("mv11")
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    def apply(rows: Seq[(String, String, Long, Seq[Int], String)], e: Long): Unit = {
      val df = rows.toDF("op", "doc_id", "lsn", "tokens", "source")
        .select(col("op"), col("doc_id"), col("lsn"),
          current_timestamp().as("ts"), col("tokens"),
          size(col("tokens")).cast("int").as("n_tok"), col("source"))
      CdcIngest.applyBatch(base, df, epochId = e, capturePreimages = true)
    }
    // snap 1: background rows the view bootstraps over
    apply(Seq(("I", "a", 1L, Seq(10), "s1"), ("I", "b", 2L, Seq(20), "s2")), 0L)
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    v.maintain()
    assert(viewSet(v) == Set(("s1", 1L, 10L), ("s2", 1L, 20L)))
    // snap 2 CREATES x in s2; snap 3 UPDATES x (still s2). The view does
    // NOT maintain between them — one fold spans both snapshots. x's
    // before-image as-of the frontier does not exist; snap 3's capture
    // holds x@snap2 (an intra-range state) and must NOT be used as one —
    // a fold that retracts it drives s2's cnt to 0 and tombstones the
    // whole group (the round-5 ADVICE repro).
    apply(Seq(("I", "x", 10L, Seq(5), "s2")), 1L)
    apply(Seq(("U", "x", 11L, Seq(7), "s2")), 2L)
    // the fold must come from preimages (captures cover the range)…
    val from = v.table.lastCommittedEpoch
    val bi = base.beforeImages(from, base.currentSnapshotId, Seq("source", "tokens"))
    assert(bi.isDefined &&
      bi.get.inputFiles.forall(_.contains("/preimages/")))
    // …and x must have NO before-image row in it
    assert(bi.get.filter(col("doc_id") === "x").isEmpty)
    v.maintain()
    assert(viewSet(v) == Set(("s1", 1L, 10L), ("s2", 2L, 27L)))
    assert(viewSet(v) == recompute(base))
  }

  test("expireSnapshots garbage-collects preimage captures below the horizon") {
    val dir = tmpDir("mv12")
    ChangeFeed.writeFeed(spark, cfg.copy(numEvents = 2000L), s"$dir/feed", chunks = 4)
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    val feed = spark.read.schema(Schemas.changeEvent).parquet(s"$dir/feed")
    val chunks = 20 // past CheckpointInterval, so expiry has a checkpoint
    val per = 100L
    (0 until chunks).foreach { c =>
      CdcIngest.applyBatch(base,
        feed.filter(col("lsn").between(c * per, (c + 1) * per - 1)),
        epochId = c.toLong, capturePreimages = true)
    }
    val preRoot = new java.io.File(s"$dir/t/preimages")
    assert(preRoot.listFiles().count(_.getName.startsWith("epoch-")) == chunks)
    base.expireSnapshots(base.currentSnapshotId - 3)
    val left = preRoot.listFiles().map(_.getName).toSet
    // epochs of surviving upsert snapshots keep BOTH dirs; expired lose both
    val surviving = base.snapshots
      .filter(s => s.summary.get("operation").contains("upsert"))
      .map(_.epochId).toSet
    assert(left.count(_.startsWith("epoch-")) == surviving.size)
    assert(left.count(_.startsWith("keys-epoch-")) == surviving.size)
    left.foreach { n =>
      val ep = n.stripPrefix("keys-").stripPrefix("epoch-").toLong
      assert(surviving.contains(ep), s"unexpired garbage: $n")
    }
    // the surviving range still serves beforeImages from preimages
    val from = base.snapshots.head.snapshotId
    val bi = base.beforeImages(from, base.currentSnapshotId, Seq("source"))
    assert(bi.isDefined && bi.get.inputFiles.forall(_.contains("/preimages/")))
  }

  test("late lower-lsn versions across maintains contribute nothing (LWW fold)") {
    val dir = tmpDir("mv7")
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    def apply(rows: Seq[(String, String, Long, Seq[Int], String)], e: Long): Unit = {
      val df = rows.toDF("op", "doc_id", "lsn", "tokens", "source")
        .select(col("op"), col("doc_id"), col("lsn"),
          current_timestamp().as("ts"),
          when(col("op") === "D", lit(null)).otherwise(col("tokens")).as("tokens"),
          when(col("op") === "D", lit(null))
            .otherwise(size(col("tokens"))).cast("int").as("n_tok"),
          col("source"))
      CdcIngest.applyBatch(base, df, epochId = e)
    }
    apply(Seq(("I", "x", 100L, Seq(10), "g1"), ("D", "z", 90L, null, "g1")), 0L)
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    v.maintain()
    assert(viewSet(v) == Set(("g1", 1L, 10L)))
    // a LATE batch: x@50 into g2 (loses to x@100), z@40 insert (loses to
    // the z@90 tombstone) — the base merge ignores both; so must the view
    apply(Seq(("U", "x", 50L, Seq(99), "g2"), ("I", "z", 40L, Seq(7), "g2")), 1L)
    v.maintain()
    assert(viewSet(v) == Set(("g1", 1L, 10L)))
    assert(viewSet(v) == recompute(base))
    // and a genuinely newer version still wins
    apply(Seq(("U", "x", 200L, Seq(3), "g2")), 2L)
    v.maintain()
    assert(viewSet(v) == Set(("g2", 1L, 3L)))
    assert(viewSet(v) == recompute(base))
  }

  test("streaming ingest keeps attached views fresh; restart resumes both") {
    val dir = tmpDir("mv6")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 4)
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    CdcIngest.run(spark, s"$dir/feed", base, s"$dir/ckpt",
      maxFilesPerTrigger = 2, views = Seq(v)).awaitTermination()
    assert(viewSet(v) == recompute(base))
    // view frontier rides the base head — fresh, not lagging
    assert(v.table.lastCommittedEpoch == base.currentSnapshotId)
    // restart with more feed: both resume from their checkpoints/frontiers
    ChangeFeed.writeFeed(spark,
      cfg.copy(seed = 8L, numEvents = 2000L), s"$dir/feed2", chunks = 2)
    val more = spark.read.schema(Schemas.changeEvent).parquet(s"$dir/feed2")
      .withColumn("lsn", col("lsn") + lit(cfg.numEvents))
    more.write.mode("append").parquet(s"$dir/feed")
    CdcIngest.run(spark, s"$dir/feed", base, s"$dir/ckpt",
      maxFilesPerTrigger = 2, views = Seq(v)).awaitTermination()
    assert(viewSet(v) == recompute(base))
  }

  test("EXACT decomposable count-distinct via stacked views: " +
      "MatView(source,n_tok) → MatView(source), zero recompute at both levels") {
    // count(distinct x) per group cannot be retracted in one view — but
    // a STACK of two decomposable views computes it exactly: v1 counts
    // per (group, x) pair (zero-net pairs tombstone out), v2 counts
    // v1's LIVE pairs per group = the distinct-x count. Both levels fold
    // O(changed keys); the single-view alternative re-aggregates every
    // touched group from base (the documented recompute mode).
    val dir = tmpDir("mv14")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 4)
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val v1 = MatView.create(spark, s"$dir/v1", base, Seq("source", "n_tok"))
    val v2 = MatView.create(spark, s"$dir/v2", v1.table, Seq("source"))
    def expected: Set[(String, Long)] =
      base.read().groupBy(col("source"))
        .agg(countDistinct(col("n_tok")).as("nd"))
        .as[(String, Long)].collect().toSet
    def got: Set[(String, Long)] =
      v2.read().select(col("source"), col("cnt"))
        .as[(String, Long)].collect().toSet
    (0 until 4).foreach { c =>
      replayChunks(dir, base, chunks = 4, from = c, until = c + 1)
      v1.maintain(); v2.maintain()
      assert(got == expected,
        s"stacked distinct-count diverged after chunk $c")
      if (c > 0) { // post-bootstrap folds: both levels stay decomposable
        assert(v1.lastRecomputedGroups == 0L)
        assert(v2.lastRecomputedGroups == 0L)
      }
    }
    // the stack attaches to ingest as ordered views (v1 before v2)
    ChangeFeed.writeFeed(spark,
      cfg.copy(seed = 11L, numEvents = 1200L), s"$dir/feed2", chunks = 1)
    spark.read.schema(Schemas.changeEvent).parquet(s"$dir/feed2")
      .withColumn("lsn", col("lsn") + lit(cfg.numEvents))
      .write.mode("append").parquet(s"$dir/feed")
    CdcIngest.run(spark, s"$dir/feed", base, s"$dir/ckpt",
      maxFilesPerTrigger = 2, views = Seq(v1, v2)).awaitTermination()
    assert(got == expected)
  }

  test("maintainEvery=4: view folds on the cadence, lands fold-oracle exact") {
    val dir = tmpDir("mv13")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 8)
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    // one file per micro-batch; K=4 → the view maintains once per FOUR
    // base commits (each maintenance point = ONE multi-snapshot fold),
    // not once per batch
    CdcIngest.run(spark, s"$dir/feed", base, s"$dir/ckpt",
      maxFilesPerTrigger = 1, views = Seq(v), maintainEvery = 4)
      .awaitTermination()
    val nb = base.snapshots.size
    assert(nb >= 8, s"need enough batches to see the cadence, got $nb")
    assert(v.table.snapshots.size == nb / 4,
      s"K=4 over $nb batches must fold ${nb / 4} times, " +
        s"got ${v.table.snapshots.size}")
    if (nb % 4 == 0)
      assert(v.table.lastCommittedEpoch == base.currentSnapshotId)
    else // bounded staleness: at most K−1 batches behind, healed on demand
      assert(v.table.lastCommittedEpoch < base.currentSnapshotId)
    v.catchUpAll()
    assert(viewSet(v) == recompute(base))
    // restart with ONE more feed file: under K=4 the lone batch is below
    // the cadence, the view stays lagging, and an explicit catchUp syncs
    ChangeFeed.writeFeed(spark,
      cfg.copy(seed = 9L, numEvents = 400L), s"$dir/feed2", chunks = 1)
    spark.read.schema(Schemas.changeEvent).parquet(s"$dir/feed2")
      .withColumn("lsn", col("lsn") + lit(cfg.numEvents))
      .coalesce(1).write.mode("append").parquet(s"$dir/feed")
    CdcIngest.run(spark, s"$dir/feed", base, s"$dir/ckpt",
      maxFilesPerTrigger = 1, views = Seq(v), maintainEvery = 4)
      .awaitTermination()
    assert(base.snapshots.size == nb + 1, "exactly one new batch expected")
    assert(v.table.lastCommittedEpoch < base.currentSnapshotId,
      "1 batch under K=4 must leave the view lagging (bounded staleness)")
    v.catchUpAll()
    assert(viewSet(v) == recompute(base))
  }

  test("value-only update (same group, same count) still moves the sum") {
    val dir = tmpDir("mv5")
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    val mk = (op: String, id: String, lsn: Long, tok: Int) =>
      (op, id, lsn, Seq(tok), "g")
    def apply(rows: Seq[(String, String, Long, Seq[Int], String)], e: Long): Unit = {
      val df = rows.toDF("op", "doc_id", "lsn", "tokens", "source")
        .select(col("op"), col("doc_id"), col("lsn"),
          current_timestamp().as("ts"), col("tokens"),
          size(col("tokens")).cast("int").as("n_tok"), col("source"))
      CdcIngest.applyBatch(base, df, epochId = e)
    }
    apply(Seq(mk("I", "x", 1L, 10), mk("I", "y", 2L, 20)), 0L)
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("sum_tok0" -> "element_at(tokens, 1)"))
    v.maintain()
    assert(viewSet(v) == Set(("g", 2L, 30L)))
    apply(Seq(mk("U", "x", 5L, 17)), 1L) // cnt delta 0, sum delta +7
    v.maintain()
    assert(viewSet(v) == Set(("g", 2L, 37L)))
  }

  test("hybrid min/max: insert-only and below-extreme folds never touch base; " +
      "at-extreme retractions recompute ONLY the hit group") {
    val dir = tmpDir("mv11")
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    val mk = (op: String, id: String, lsn: Long, tok: Int, src: String) =>
      (op, id, lsn, Seq(tok), src)
    def apply(rows: Seq[(String, String, Long, Seq[Int], String)], e: Long): Unit = {
      val df = rows.toDF("op", "doc_id", "lsn", "tokens", "source")
        .select(col("op"), col("doc_id"), col("lsn"),
          current_timestamp().as("ts"), col("tokens"),
          size(col("tokens")).cast("int").as("n_tok"), col("source"))
      CdcIngest.applyBatch(base, df, epochId = e)
    }
    def mmSet(v: MatView): Set[(String, Long, Int, Int)] =
      v.read().select(col("source"), col("cnt"), col("mn"), col("mx"))
        .as[(String, Long, Int, Int)].collect().toSet

    // g1: {10, 20, 30}   g2: {5, 7}
    apply(Seq(mk("I", "a", 1L, 10, "g1"), mk("I", "b", 2L, 20, "g1"),
      mk("I", "c", 3L, 30, "g1"), mk("I", "d", 4L, 5, "g2"),
      mk("I", "e", 5L, 7, "g2")), 0L)
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      recomputed = Seq("mn" -> "min(element_at(tokens, 1))",
        "mx" -> "max(element_at(tokens, 1))"))
    v.maintain() // bootstrap
    assert(mmSet(v) == Set(("g1", 3L, 10, 30), ("g2", 2L, 5, 7)))

    // insert-only fold: extremes decomposable, ZERO base re-aggregation
    apply(Seq(mk("I", "f", 6L, 2, "g1"), mk("I", "g", 7L, 9, "g2")), 1L)
    v.maintain()
    assert(v.lastRecomputedGroups == 0L)
    assert(mmSet(v) == Set(("g1", 4L, 2, 30), ("g2", 3L, 5, 9)))

    // delete strictly inside (20 ∈ g1 is neither min nor max): no recompute
    apply(Seq(mk("D", "b", 8L, 20, "g1")), 2L)
    v.maintain()
    assert(v.lastRecomputedGroups == 0L)
    assert(mmSet(v) == Set(("g1", 3L, 2, 30), ("g2", 3L, 5, 9)))

    // delete g1's max holder: recompute exactly ONE group (g2 untouched)
    apply(Seq(mk("D", "c", 9L, 30, "g1")), 3L)
    v.maintain()
    assert(v.lastRecomputedGroups == 1L)
    assert(mmSet(v) == Set(("g1", 2L, 2, 10), ("g2", 3L, 5, 9)))

    // value-only update moving a min DOWN (7→3; neither old nor new value
    // is at a stored extreme): insert side absorbs it, no recompute
    apply(Seq(mk("U", "e", 10L, 3, "g2")), 4L)
    v.maintain()
    assert(v.lastRecomputedGroups == 0L)
    assert(mmSet(v) == Set(("g1", 2L, 2, 10), ("g2", 3L, 3, 9)))

    // value-only update of the min holder UP (3→8): retraction at the
    // stored extreme → that one group recomputes (the old witness is gone)
    apply(Seq(mk("U", "e", 11L, 8, "g2")), 5L)
    v.maintain()
    assert(v.lastRecomputedGroups == 1L)
    assert(mmSet(v) == Set(("g1", 2L, 2, 10), ("g2", 3L, 5, 9)))

    // group vanishes entirely via deletes: tombstoned without recompute
    apply(Seq(mk("D", "a", 12L, 2, "g1"), mk("D", "f", 13L, 2, "g1")), 6L)
    v.maintain()
    assert(v.lastRecomputedGroups == 0L)
    assert(mmSet(v) == Set(("g2", 3L, 5, 9)))

    // a reloaded view keeps the hybrid behavior (def round-trips)
    apply(Seq(mk("I", "h", 14L, 4, "g2")), 7L)
    val r = MatView.load(spark, s"$dir/v", base)
    r.maintain()
    assert(r.lastRecomputedGroups == 0L)
    assert(mmSet(r) == Set(("g2", 4L, 4, 9)))
  }

  test("hybrid stays exact on the generative feed (deletes + group migration)") {
    val dir = tmpDir("mv12")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 4)
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      sums = Seq("sum_tok0" -> "element_at(tokens, 1)"),
      recomputed = Seq("min_tok0" -> "min(element_at(tokens, 1))",
        "max_ntok" -> "max(n_tok)"))
    def expected: Set[(String, Long, Long, Int, Int)] =
      base.read().groupBy(col("source"))
        .agg(count(lit(1)).as("cnt"),
          sum(coalesce(element_at(col("tokens"), 1).cast("long"), lit(0L))).as("s"),
          min(element_at(col("tokens"), 1)).as("mn"),
          max(col("n_tok")).as("mx"))
        .as[(String, Long, Long, Int, Int)].collect().toSet
    def got: Set[(String, Long, Long, Int, Int)] =
      v.read().select(col("source"), col("cnt"), col("sum_tok0"),
          col("min_tok0"), col("max_ntok"))
        .as[(String, Long, Long, Int, Int)].collect().toSet
    (0 until 4).foreach { c =>
      replayChunks(dir, base, chunks = 4, from = c, until = c + 1)
      assert(v.maintain().contains(base.currentSnapshotId))
      assert(got == expected)
    }
    // mixed min/max + count-distinct(key) rides the decomposable fold
    // (min via hybrid, nd as the cnt-alias), never the legacy recompute
    val v2 = MatView.create(spark, s"$dir/v2", base, Seq("source"),
      recomputed = Seq("mn" -> "min(n_tok)", "nd" -> "count(distinct doc_id)"))
    v2.maintain()
    assert(v2.lastRecomputedGroups == -1L) // bootstrap, not a fold
    def got2: Set[(String, Long, Int, Long)] =
      v2.read().select(col("source"), col("cnt"), col("mn"), col("nd"))
        .as[(String, Long, Int, Long)].collect().toSet
    def expected2: Set[(String, Long, Int, Long)] =
      base.read().groupBy(col("source"))
        .agg(count(lit(1)).as("cnt"), min(col("n_tok")).as("mn"),
          countDistinct(col("doc_id")).as("nd"))
        .as[(String, Long, Int, Long)].collect().toSet
    assert(got2 == expected2)
    // one more chunk: the incremental fold stays exact and never runs a
    // full-base re-aggregation (recomputed groups bounded by extreme
    // retractions, not by touched-group count)
    ChangeFeed.writeFeed(spark,
      cfg.copy(seed = 13L, numEvents = 1200L), s"$dir/feed2", chunks = 1)
    val more = spark.read.schema(Schemas.changeEvent).parquet(s"$dir/feed2")
      .withColumn("lsn", col("lsn") + lit(cfg.numEvents))
    CdcIngest.applyBatch(base, more, epochId = 99L)
    assert(v2.maintain().contains(base.currentSnapshotId))
    assert(v2.lastRecomputedGroups >= 0L)
    assert(got2 == expected2)
  }

  test("view-side merge read is file-pruned to the touched groups' buckets") {
    val dir = tmpDir("mv16")
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    val mk = (op: String, id: String, lsn: Long, tok: Int, src: String) =>
      (op, id, lsn, Seq(tok), src)
    def apply(rows: Seq[(String, String, Long, Seq[Int], String)], e: Long): Unit = {
      val df = rows.toDF("op", "doc_id", "lsn", "tokens", "source")
        .select(col("op"), col("doc_id"), col("lsn"),
          current_timestamp().as("ts"), col("tokens"),
          size(col("tokens")).cast("int").as("n_tok"), col("source"))
      CdcIngest.applyBatch(base, df, epochId = e)
    }
    // 8-bucket view over 8 groups: the bootstrap spreads view rows over
    // several buckets, later single-group folds add one file each
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      Seq("s_tok" -> "element_at(tokens, 1)"), numBuckets = 8)
    apply((0 until 8).map(g => mk("I", s"d$g", g + 1L, 10 * g, s"g$g")), 0L)
    v.maintain() // bootstrap
    // enough single-group folds to grow the view past the probe pre-gate
    // (MinPrunedViewFiles) — each fold adds one delta file
    (1 to 24).foreach { i =>
      apply(Seq(mk("I", s"x$i", 100L + i, i, s"g${i % 8}")), i.toLong)
      v.maintain()
    }
    val fullFiles = v.table.read().inputFiles.length
    assert(fullFiles >= MatView.MinPrunedViewFiles, s"layout too small: $fullFiles")
    // a fold touching ONE group reads a strict subset of the view files
    apply(Seq(mk("I", "y", 200L, 7, "g1")), 25L)
    v.maintain()
    assert(v.lastViewReadFiles > 0 && v.lastViewReadFiles < fullFiles,
      s"view read opened ${v.lastViewReadFiles} of $fullFiles files — not pruned")
    // and the view stays exact
    val want = base.read().groupBy(col("source"))
      .agg(count(lit(1)).as("c"),
        sum(coalesce(element_at(col("tokens"), 1).cast("long"), lit(0L))).as("s"))
      .collect().map(_.toString).sorted.toSeq
    assert(v.read().select(col("source"), col("cnt"), col("s_tok"))
      .collect().map(_.toString).sorted.toSeq == want)
  }

  test("internal count-distinct stack (non-key column): exact through dup " +
      "values, deletes, value moves and group migration — zero recompute") {
    val dir = tmpDir("mv15")
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    val mk = (op: String, id: String, lsn: Long, toks: Seq[Int], src: String) =>
      (op, id, lsn, toks, src)
    def apply(rows: Seq[(String, String, Long, Seq[Int], String)], e: Long): Unit = {
      val df = rows.toDF("op", "doc_id", "lsn", "tokens", "source")
        .select(col("op"), col("doc_id"), col("lsn"),
          current_timestamp().as("ts"), col("tokens"),
          size(col("tokens")).cast("int").as("n_tok"), col("source"))
      CdcIngest.applyBatch(base, df, epochId = e)
    }
    // view counts distinct n_tok (NOT the key): maintained via the
    // internal two-level stack, O(changed keys), zero base re-agg.
    // The size gate normally routes toy-sized bases to the legacy
    // recompute — force the stack here to pin its exactness.
    val savedGate = MatView.StackMinBaseRows
    MatView.StackMinBaseRows = 0L
    val v = MatView.create(spark, s"$dir/v", base, Seq("source"),
      recomputed = Seq("nd" -> "count(distinct n_tok)"))
    def got: Set[(String, Long, Long)] =
      v.read().select(col("source"), col("cnt"), col("nd"))
        .as[(String, Long, Long)].collect().toSet
    def expected: Set[(String, Long, Long)] =
      base.read().groupBy(col("source"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("n_tok")).as("nd"))
        .as[(String, Long, Long)].collect().toSet

    // g1: n_tok {1, 2, 3} (nd 3); g2: {1, 2} (nd 2)
    apply(Seq(mk("I", "a", 1L, Seq(1), "g1"), mk("I", "b", 2L, Seq(1, 2), "g1"),
      mk("I", "c", 3L, Seq(1, 2, 3), "g1"), mk("I", "d", 4L, Seq(9), "g2"),
      mk("I", "e", 5L, Seq(8, 7), "g2")), 0L)
    v.maintain() // bootstrap (stack bootstraps pinned to the same head)
    assert(got == expected)
    // the stack's backing tables live under the view's aux dir
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/v/aux/cd-nd-pairs/meta")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/v/aux/cd-nd-counts/meta")))

    def fold(): Unit = {
      assert(v.maintain().contains(base.currentSnapshotId))
      assert(v.lastRecomputedGroups == 0L) // never re-aggregates from base
      assert(got == expected)
    }
    // duplicate-value insert: nd unchanged, cnt up
    apply(Seq(mk("I", "f", 6L, Seq(4, 5), "g1")), 1L)
    fold()
    // delete ONE holder of a duplicated value: pair survives, nd unchanged
    apply(Seq(mk("D", "b", 7L, Seq.empty, "g1")), 2L)
    fold()
    // delete the LAST holder: pair dies, nd drops
    apply(Seq(mk("D", "f", 8L, Seq.empty, "g1")), 3L)
    fold()
    // value move (n_tok 3 → 1, joining a's existing pair): nd drops again
    apply(Seq(mk("U", "c", 9L, Seq(9), "g1")), 4L)
    fold()
    // group migration: a moves g1 → g2 with a fresh value
    apply(Seq(mk("U", "a", 10L, Seq(9, 9, 9, 9), "g2")), 5L)
    fold()
    // reload (crash-restart analog): stack definitions round-trip
    val r = MatView.load(spark, s"$dir/v", base)
    assert(r.maintain().isEmpty)
    apply(Seq(mk("I", "g", 11L, Seq(6, 6), "g2")), 6L)
    assert(r.maintain().contains(base.currentSnapshotId))
    assert(r.lastRecomputedGroups == 0L)
    assert(r.read().select(col("source"), col("cnt"), col("nd"))
      .as[(String, Long, Long)].collect().toSet == expected)
    // with the default size gate, a fresh toy-sized view routes non-key
    // count-distinct to the LEGACY recompute (no stacks created) — the
    // measured small-base crossover — while an EXISTING stack keeps
    // being used (r above, even after the gate is restored)
    MatView.StackMinBaseRows = savedGate
    val v3 = MatView.create(spark, s"$dir/v3", base, Seq("source"),
      recomputed = Seq("nd" -> "count(distinct n_tok)"))
    v3.maintain() // bootstrap
    apply(Seq(mk("I", "h", 12L, Seq(2), "g1")), 7L)
    assert(v3.maintain().contains(base.currentSnapshotId))
    assert(v3.lastRecomputedGroups > 0L) // legacy affected-group recompute
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/v3/aux/cd-nd-pairs")))
    assert(v3.read().select(col("source"), col("cnt"), col("nd"))
      .as[(String, Long, Long)].collect().toSet == expected)
    assert(r.maintain().contains(base.currentSnapshotId))
    assert(r.lastRecomputedGroups == 0L) // existing stack still in use
    assert(r.read().select(col("source"), col("cnt"), col("nd"))
      .as[(String, Long, Long)].collect().toSet == expected)
  }
}
