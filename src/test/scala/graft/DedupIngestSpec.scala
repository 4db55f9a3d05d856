package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.stream.DedupIngest

/** Streaming near-dup admission control: lake-resident SimHash index,
  * per-batch banded probe + exact verify, exactly-once via the epoch
  * check. Pins the batch semantics (vs-index rejection, within-batch
  * component-canonical keep) and the stream == batch-sequence equivalence.
  */
class DedupIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  /** Mutate text enough to stay a near-dup (tiny Hamming shift) — append
    * one word: most simhash bits keep their majority.
    */
  private def nearCopy(of: DataFrame, shift: Long): DataFrame =
    of.select(($"doc_id" + shift).as("doc_id"),
      concat($"text", lit(" x")).as("text"))

  test("admitBatch: fresh docs admitted, near-copies of the index rejected") {
    val root = tmpDir("admit1")
    val table = DedupIngest.indexTable(spark, s"$root/idx")
    val b1 = docs.filter($"doc_id" < 40).select($"doc_id", $"text")
    val s1 = DedupIngest.admitBatch(table, b1, epochId = 0L)
    // sf0.001 docs 0..39 contain near-dup text pairs already; survivors
    // must at least be nonempty and no larger than the batch
    val kept1 = s1.select("doc_id").as[Long].collect().toSet
    assert(kept1.nonEmpty && kept1.size <= 40)
    assert(table.read().count() == kept1.size)

    // batch 2: exact copies (distance 0) of batch-1 docs + genuinely
    // fresh docs
    val copies = docs.filter($"doc_id" < 20).select(($"doc_id" + 10000).as("doc_id"), $"text")
    val freshDocs = docs.filter($"doc_id" >= 200 && $"doc_id" < 220)
      .select($"doc_id", $"text")
    val s2 = DedupIngest.admitBatch(table, copies.union(freshDocs), epochId = 1L)
    val kept2 = s2.select("doc_id").as[Long].collect().toSet
    // every exact copy of an ADMITTED doc must be rejected (simhash is a
    // pure function of text → distance 0 → banded candidate guaranteed)
    val admittedUnder20 = kept1.filter(_ < 20)
    assert(admittedUnder20.forall(id => !kept2.contains(id + 10000)),
      s"copies of admitted docs slipped through: ${kept2.filter(_ >= 10000)}")
    // index grew by exactly the survivors
    assert(table.read().count() == kept1.size + kept2.size)
  }

  test("admitBatch: within-batch near-dups keep the min-id canonical only") {
    val root = tmpDir("admit2")
    val table = DedupIngest.indexTable(spark, s"$root/idx")
    val base = docs.filter($"doc_id" === 7).select($"doc_id", $"text")
    // one doc + an exact copy + a near copy, all in ONE batch
    val batch = base
      .union(base.select(($"doc_id" + 100).as("doc_id"), $"text"))
      .union(nearCopy(base, 200))
    val kept = DedupIngest.admitBatch(table, batch, epochId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(7L), "canonical (min id) must survive")
    assert(!kept.contains(107L), "exact in-batch copy must be dropped")
    // the near copy may or may not be within maxDist — but if dropped it
    // must be because it is near doc 7 (component canonical rule)
    val dist = {
      graft.functions.VectorExprs.register(spark)
      val sh = DedupOps.simhash64(batch, 64)
      sh.as("a").join(sh.as("b"),
          col("a.doc_id") === 7 && col("b.doc_id") === 207)
        .select(graft.functions.VectorExprs.hammingHex(
          col("a.simhash"), col("b.simhash")).as("d"))
        .as[Int].head()
    }
    assert(kept.contains(207L) == (dist > 3),
      s"near-copy at distance $dist: kept=${kept.contains(207L)}")
  }

  test("admitBatch: tokenless docs are not lost — zero-simhash exact-dupe class") {
    val root = tmpDir("admit5")
    val table = DedupIngest.indexTable(spark, s"$root/idx")
    val batch = Seq((1L, ""), (2L, "   "), (3L, "real words here")).toDF("doc_id", "text")
    val kept = DedupIngest.admitBatch(table, batch, epochId = 0L)
      .select("doc_id").as[Long].collect().toSet
    // both tokenless docs collapse to the zero hash: min id survives
    assert(kept == Set(1L, 3L), s"got $kept")
    // a later empty doc is rejected against the admitted zero-hash rep
    val kept2 = DedupIngest.admitBatch(table,
      Seq((9L, "")).toDF("doc_id", "text"), epochId = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2.isEmpty)
  }

  test("admitBatch: replayed epoch is a no-op (exactly-once)") {
    val root = tmpDir("admit3")
    val table = DedupIngest.indexTable(spark, s"$root/idx")
    val b1 = docs.filter($"doc_id" < 30).select($"doc_id", $"text")
    DedupIngest.admitBatch(table, b1, epochId = 0L)
    val before = table.read().select("doc_id").as[Long].collect().toSet
    val snapBefore = table.currentSnapshotId
    // crash-replay: same batch, same epoch
    DedupIngest.admitBatch(table, b1, epochId = 0L)
    assert(table.currentSnapshotId == snapBefore, "replay must not commit")
    assert(table.read().select("doc_id").as[Long].collect().toSet == before)
  }

  test("two-table admission: docs-before-index commit order survives a mid-crash") {
    import org.apache.spark.sql.types._
    val root = tmpDir("admit6")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    def newDocsTable(p: String) =
      graft.lake.LakeTable.create(spark, p, schema, keyCol = "doc_id", numBuckets = 4)
    val b0 = docs.filter($"doc_id" < 40).select($"doc_id", $"text")
    val b1 = docs.filter($"doc_id" < 10).select(($"doc_id" + 5000).as("doc_id"), $"text")
      .union(docs.filter($"doc_id" >= 300 && $"doc_id" < 320).select($"doc_id", $"text"))

    val idx = DedupIngest.indexTable(spark, s"$root/idx")
    val out = newDocsTable(s"$root/out")
    DedupIngest.admitBatch(idx, b0, 0L, docsTable = Some(out))

    // derive batch 1's survivors against the SAME index state via a
    // deterministic replay on a scratch root (admission is a pure
    // function of (batch, index state))
    val scratch = DedupIngest.indexTable(spark, s"$root/scratch")
    DedupIngest.admitBatch(scratch, b0, 0L)
    val survivors1 = DedupIngest.admitBatch(scratch, b1, 1L)

    // CRASH SIMULATION: the docs table committed epoch 1, the index did
    // not — exactly the state admitBatch's docs-first order can leave
    out.upsert(survivors1.select(lit("I").as("op"), lit(1L).as("lsn"),
      $"doc_id", $"text"), epochId = 1L)
    // replay of micro-batch 1 after the crash
    val replayed = DedupIngest.admitBatch(idx, b1, 1L, docsTable = Some(out))

    val outIds = out.read().select("doc_id").as[Long].collect().toSet
    val idxIds = idx.read().select("doc_id").as[Long].collect().toSet
    assert(outIds == idxIds, "docs sink and index must agree after replay")
    assert(replayed.select("doc_id").as[Long].collect().toSet ==
      survivors1.select("doc_id").as[Long].collect().toSet)
    // no duplicate rows in the docs sink (one row per admitted doc)
    assert(out.read().count() == outIds.size)
  }

  test("auto-compaction keeps the admission index bounded without changing results") {
    val root = tmpDir("admit7")
    val all = docs.filter($"doc_id" < 120).select($"doc_id", $"text")
    (0 until 6).foreach { i =>
      // one part-file per chunk: the reference fold below is per-CHUNK,
      // so each chunk must arrive as exactly one micro-batch
      all.filter($"doc_id" % 6 === i).coalesce(1).write.parquet(s"$root/feed/chunk=$i")
    }
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/feed")
    val q = DedupIngest.run(stream, s"$root/idx", s"$root/ckpt",
      numBuckets = 4, docsRoot = Some(s"$root/docs"), maxFilesPerBucket = 2)
    q.awaitTermination()
    val idx = graft.lake.LakeTable.load(spark, s"$root/idx")
    val perBucket = idx.liveFiles().groupBy(_.bucket).map(_._2.size)
    assert(perBucket.forall(_ <= 2), s"buckets exceed file bound: $perBucket")
    // compaction must not change the admitted set vs an uncompacted run
    val ref = DedupIngest.indexTable(spark, s"$root/ref", numBuckets = 4)
    (0 until 6).foreach { i =>
      DedupIngest.admitBatch(ref,
        spark.read.parquet(s"$root/feed/chunk=$i"), epochId = i.toLong)
    }
    assert(idx.read().select("doc_id").as[Long].collect().toSet ==
      ref.read().select("doc_id").as[Long].collect().toSet)
  }

  test("streaming admission == sequential batch admission; restart-safe") {
    val root = tmpDir("admit4")
    // 4 chunk files → 4 micro-batches in arrival order
    val all = docs.filter($"doc_id" < 120).select($"doc_id", $"text")
    (0 until 4).foreach { i =>
      // one part-file per chunk (chunk == micro-batch for the ref fold)
      all.filter($"doc_id" % 4 === i)
        .coalesce(1).write.parquet(s"$root/feed/chunk=$i")
    }
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/feed")
    val q = DedupIngest.run(stream, s"$root/idx", s"$root/ckpt",
      docsRoot = Some(s"$root/docs"))
    q.awaitTermination()
    val streamed = graft.lake.LakeTable.load(spark, s"$root/idx")
      .read().select("doc_id").as[Long].collect().toSet
    // the admitted-docs sink tracks the index exactly
    assert(graft.lake.LakeTable.load(spark, s"$root/docs")
      .read().select("doc_id").as[Long].collect().toSet == streamed)

    // reference: the same chunks admitted sequentially in batch mode
    val refTable = DedupIngest.indexTable(spark, s"$root/idx_ref")
    // the file stream delivers one FILE per trigger in modification-time
    // order == chunk order here
    (0 until 4).foreach { i =>
      DedupIngest.admitBatch(refTable,
        spark.read.parquet(s"$root/feed/chunk=$i"), epochId = i.toLong)
    }
    val sequential = refTable.read().select("doc_id").as[Long].collect().toSet
    assert(streamed == sequential,
      s"stream-only=${(streamed -- sequential).toSeq.sorted.take(5)} " +
        s"seq-only=${(sequential -- streamed).toSeq.sorted.take(5)}")

    // restart on the same checkpoint: nothing new → no new commits
    val before = graft.lake.LakeTable.load(spark, s"$root/idx").currentSnapshotId
    val q2 = DedupIngest.run(stream, s"$root/idx", s"$root/ckpt",
      docsRoot = Some(s"$root/docs"))
    q2.awaitTermination()
    assert(graft.lake.LakeTable.load(spark, s"$root/idx").currentSnapshotId == before)
  }

  test("band layout is the DEFAULT: run() creates aux/bands, results unchanged, opt-out honored") {
    val root = tmpDir("admitdef")
    val all = docs.filter($"doc_id" < 120).select($"doc_id", $"text")
    (0 until 3).foreach { i =>
      all.filter($"doc_id" % 3 === i).coalesce(1).write.parquet(s"$root/feed/chunk=$i")
    }
    def stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/feed")
    // default run: band table appears at the index's aux/bands
    DedupIngest.run(stream, s"$root/idx", s"$root/ckpt").awaitTermination()
    val bt = graft.lake.LakeTable.load(spark,
      DedupIngest.defaultBandRoot(s"$root/idx"))
    val idx = graft.lake.LakeTable.load(spark, s"$root/idx")
    assert(bt.currentSnapshotId >= 0L)
    // 4 band rows per admitted doc, same epoch frontier as the index
    assert(bt.read().count() == idx.read().count() * 4)
    assert(bt.lastCommittedEpoch == idx.lastCommittedEpoch)
    // admitted set identical to the scan-path (opt-out) run
    DedupIngest.run(stream, s"$root/idx2", s"$root/ckpt2", bandIndex = false)
      .awaitTermination()
    assert(!new java.io.File(
      DedupIngest.defaultBandRoot(s"$root/idx2")).exists())
    assert(idx.read().select("doc_id").as[Long].collect().toSet ==
      graft.lake.LakeTable.load(spark, s"$root/idx2")
        .read().select("doc_id").as[Long].collect().toSet)
    // an index that pre-dates the layout backfills on its first default
    // run: copy-free check — run scan-only first, then default-run the
    // SAME index with a fresh feed chunk
    all.filter($"doc_id" % 3 === 0).limit(0) // (no-op frame; clarity only)
    val extra = docs.filter($"doc_id" >= 200 && $"doc_id" < 210)
      .select($"doc_id", $"text")
    extra.coalesce(1).write.parquet(s"$root/feed2/chunk=0")
    val s2 = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/feed2")
    DedupIngest.run(s2, s"$root/idx2", s"$root/ckpt3").awaitTermination()
    val bt2 = graft.lake.LakeTable.load(spark,
      DedupIngest.defaultBandRoot(s"$root/idx2"))
    val idx2 = graft.lake.LakeTable.load(spark, s"$root/idx2")
    assert(bt2.read().count() == idx2.read().count() * 4,
      "adoption backfill must cover docs admitted before the band layout")
  }

  /** Files actually opened by an executed frame (AQE-aware). */
  private def filesScanned(df: DataFrame): Long = {
    df.collect()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
  }

  test("band-keyed index: small-batch probe opens a strict file subset, admitted set unchanged") {
    val root = tmpDir("admitband")
    val idx = DedupIngest.indexTable(spark, s"$root/idx")
    val bands = DedupIngest.ensureBandTable(spark, idx, s"$root/bands")
    val b0 = docs.filter($"doc_id" < 200).select($"doc_id", $"text")
    DedupIngest.admitBatch(idx, b0, 0L, bandTable = Some(bands))
    // 200 docs × 4 bands spread over the 16 band-range groups → a
    // multi-file band index with disjoint bkey ranges per file
    assert(bands.liveFiles().size > 4,
      s"band index not multi-file: ${bands.liveFiles().size}")
    assert(bands.liveFiles().forall(f =>
      f.colMin.contains("bkey") && f.colMax.contains("bkey")))

    // the probe for a ONE-doc batch carries ≤ 4 band keys → at most 4 of
    // the band-range file groups can match
    val one = docs.filter($"doc_id" === 400).select($"doc_id", $"text")
    graft.functions.VectorExprs.register(spark)
    val keys = DedupOps.bandFrame(DedupOps.simhash64(one, 64))
      .select((col("blk") * 65536 + conv(col("bval"), 16, 10).cast("int"))
        .cast("int").as("bkey"))
      .distinct().as[Int].collect()
    val probe = bands.readInsertOnly()
      .filter(col("bkey").isin(keys.map(Integer.valueOf): _*))
    val scanned = filesScanned(probe)
    assert(scanned <= keys.length && scanned < bands.liveFiles().size,
      s"probe opened $scanned of ${bands.liveFiles().size} band files " +
        s"for ${keys.length} band keys — not pruned")

    // admitted-set parity with the scan path on the same index state
    val idxScan = DedupIngest.indexTable(spark, s"$root/idxscan")
    DedupIngest.admitBatch(idxScan, b0, 0L)
    val b1 = docs.filter($"doc_id" < 30)
      .select(($"doc_id" + 7000).as("doc_id"), $"text") // copies → rejected
      .union(docs.filter($"doc_id" >= 400 && $"doc_id" < 440)
        .select($"doc_id", $"text"))
    val viaBands = DedupIngest.admitBatch(idx, b1, 1L, bandTable = Some(bands))
      .select("doc_id").as[Long].collect().toSet
    val viaScan = DedupIngest.admitBatch(idxScan, b1, 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(viaBands == viaScan,
      s"band-only=${(viaBands -- viaScan).toSeq.sorted.take(5)} " +
        s"scan-only=${(viaScan -- viaBands).toSeq.sorted.take(5)}")
    // the band table tracks the index: 4 rows per admitted doc
    assert(bands.readInsertOnly().count() == idx.read().count() * 4)
  }

  test("replayed delivered batch returns the ORIGINAL survivors, not an empty frame") {
    val root = tmpDir("admitreplayret")
    val idx = DedupIngest.indexTable(spark, s"$root/idx")
    val b1 = docs.filter($"doc_id" < 40).select($"doc_id", $"text")
    val s1 = DedupIngest.admitBatch(idx, b1, epochId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.nonEmpty)
    // crash AFTER all sinks committed, BEFORE the streaming checkpoint
    // advanced: the replay must hand the caller the same survivor rows
    // (round 4 re-derived against the already-updated index and returned
    // an empty frame)
    val replay = DedupIngest.admitBatch(idx, b1, epochId = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(replay == s1, s"replay returned $replay, original was $s1")
  }

  test("band table lagging the index is repaired on ensure (gap epochs backfilled)") {
    val root = tmpDir("admitbandlag")
    val idx = DedupIngest.indexTable(spark, s"$root/idx")
    val bands = DedupIngest.ensureBandTable(spark, idx, s"$root/bands")
    val b0 = docs.filter($"doc_id" < 40).select($"doc_id", $"text")
    DedupIngest.admitBatch(idx, b0, 0L, bandTable = Some(bands))
    // GAP: epochs 1–2 ran without the band layout (bandRoot disabled)
    val b1 = docs.filter($"doc_id" >= 300 && $"doc_id" < 330).select($"doc_id", $"text")
    val b2 = docs.filter($"doc_id" >= 330 && $"doc_id" < 350).select($"doc_id", $"text")
    val s1 = DedupIngest.admitBatch(idx, b1, 1L).select("doc_id").as[Long].collect().toSet
    DedupIngest.admitBatch(idx, b2, 2L)
    assert(s1.nonEmpty)
    // re-enable: ensure must repair the gap, not silently accept it
    val repaired = DedupIngest.ensureBandTable(spark, idx, s"$root/bands")
    assert(repaired.readInsertOnly().select("doc_id").as[Long].collect().toSet ==
      idx.read().select("doc_id").as[Long].collect().toSet,
      "band table still missing gap-epoch docs after ensure")
    assert(repaired.readInsertOnly().count() == idx.read().count() * 4)
    // an exact copy of a gap-admitted doc is rejected through the BAND
    // probe (without the repair it would slip in forever)
    val gapId = s1.head
    val copy = docs.filter($"doc_id" === gapId)
      .select(($"doc_id" + 90000).as("doc_id"), $"text")
    val kept = DedupIngest.admitBatch(idx, copy, 3L, bandTable = Some(repaired))
      .select("doc_id").as[Long].collect()
    assert(kept.isEmpty, s"copy of gap doc $gapId admitted via band probe")

    // CHANGED-CONTENT re-admission inside a gap: doc re-sent with
    // unrelated text while the band layout was off — the repair must
    // re-emit the NEW content's bands (an id-only backfill would leave
    // the live text invisible to the band probe and wrongly ADMIT its
    // near-copies forever)
    val newText = docs.filter($"doc_id" === 460).head.getString(1)
    val preGapId = b0.select("doc_id").as[Long].collect().min
    DedupIngest.admitBatch(idx,
      Seq((preGapId, newText)).toDF("doc_id", "text"), 4L) // gap epoch
    val repaired2 = DedupIngest.ensureBandTable(spark, idx, s"$root/bands")
    val copyOfNew = DedupIngest.admitBatch(idx,
      Seq((95000L, newText)).toDF("doc_id", "text"), 5L,
      bandTable = Some(repaired2)).select("doc_id").as[Long].collect()
    assert(copyOfNew.isEmpty,
      "copy of gap-RE-admitted content slipped past the repaired band probe")
  }

  test("re-admission staleness is recall-only and compaction restores band == scan") {
    val root = tmpDir("admitbandstale")
    val idx = DedupIngest.indexTable(spark, s"$root/idx")
    val bands = DedupIngest.ensureBandTable(spark, idx, s"$root/bands")
    val t1 = docs.filter($"doc_id" === 7).select($"doc_id", $"text").head.getString(1)
    val t2 = docs.filter($"doc_id" === 450).select($"doc_id", $"text").head.getString(1)
    // admit id 1 with text T1, then RE-ADMIT id 1 with unrelated text T2
    // (update semantics — LWW-overwrites the index and band rows)
    DedupIngest.admitBatch(idx, Seq((1L, t1)).toDF("doc_id", "text"), 0L,
      bandTable = Some(bands))
    val re = DedupIngest.admitBatch(idx, Seq((1L, t2)).toDF("doc_id", "text"), 1L,
      bandTable = Some(bands)).select("doc_id").as[Long].collect()
    assert(re.sameElements(Array(1L)), "changed-content re-send was not re-admitted")
    assert(idx.read().count() == 1)
    // a copy of the REPLACED text: the winner-resolved scan path admits
    // it (T1 is gone from the corpus); the pruned band probe still sees
    // T1's superseded band rows and may over-reject — recall-only
    val scanIdx = DedupIngest.indexTable(spark, s"$root/scanidx")
    DedupIngest.admitBatch(scanIdx, Seq((1L, t1)).toDF("doc_id", "text"), 0L)
    DedupIngest.admitBatch(scanIdx, Seq((1L, t2)).toDF("doc_id", "text"), 1L)
    val viaScan = DedupIngest.admitBatch(scanIdx, Seq((2L, t1)).toDF("doc_id", "text"), 2L)
      .select("doc_id").as[Long].collect().toSet
    assert(viaScan == Set(2L), "scan path must admit a copy of replaced text")
    // compact the band table (winner resolution drops the stale rows),
    // then the band probe agrees with the scan path again
    bands.compact(clusterBy = Some(
      org.apache.spark.sql.functions.shiftright(col("bkey"),
        DedupIngest.BandGroupShift)))
    assert(bands.readInsertOnly().count() == 4L, "stale band rows survived compact")
    val viaBands = DedupIngest.admitBatch(idx, Seq((2L, t1)).toDF("doc_id", "text"), 2L,
      bandTable = Some(bands)).select("doc_id").as[Long].collect().toSet
    assert(viaBands == Set(2L), "band probe still over-rejecting after compact")
  }

  test("crash between index and band commits: replay completes the band table") {
    val root = tmpDir("admitbandcrash")
    val idx = DedupIngest.indexTable(spark, s"$root/idx")
    val bands = DedupIngest.ensureBandTable(spark, idx, s"$root/bands")
    val b0 = docs.filter($"doc_id" < 60).select($"doc_id", $"text")
    DedupIngest.admitBatch(idx, b0, 0L, bandTable = Some(bands))
    // CRASH SIMULATION: epoch 1 reached the primary index but not the
    // band table — admit to the index alone
    val b1 = docs.filter($"doc_id" >= 300 && $"doc_id" < 340)
      .select($"doc_id", $"text")
    val s1 = DedupIngest.admitBatch(idx, b1, 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(bands.lastCommittedEpoch == 0L && idx.lastCommittedEpoch == 1L)
    // replay of epoch 1 with the band table attached: decisions re-derive
    // against the UNCHANGED band state, the index no-ops, the band
    // commit completes
    val replayed = DedupIngest.admitBatch(idx, b1, 1L, bandTable = Some(bands))
      .select("doc_id").as[Long].collect().toSet
    assert(replayed == s1)
    assert(bands.lastCommittedEpoch == 1L)
    assert(bands.readInsertOnly().select("doc_id").as[Long].collect().toSet ==
      idx.read().select("doc_id").as[Long].collect().toSet)
  }
}
