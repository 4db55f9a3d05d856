package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.model.Schemas

/** Optimistic-concurrency commit protocol: racing writers serialize
  * through the snapshot CAS; losers validate and retry (upserts rebase,
  * duplicate epochs are dropped with their files, conflicting rewrites
  * abort loudly). Each writer holds its OWN LakeTable instance — the
  * instance is a single writer's view; the TABLE is what's shared.
  */
class MultiWriterSpec extends SparkSpec {
  import spark.implicits._

  private def oneRow(k: String, lsn: Long) =
    Seq(("U", k, lsn, Seq(lsn.toInt), 1)).toDF("op", "doc_id", "lsn", "tokens", "n_tok")

  test("stale writer instance rebases on commit conflict (ingest racing maintenance)") {
    val dir = tmpDir("mw-rebase")
    val a = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    a.upsert(oneRow("k1", 1L), epochId = 0L)
    // writer B loads the same table and commits behind A's back
    val b = LakeTable.load(spark, s"$dir/t")
    b.compact() // maintenance writer takes snapshot 2
    // A's cached state still thinks head = snap 0 → its CAS for snap 1
    // loses; the retry must rebase (refresh + next id) and commit as 2
    val snap = a.upsert(oneRow("k2", 2L), epochId = 1L)
    assert(snap.isDefined && snap.get.snapshotId == 2L,
      s"expected rebased commit at snapshot 2, got $snap")
    assert(a.read().count() == 2)
    // ids stayed dense; nothing was lost or double-committed
    val fresh = LakeTable.load(spark, s"$dir/t")
    assert(fresh.snapshots.map(_.snapshotId) == Seq(0L, 1L, 2L))
    assert(fresh.read().orderBy("doc_id").select("doc_id").as[String].collect()
      .toSeq == Seq("k1", "k2"))
  }

  test("replicated drivers delivering the SAME epoch: exactly one commit, losers drop their files") {
    val dir = tmpDir("mw-epoch")
    val seed = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    seed.upsert(oneRow("k0", 1L), epochId = 0L)
    // 6 replicas race to deliver epoch 1 (at-least-once delivery: same
    // logical batch). Each gets its own instance, loaded BEFORE the race.
    val replicas = (1 to 6).map(_ => LakeTable.load(spark, s"$dir/t"))
    implicit val ec: ExecutionContext = ExecutionContext.global
    val results = Await.result(
      Future.sequence(replicas.map(t =>
        Future(t.upsert(oneRow("dup", 2L), epochId = 1L)))),
      Duration.Inf)
    assert(results.count(_.isDefined) == 1,
      s"expected exactly 1 winning delivery, got ${results.count(_.isDefined)}")
    val fresh = LakeTable.load(spark, s"$dir/t")
    assert(fresh.currentSnapshotId == 1L, "duplicate epochs must not commit")
    assert(fresh.read().count() == 2)
    assert(fresh.lastCommittedEpoch == 1L)
    // losers deleted their delta dirs on detection — after GC of any
    // crashed leftovers, data dirs == committed snapshots' dirs
    fresh.gcOrphanData()
    val dataDirs = fresh.fs.list(s"$dir/t/data").size
    val referenced = fresh.snapshots.flatMap(_.addedData.map(_.path))
      .map(_.split('/')(1)).distinct.size
    assert(dataDirs == referenced,
      s"$dataDirs data dirs on disk but only $referenced referenced")
  }

  test("concurrent rewrites: second compact aborts loudly, table state intact") {
    val dir = tmpDir("mw-compact")
    val a = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    (0 to 2).foreach(e => a.upsert(oneRow(s"k$e", e + 1L), epochId = e.toLong))
    val b = LakeTable.load(spark, s"$dir/t")
    a.compact() // A rewrites the live set first
    // B's compact staged against the OLD live set: its removal set is
    // gone — rebasing would double-remove, so it must abort loudly
    val e = intercept[IllegalStateException](b.compact())
    assert(e.getMessage.contains("concurrent commit already removed"))
    val fresh = LakeTable.load(spark, s"$dir/t")
    assert(fresh.read().count() == 3)
    // B's aborted rewrite dropped its files; GC finds nothing else
    assert(fresh.gcOrphanData().isEmpty)
  }

  test("re-bucketing compaction under a staged delta: upsert re-writes for the new layout") {
    val dir = tmpDir("mw-rebucket")
    val a = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    a.upsert(oneRow("k1", 1L), epochId = 0L)
    // writer B re-buckets 2 → 8 behind A's back — every live file replaced
    val b = LakeTable.load(spark, s"$dir/t")
    b.compact(newNumBuckets = Some(8))
    // A's upsert stages under layout 2, loses the CAS, detects the layout
    // change, drops its old-layout files, and re-stages under layout 8 —
    // never committing a mixed layout (which would split keys across
    // buckets and duplicate them at read)
    val snap = a.upsert(oneRow("k2", 2L), epochId = 1L)
    assert(snap.isDefined)
    assert(a.numBuckets == 8, "loser instance must adopt the new layout")
    val fresh = LakeTable.load(spark, s"$dir/t")
    assert(fresh.liveFiles().map(_.bucket).forall(_ < 8))
    assert(fresh.read().count() == 2, "mixed-layout merge would duplicate keys")
    assert(fresh.lookup("k2").count() == 1, "bucket pruning must find the re-staged row")
    // the dropped old-layout delta left no garbage behind
    assert(fresh.gcOrphanData().isEmpty)
  }

  test("concurrent schema evolutions: loser fails loudly instead of clobbering the winner") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("mw-evolve")
    val a = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    a.upsert(oneRow("k1", 1L), epochId = 0L)
    val b = LakeTable.load(spark, s"$dir/t")
    assert(b.currentSchema.schemaId == 0) // warm B's schema view pre-race
    val withA = StructType(Schemas.docRow.fields :+ StructField("added_a", IntegerType, true))
    val withB = StructType(Schemas.docRow.fields :+ StructField("added_b", LongType, true))
    a.evolveSchema(withA) // A wins schema 1
    // B, still on schema 0, targets the same dense id — must fail loudly
    val e = intercept[IllegalStateException](b.evolveSchema(withB))
    assert(e.getMessage.contains("concurrent schema evolution"))
    // the winner's schema is intact on disk (no silent replace)
    val fresh = LakeTable.load(spark, s"$dir/t")
    assert(fresh.currentSchema.fields.map(_.name).contains("added_a"))
    assert(!fresh.currentSchema.fields.map(_.name).contains("added_b"))
  }

  test("upserts racing from many threads: all epochs land, state equals sequential fold") {
    val dir = tmpDir("mw-threads")
    LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    // one writer per epoch, all racing; epochs are delivered out of order
    // by the scheduler. The exactly-once check is MONOTONE per table, so
    // an epoch that loses the ordering race is DROPPED — replicate the
    // driver contract by retrying delivery until its epoch is committed
    // or superseded, like a checkpointed stream redelivering a batch.
    // Here every epoch writes a DISTINCT key, so the final state exposes
    // any loss; lsn = epoch so the fold is order-independent.
    implicit val ec: ExecutionContext = ExecutionContext.global
    val results = Await.result(
      Future.sequence((1 to 4).map { e =>
        Future {
          val t = LakeTable.load(spark, s"$dir/t")
          t.upsert(oneRow(s"k$e", e.toLong), epochId = e.toLong)
        }
      }),
      Duration.Inf)
    val fresh = LakeTable.load(spark, s"$dir/t")
    // every DELIVERED epoch (non-dropped) wrote its key; dropped epochs
    // returned None because a higher epoch won first — the documented
    // single-sequence contract. At minimum the max epoch always lands.
    val landed = results.flatten.map(_.epochId).toSet
    assert(landed.contains(results.flatten.map(_.epochId).max))
    val keys = fresh.read().select("doc_id").as[String].collect().toSet
    assert(landed.forall(e => keys.contains(s"k$e")),
      s"committed epochs $landed but keys $keys")
    assert(fresh.snapshots.map(_.snapshotId) ==
      (0L until landed.size.toLong).toSeq, "snapshot ids must stay dense")
  }
}
