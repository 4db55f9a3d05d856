package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.lake.{LakeFs, LakeTable, LocalFs}
import graft.model.Schemas
import graft.stream.CdcIngest

/** The object-store portability seam: every metadata/layout IO of the lake
  * goes through an injected [[LakeFs]] — proven by running the full
  * engine loop (create → ingest batches → merged read → changelog →
  * compact → expire → cold load) against a RECORDING decorator and
  * asserting the traffic went through it. Plus the commit CAS contract
  * ([[LakeFs.putStringAtomic]] createOnly) that an object-store impl must
  * reproduce with a conditional PUT.
  */
class LakeFsSpec extends SparkSpec {
  import spark.implicits._

  /** Decorator that counts every call — the proof the seam is injected,
    * not cosmetic.
    */
  final class RecordingFs extends LakeFs {
    val calls = new AtomicLong(0)
    val writes = new AtomicLong(0)
    private def tick[A](a: => A): A = { calls.incrementAndGet(); a }
    override def exists(p: String) = tick(LocalFs.exists(p))
    override def isDirectory(p: String) = tick(LocalFs.isDirectory(p))
    override def readString(p: String) = tick(LocalFs.readString(p))
    override def putStringAtomic(dst: String, content: String, createOnly: Boolean) =
      tick { writes.incrementAndGet(); LocalFs.putStringAtomic(dst, content, createOnly) }
    override def list(dir: String) = tick(LocalFs.list(dir))
    override def size(p: String) = tick(LocalFs.size(p))
    override def rename(src: String, dst: String) = tick(LocalFs.rename(src, dst))
    override def createDirectories(dir: String) = tick(LocalFs.createDirectories(dir))
    override def deleteIfExists(p: String) = tick(LocalFs.deleteIfExists(p))
    override def deleteRecursively(p: String) = tick(LocalFs.deleteRecursively(p))
  }

  private def batch(lo: Long, n: Long, src: String) =
    spark.range(lo, lo + n).map { i =>
      (s"d${i % 50}", i, Seq(i.toInt), 1, src)
    }.toDF("doc_id", "lsn", "tokens", "n_tok", "source")
      .withColumn("op", when(col("lsn") % 10 === 0, "D").otherwise("U"))

  test("full engine loop runs against an injected LakeFs; zero IO bypasses it") {
    val fs = new RecordingFs
    val dir = tmpDir("lakefs-seam")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow,
      numBuckets = 2, fs = fs)
    (0 to 2).foreach { e =>
      CdcIngest.applyBatch(table, batch(e * 100L, 100L, s"s$e"), epochId = e.toLong)
    }
    // 50 keys, winner lsn = 250+k, tombstone when (250+k)%10==0 → 45 visible
    assert(table.read().count() == 45)
    assert(table.changesBetween(-1L, table.currentSnapshotId).count() > 0)
    table.compact()
    val before = fs.calls.get()
    assert(before > 0 && fs.writes.get() > 0,
      "recording fs saw no traffic — the seam is not injected")

    // a cold load with the same fs keeps flowing through it (and reads the
    // identical state)
    val loaded = LakeTable.load(spark, s"$dir/t", fs = fs)
    assert(loaded.currentSnapshotId == table.currentSnapshotId)
    assert(fs.calls.get() > before, "load() bypassed the injected fs")

    // nothing in the lake's metadata plane touched java.nio behind the
    // seam's back: a DIFFERENT decorator wrapping a failing fs would have
    // thrown — approximated here by the call volume being commensurate
    // with the work (3 upserts + compact + load >> a handful of calls)
    assert(fs.calls.get() > 50, s"suspiciously few fs calls: ${fs.calls.get()}")
  }

  test("derived views ride the injected LakeFs end to end") {
    val fs = new RecordingFs
    val dir = tmpDir("lakefs-views")
    val base = LakeTable.create(spark, s"$dir/t", Schemas.docRow,
      numBuckets = 2, fs = fs)
    CdcIngest.applyBatch(base, batch(0L, 100L, "s0"), epochId = 0L)
    val before = fs.calls.get()
    val v = graft.lake.MatView.create(spark, s"$dir/v", base,
      Seq("source"), Seq("s" -> "n_tok"), fs = fs)
    v.catchUpAll()
    assert(fs.calls.get() > before, "view metadata IO bypassed the injected fs")
    val reload = graft.lake.MatView.load(spark, s"$dir/v", base, fs = fs)
    assert(reload.maintain().isEmpty) // frontier read through the same fs
  }

  test("putStringAtomic createOnly is a CAS: exactly one writer wins, content is the winner's") {
    val dir = tmpDir("lakefs-cas")
    val p = s"$dir/snap-0.json"
    assert(LocalFs.putStringAtomic(p, "winner", createOnly = true))
    assert(!LocalFs.putStringAtomic(p, "loser", createOnly = true),
      "second create-only put must lose")
    assert(LocalFs.readString(p) == "winner")
    // replace mode overwrites atomically
    assert(LocalFs.putStringAtomic(p, "replaced", createOnly = false))
    assert(LocalFs.readString(p) == "replaced")
    // no temp-file litter after either path
    assert(LocalFs.list(dir).map(LakeFs.fileName) == Seq("snap-0.json"))
  }

  test("forRoot resolves schemeless to LocalFs; registered schemes to their impl; unknown throws") {
    assert(LakeFs.forRoot("/tmp/x") eq LocalFs)
    val e = intercept[IllegalArgumentException](LakeFs.forRoot("mockstore://b/t"))
    assert(e.getMessage.contains("no LakeFs registered"))
    val fake = new RecordingFs
    LakeFs.register("mockstore", _ => fake)
    assert(LakeFs.forRoot("mockstore://b/t") eq fake)
    assert(LakeFs.forRoot("MOCKSTORE://b/t") eq fake) // scheme is case-insensitive
  }

  test("concurrent create-only puts: one winner under contention") {
    val dir = tmpDir("lakefs-race")
    val p = s"$dir/commit.json"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val results = Await.result(
      Future.sequence((1 to 16).map(i =>
        Future(LocalFs.putStringAtomic(p, s"w$i", createOnly = true)))),
      Duration.Inf)
    assert(results.count(identity) == 1,
      s"expected exactly 1 CAS winner, got ${results.count(identity)}")
    assert(LocalFs.readString(p).startsWith("w"))
    assert(LocalFs.list(dir).map(LakeFs.fileName) == Seq("commit.json"),
      "losers must clean up their temp files")
  }
}
