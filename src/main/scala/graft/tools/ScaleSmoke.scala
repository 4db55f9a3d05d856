package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.feed.{EventGen, FeedConfig}
import graft.lake.LakeTable
import graft.model.Schemas
import graft.stream.CdcIngest
import graft.verify.FoldOracle

/** Scale correctness smoke (beyond the sbt-test sizes): replay
  * SPARK_GRAFT_EVENTS (default 50M) events over events/10 keys in
  * LSN-chunked batches with periodic compaction, then verify the merged
  * table against the sequential in-memory fold — per-row token-array
  * equality on millions of keys. Exercises the exact pipeline the unit
  * tests pin, at 3–4 orders of magnitude more data.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_EVENTS", "50000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIR", "/dev/shm/graft-smoke-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = FeedConfig(seed = 1234L, numEvents = nEvents,
      numDocs = math.max(1000L, nEvents / 10), deletePct = 6,
      maxTokens = 24, hotFraction = 0.1, numHot = 7)
    val root = Files.createTempDirectory(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_SMOKE_DIR", "/dev/shm")),
      "graft-smoke").toString
    val table = LakeTable.create(spark, s"$root/t", Schemas.docRow, numBuckets = 64)

    val chunks = 10
    val per = (nEvents + chunks - 1) / chunks
    val t0 = System.nanoTime()
    var c = 0
    while (c * per < nEvents) {
      val lo = c * per; val hi = math.min(nEvents, lo + per)
      val batch = spark.range(lo, hi).mapPartitions(_.map(i => EventGen.event(cfg, i))).toDF()
      CdcIngest.applyBatch(table, batch, epochId = c.toLong,
        saltBuckets = if (c % 2 == 0) 16 else 0) // alternate salted/plain
      if (c == chunks / 2) table.compact() // mid-replay compaction
      c += 1
    }
    val replaySec = (System.nanoTime() - t0) / 1e9
    println(f"[smoke] replay $nEvents events in $replaySec%.1f s (${nEvents / replaySec}%.0f ev/s)")

    val t1 = System.nanoTime()
    val expected = FoldOracle.finalState(cfg)
    println(f"[smoke] fold oracle: ${expected.size} keys in ${(System.nanoTime() - t1) / 1e9}%.1f s")

    val t2 = System.nanoTime()
    val errs = FoldOracle.diff(table.read(), expected)
    println(f"[smoke] diff in ${(System.nanoTime() - t2) / 1e9}%.1f s")
    if (errs.isEmpty) println(s"[smoke] EXACT MATCH: ${expected.size} keys, $nEvents events")
    else {
      println(s"[smoke] MISMATCH: ${errs.take(20).mkString("; ")}")
      sys.exit(1)
    }
    graft.CdcBench.deleteRecursively(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
