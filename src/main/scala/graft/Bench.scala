package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession

import graft.feed.FeedConfig

/** Per-round benchmark main (driver contract): times every SparkEntry
  * query on SPARK_GRAFT_SF_DIR (forced via the noop sink — full plan
  * execution, no driver collect), plus one CDC replay throughput probe,
  * and prints ONE JSON line.
  *
  * SELF-DE-NOISING: each query runs `SPARK_GRAFT_REPEATS` (default 3)
  * full interleaved passes and reports the per-query MINIMUM — a
  * single-pass run in a shared sandbox has measured up to ~1.4× uniform
  * noise inflation between two runs of identical code, enough to read as
  * a false regression. Interleaving (pass 1 of every query, then pass 2,
  * …) keeps a transient machine-wide stall from eating all repeats of
  * one query. `"repeats"` is recorded in the JSON so a reader knows the
  * protocol. Note: queries that build an index once behind an existence
  * guard (qd59's lake-resident IVF) amortize the build across repeats —
  * their min measures steady-state probe cost, the realistic serving
  * shape; the CDC replay queries (q23/q47/q58) delete and fully re-replay
  * per pass, so their min is full-pipeline honest.
  */
object Bench {
  private def f3(d: Double): String = "%.3f".formatLocal(Locale.ROOT, d)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JIT/scan warmup so the first timed query isn't charged for it
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // a crashed query must read as a FAILURE, not a near-zero "speedup":
    // failed queries are reported under "failed" and excluded from totals
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val passes: Seq[Seq[(String, Double, Boolean)]] = (1 to repeats).map { _ =>
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    // per-query min over the passes where it succeeded; failed in EVERY
    // pass → reported failed (a flaky query still yields its honest min)
    val results: Seq[(String, Double, Boolean)] = ordered.map { case (name, _) =>
      val mine = passes.flatMap(_.collect { case (`name`, sec, ok) => (sec, ok) })
      val good = mine.collect { case (sec, true) => sec }
      if (good.nonEmpty) (name, good.min, true) else (name, 0.0, false)
    }
    val failed = results.collect { case (n, _, false) => n }

    // CDC replay probe at this core count (full pipeline incl. commits)
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_EVENTS", "2000000").toLong
    val cdc = CdcBench.replayThroughput(spark, FeedConfig(
      seed = 42L, numEvents = nEvents, numDocs = math.max(1000L, nEvents / 10),
      deletePct = 5, maxTokens = 64), chunks = 4, saltBuckets = 0)

    val qs = results.collect { case (k, v, true) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    val json = "{\"metric\":\"total\",\"value\":" + f3(total) +
      ",\"unit\":\"sec\",\"repeats\":" + repeats +
      ",\"queries\":" + qs +
      ",\"failed\":" + failed.map("\"" + _ + "\"").mkString("[", ",", "]") +
      ",\"sf\":\"" + sfDir + "\"" +
      ",\"cdc\":{\"events\":" + nEvents +
      ",\"sec\":" + f3(cdc.sec) +
      ",\"events_per_sec\":" + f3(cdc.eps) +
      ",\"cpus\":" + cpus + "}}"
    // print the line TWICE back-to-back: the driver parses a bounded TAIL
    // of the stdout capture, and with 87 per-query entries one copy can
    // straddle the window edge (BENCH_r05 "parsed": null — tail started
    // mid-JSON). Two adjacent copies guarantee one complete line in any
    // window longer than a single copy.
    println(json)
    println(json)
    System.out.flush()
    // ALSO land the line in a file: sbt prefixes stdout with "[info] ",
    // which a strict JSON parser on the driver side chokes on — the file
    // is the clean structured handoff (BENCH_r04 had "parsed": null)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH/last_run.json"), json + "\n")
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH/last_run.json: $e")
    }
    spark.stop()
  }
}
