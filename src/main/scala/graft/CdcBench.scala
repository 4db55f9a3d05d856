package graft

import java.nio.file.Files
import java.util.Locale

import org.apache.spark.sql.SparkSession

import graft.feed.{ChangeFeed, FeedConfig}
import graft.lake.LakeTable
import graft.model.Schemas
import graft.stream.CdcIngest

/** Scaling-evidence main (BASELINE.md §3): replays the identical synthetic
  * feed end-to-end (generate → dedup → LWW → merge-on-read commit) at two
  * parallelism levels (default local[8] vs local[32]) and reports
  * events/sec at each plus efficiency = tp(4N) / (4 × tp(N)).
  *
  * This is the sandbox stand-in for the north rule's N→4N executor
  * criterion: no real cluster exists here, so the same job runs at two
  * core counts on the same input.
  *
  * Env knobs: SPARK_GRAFT_EVENTS (default 4M), SPARK_GRAFT_CPUS_LIST
  * (default "8,32"), SPARK_GRAFT_SALT (default 0 = plain LWW).
  */
object CdcBench {
  final case class Result(events: Long, sec: Double, eps: Double)

  private def f1(d: Double): String = "%.1f".formatLocal(Locale.ROOT, d)
  private def f3(d: Double): String = "%.3f".formatLocal(Locale.ROOT, d)

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  /** Time one full replay into a fresh table; returns events/sec.
    * `withView` attaches a per-source (cnt, sum n_tok) [[graft.lake.MatView]]
    * maintained after every chunk — measures the derived-view tax on the
    * ingest loop (SPARK_GRAFT_MATVIEW=1; recorded in BENCH/BASELINE.md).
    */
  def replayThroughput(spark: SparkSession, cfg: FeedConfig,
                       chunks: Int, saltBuckets: Int,
                       benchDir: Option[String] = None,
                       withView: Boolean = false): Result = {
    val rootPath = benchDir match {
      case Some(d) => Files.createTempDirectory(java.nio.file.Paths.get(d), "graft-bench-lake")
      case None => Files.createTempDirectory("graft-bench-lake")
    }
    val root = rootPath.toString
    // numBuckets is a TABLE property: fixed regardless of cluster size so
    // the N-core and 4N-core runs execute the identical job on identical
    // layout (and task count exceeds cores at both sizes)
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
    val table = LakeTable.create(spark, s"$root/t", Schemas.docRow,
      numBuckets = buckets)
    val view =
      if (withView) Some(graft.lake.MatView.create(spark, s"$root/v", table,
        Seq("source"), Seq("sum_ntok" -> "n_tok"), numBuckets = 8))
      else None
    val per = (cfg.numEvents + chunks - 1) / chunks
    val t0 = System.nanoTime()
    var c = 0
    while (c * per < cfg.numEvents) {
      val lo = c * per
      val hi = math.min(cfg.numEvents, lo + per)
      val localCfg = cfg
      val batch = {
        import spark.implicits._
        spark.range(lo, hi).mapPartitions(_.map(i => graft.feed.EventGen.event(localCfg, i))).toDF()
      }
      CdcIngest.applyBatch(table, batch, epochId = c.toLong, saltBuckets = saltBuckets)
      view.foreach(_.catchUp())
      c += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    deleteRecursively(rootPath)
    Result(cfg.numEvents, sec, cfg.numEvents / sec)
  }

  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_EVENTS", "4000000").toLong
    val cpusList = sys.env.getOrElse("SPARK_GRAFT_CPUS_LIST", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val salt = sys.env.getOrElse("SPARK_GRAFT_SALT", "0").toInt
    val withView = sys.env.get("SPARK_GRAFT_MATVIEW").contains("1")
    val chunks = sys.env.getOrElse("SPARK_GRAFT_CHUNKS", "8").toInt
    // tmpfs mode: put the lake table AND spark shuffle dirs on /dev/shm so
    // the two-core-count comparison measures compute scaling, not the
    // sandbox's single-disk write bandwidth (see BENCH/BASELINE.md)
    val tmpfs = sys.env.get("SPARK_GRAFT_TMPFS").contains("1")
    val benchDir = if (tmpfs) Some("/dev/shm") else None
    val hotFraction = sys.env.getOrElse("SPARK_GRAFT_HOT", "0.0").toDouble
    val cfg = FeedConfig(seed = 42L, numEvents = nEvents,
      numDocs = math.max(1000L, nEvents / 10), numHot = 4,
      hotFraction = hotFraction, deletePct = 5, maxTokens = 64)

    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    // interleave mode alternates the core counts per repeat (2,8,2,8,…)
    // instead of finishing all runs of one size first: the sandbox VM's
    // throughput drifts over minutes (noisy neighbors), and a sequential
    // protocol lets that drift masquerade as (anti-)scaling. Interleaving
    // samples both sizes under the same machine conditions.
    val interleave = sys.env.get("SPARK_GRAFT_INTERLEAVE").forall(_ == "1")

    def runOnce(cpus: Int, warm: Boolean): Result = {
      val b = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.cleaner.periodicGC.interval", "30s")
        // sort-based shuffle writer: the bypass-merge writer opens
        // maps*reducers streams and its write CPU was measured to 4x at 32
        // threads; the sort writer stays sequential per map task
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      if (tmpfs) b.config("spark.local.dir", "/dev/shm/graft-spark-local")
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      if (warm) // small replay to JIT/codegen before the timed run
        replayThroughput(spark, cfg.copy(numEvents = math.min(500000L, nEvents / 10)),
          chunks = 2, saltBuckets = salt, benchDir = benchDir, withView = withView)
      val r = replayThroughput(spark, cfg, chunks = chunks, saltBuckets = salt,
        benchDir = benchDir, withView = withView)
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      r
    }

    // best-of-N per size: min-time isolates the machine-independent cost
    val results: Seq[(Int, Result)] =
      if (interleave)
        (0 until repeats).flatMap(rep => cpusList.map(c => c -> runOnce(c, warm = rep == 0)))
          .groupBy(_._1).view.mapValues(_.map(_._2).minBy(_.sec)).toSeq.sortBy(_._1)
      else
        cpusList.map { cpus =>
          cpus -> (0 until repeats).map(i => runOnce(cpus, warm = i == 0)).minBy(_.sec)
        }

    val parts = results.map { case (cpus, r) =>
      "\"local[" + cpus + "]\":{\"events\":" + r.events +
        ",\"sec\":" + f3(r.sec) + ",\"events_per_sec\":" + f1(r.eps) + "}"
    }.mkString(",")
    val eff =
      if (results.size >= 2) {
        val (c1, r1) = results.head
        val (c2, r2) = results.last
        r2.eps / ((c2.toDouble / c1) * r1.eps)
      } else Double.NaN
    println("{\"metric\":\"cdc_scaling\",\"salt\":" + salt +
      ",\"matview\":" + withView +
      ",\"hot\":" + hotFraction +
      ",\"tmpfs\":" + tmpfs + ",\"chunks\":" + chunks +
      ",\"runs\":{" + parts + "},\"efficiency\":" + f3(eff) + "}")
  }
}
