package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.feed.{EventGen, FeedConfig}

/** Dev probe: shuffle-only scaling under different shuffle configs. */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_EVENTS", "12000000").toLong
    val cfg = FeedConfig(seed = 42L, numEvents = nEvents,
      numDocs = math.max(1000L, nEvents / 10), deletePct = 5, maxTokens = 64)
    val variants: Seq[(String, Map[String, String])] = Seq(
      "default" -> Map.empty,
      "nocompress" -> Map("spark.shuffle.compress" -> "false",
        "spark.shuffle.spill.compress" -> "false"),
      "sortwriter" -> Map("spark.shuffle.sort.bypassMergeThreshold" -> "1"),
      "nocompress_sort" -> Map("spark.shuffle.compress" -> "false",
        "spark.shuffle.sort.bypassMergeThreshold" -> "1"))
    for ((name, conf) <- variants; cpus <- Seq(8, 32)) {
      val b = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/graft-probe-local")
      conf.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val batch = spark.range(0, nEvents)
        .mapPartitions(_.map(i => EventGen.event(cfg, i))).toDF()
      // warmup small
      batch.limit(100000).repartition(32, col("doc_id"))
        .write.format("noop").mode(SaveMode.Overwrite).save()
      val t0 = System.nanoTime()
      batch.repartition(32, col("doc_id"))
        .write.format("noop").mode(SaveMode.Overwrite).save()
      println(f"[probe] $name local[$cpus] shuffle: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
