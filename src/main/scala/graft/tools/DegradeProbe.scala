package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.feed.{EventGen, FeedConfig}

/** Dev probe: does repeated identical shuffle work degrade within one JVM,
  * and does forcing GC (shuffle-file cleanup is ContextCleaner/GC-driven)
  * fix it?
  */
object DegradeProbe {
  def main(args: Array[String]): Unit = {
    val nEvents = 12000000L
    val cfg = FeedConfig(seed = 42L, numEvents = nEvents,
      numDocs = nEvents / 10, deletePct = 5, maxTokens = 64)
    val forceGc = sys.env.get("PROBE_GC").contains("1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-probe-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    (1 to 6).foreach { i =>
      val batch = spark.range(0, nEvents)
        .mapPartitions(_.map(j => EventGen.event(cfg, j))).toDF()
      val t0 = System.nanoTime()
      batch.repartition(32, col("doc_id"))
        .write.format("noop").mode(SaveMode.Overwrite).save()
      println(f"[probe] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s gc=$forceGc")
      if (forceGc) { System.gc(); Thread.sleep(500) }
    }
    spark.stop()
  }
}
