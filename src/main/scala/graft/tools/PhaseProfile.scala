package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.cdc.Lww
import graft.feed.{EventGen, FeedConfig}

/** Dev profiling main: times each phase of the CDC batch pipeline at the
  * requested core counts to locate non-scaling stages.
  */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_EVENTS", "8000000").toLong
    val cpusList = sys.env.getOrElse("SPARK_GRAFT_CPUS_LIST", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val cfg = FeedConfig(seed = 42L, numEvents = nEvents,
      numDocs = math.max(1000L, nEvents / 10), deletePct = 5, maxTokens = 64)

    cpusList.foreach { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/graft-prof-local")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._

      def time[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof] local[$cpus] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }

      // warmup
      spark.range(0, 500000).mapPartitions(_.map(i => EventGen.event(cfg, i))).toDF()
        .write.format("noop").mode(SaveMode.Overwrite).save()

      val batch = spark.range(0, nEvents)
        .mapPartitions(_.map(i => EventGen.event(cfg, i))).toDF()

      time("gen_noop")(batch.write.format("noop").mode(SaveMode.Overwrite).save())
      time("gen_noop2")(batch.write.format("noop").mode(SaveMode.Overwrite).save())

      val buckets = 32
      time("fused_reduce_noop") {
        Lww.reduceBucketed(batch, "doc_id", buckets)
          .write.format("noop").mode(SaveMode.Overwrite).save()
      }
      time("fused_reduce_noop2") {
        Lww.reduceBucketed(batch, "doc_id", buckets)
          .write.format("noop").mode(SaveMode.Overwrite).save()
      }
      val out = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "prof").toString
      time("fused_reduce_write") {
        Lww.reduceBucketed(batch, "doc_id", buckets)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/delta")
      }
      time("shuffle_only_noop") {
        batch.repartition(buckets, col("doc_id"))
          .write.format("noop").mode(SaveMode.Overwrite).save()
      }
      graft.CdcBench.deleteRecursively(java.nio.file.Paths.get(out))
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
