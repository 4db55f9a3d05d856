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

      time("lww_nocache_noop") {
        Lww.reduce(batch).write.format("noop").mode(SaveMode.Overwrite).save()
      }

      val cached = batch.persist(StorageLevel.MEMORY_AND_DISK)
      time("gen_persist")(cached.count())

      val reduced = time("lww_shuffle") {
        val r = Lww.reduce(cached).persist(StorageLevel.MEMORY_AND_DISK)
        r.count(); r
      }

      val out2 = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "prof2").toString
      time("lww_nocache_write_single") {
        Lww.reduce(batch)
          .withColumn("_tomb", col("op") === "D")
          .withColumn("_bucket", pmod(xxhash64(col("doc_id")), lit(cpus)).cast("int"))
          .repartition(cpus, col("_bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("_bucket").parquet(s"$out2/delta")
      }
      time("keys_pruned_rescan") {
        spark.read.parquet(s"$out2/delta").select("doc_id", "lsn").write
          .format("noop").mode(SaveMode.Overwrite).save()
      }
      graft.CdcBench.deleteRecursively(java.nio.file.Paths.get(out2))

      val out = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "prof").toString
      time("write_data") {
        reduced.withColumn("_bucket", pmod(xxhash64(col("doc_id")), lit(cpus)).cast("int"))
          .repartition(cpus, col("_bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("_bucket").parquet(s"$out/data")
      }
      time("write_deletes") {
        reduced.select(col("doc_id"), col("lsn"),
            pmod(xxhash64(col("doc_id")), lit(cpus)).cast("int").as("_bucket"))
          .repartition(cpus, col("_bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("_bucket").parquet(s"$out/del")
      }
      time("lineage_agg") {
        cached.groupBy(spark_partition_id().as("p"))
          .agg(min("lsn"), max("lsn"), count(lit(1))).collect()
      }
      graft.CdcBench.deleteRecursively(java.nio.file.Paths.get(out))
      cached.unpersist(); reduced.unpersist()
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
