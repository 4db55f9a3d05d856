package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.cdc.Lww
import graft.feed.{EventGen, FeedConfig}

/** Dev probe: per-stage executor metrics for the fused reduce at a given
  * core count — run time, GC time, spill, shuffle bytes.
  */
object StageMetricsProbe {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_EVENTS", "12000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cfg = FeedConfig(seed = 42L, numEvents = nEvents,
      numDocs = nEvents / 10, deletePct = 5, maxTokens = 64)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-probe-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        val wall = sc.stageInfo.completionTime.getOrElse(0L) -
          sc.stageInfo.submissionTime.getOrElse(0L)
        println(f"[stage] id=${sc.stageInfo.stageId}%3d tasks=${sc.stageInfo.numTasks}%3d " +
          f"wall=${wall / 1000.0}%6.2fs cpuSum=${m.executorRunTime / 1000.0}%7.2fs " +
          f"gc=${m.jvmGCTime / 1000.0}%6.2fs " +
          f"spillMem=${m.memoryBytesSpilled / 1e6}%8.1fMB spillDisk=${m.diskBytesSpilled / 1e6}%8.1fMB " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"shWTime=${m.shuffleWriteMetrics.writeTime / 1e9}%6.2fs " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"fetchWait=${m.shuffleReadMetrics.fetchWaitTime / 1000.0}%6.2fs " +
          f"deserT=${m.executorDeserializeTime / 1000.0}%5.2fs " +
          f"resultSer=${m.resultSerializationTime / 1000.0}%5.2fs")
      }
    })

    val batch = spark.range(0, nEvents)
      .mapPartitions(_.map(i => EventGen.event(cfg, i))).toDF()
    // small warmup
    spark.range(0, 300000).mapPartitions(_.map(i => EventGen.event(cfg, i))).toDF()
      .write.format("noop").mode(SaveMode.Overwrite).save()

    println(s"=== fused hash reduce, $nEvents events, local[$cpus] ===")
    var t0 = System.nanoTime()
    Lww.reduceBucketed(batch, "doc_id", 32)
      .write.format("noop").mode(SaveMode.Overwrite).save()
    println(f"[total-hash] ${(System.nanoTime() - t0) / 1e9}%.2f s")

    println(s"=== sort/window reduce, $nEvents events, local[$cpus] ===")
    t0 = System.nanoTime()
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy(col("doc_id")).orderBy(col("lsn").desc)
      batch.repartition(32, col("doc_id"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
        .write.format("noop").mode(SaveMode.Overwrite).save()
    }
    println(f"[total-sort] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
