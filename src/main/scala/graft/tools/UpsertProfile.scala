package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling main for the q23 write path: replays the events feed
  * (CdcQueries.replayToTable) N times at local[CPUS] and prints wall
  * times, so write-hardening costs can be attributed and clawed back.
  */
object UpsertProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    spark.read.parquet(s"$sfDir/events.parquet").count()
    graft.operators.CdcQueries.replayToTable(spark, sfDir, chunks = 4)
      .write.format("noop").mode("overwrite").save()
    (0 until reps).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.CdcQueries.replayToTable(spark, sfDir, chunks = 4)
        .write.format("noop").mode("overwrite").save()
      println(f"[q23] rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
