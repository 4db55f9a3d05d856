package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: split q23-style replay cost into replay (upserts) vs merged
  * read, per bucket count — locates whether bucket fan-out hurts the write
  * side (file count) or the read side (plan branches).
  */
object ReadPathProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.lake.LakeTable
    import graft.model.Schemas
    import graft.operators.CdcQueries
    import graft.stream.CdcIngest
    import org.apache.spark.sql.functions._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup
    spark.read.parquet(s"$sfDir/events.parquet").count()

    Seq(8, 32).foreach { buckets =>
      val feed = CdcQueries.eventsAsFeed(spark, sfDir)
      val bounds = feed.agg(min("lsn"), max("lsn")).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val root = java.nio.file.Files.createTempDirectory(s"probe-$buckets").toString
      val table = LakeTable.create(spark, s"$root/t", Schemas.docRow, numBuckets = buckets)
      val per = (hi - lo + 4) / 4
      time(s"replay  buckets=$buckets") {
        (0 until 4).foreach { c =>
          val a = lo + c * per
          val batch = feed.filter(col("lsn").between(a, math.min(hi, a + per - 1)))
          CdcIngest.applyBatch(table, batch, epochId = c.toLong)
        }
      }
      time(s"read    buckets=$buckets") { table.read().count() }
      time(s"read2   buckets=$buckets") { table.read().count() }
    }
    spark.stop()
  }
}
