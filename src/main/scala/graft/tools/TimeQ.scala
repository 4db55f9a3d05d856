package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries in ONE JVM (3 reps each, noop
  * sink): `runMain graft.tools.TimeQ <q1,q2,...> [sfDir]`. The
  * fast-iteration twin of graft.Bench for optimizing a single query —
  * per-invocation JVM/sbt startup would otherwise swamp sub-second
  * queries. Read the MINIMUM rep (rep1 carries JIT warmup).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[timeq] $n rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
