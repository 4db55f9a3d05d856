package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump ONE SparkEntry query's result to parquet — the single-query twin
  * of [[graft.Verify]] for iterating on an oracle without a full dump.
  * Usage: runMain graft.tools.DumpQuery <queryName> <sfDir> <outDir>
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
