package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output for SparkEntry queries to text
  * files — the plan-evidence producer for the optimization rounds.
  * Usage: runMain graft.tools.ExplainQ <q1,q2,...|all> <outDir> <suffix> [sfDir]
  * Writes `<outDir>/<query>_<suffix>.txt` per query. The bench session
  * confs (local[32], shuffle=32, AQE on) are mirrored so the captured
  * plan is the one the bench executes (modulo AQE's runtime re-plan).
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val names0 = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (names0 == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else names0.split(",").toSeq
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        println(s"[explainq] wrote $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[explainq] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
