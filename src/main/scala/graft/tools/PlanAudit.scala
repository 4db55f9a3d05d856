package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print exchange/scan counts for the heaviest queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("q43_path_algebra", "q51_nquads", "q52_temporal_offsets",
        "qd42_simhash64", "qd45_simhash_band", "q48_zero_or_more").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val ex = plan.linesIterator.count(_.contains("Exchange"))
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      val wsc = plan.linesIterator.count(_.contains("WholeStageCodegen"))
      println(f"[audit] $q%-22s exchanges=$ex scans=$scans codegenSpans=$wsc")
    }
    spark.stop()
  }
}
