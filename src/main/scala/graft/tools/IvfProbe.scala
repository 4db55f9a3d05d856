package graft.tools
import org.apache.spark.sql.SparkSession
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = graft.operators.Similarity.bruteForceTopK(emb, 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (it <- Seq(0, 1, 2, 3, 4); seed <- Seq(42L, 7L, 13L, 1L)) {
      val t0 = System.nanoTime()
      val ivf = graft.operators.Similarity.ivfTopK(emb, 4, 8, 3, nprobe = 2,
          kmeansIters = it, seed = seed)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = exact.intersect(ivf).size.toDouble / exact.size
      println(f"[ivf] iters=$it seed=$seed time=$dt%.2f s recall=$recall%.2f")
    }
    spark.stop()
  }
}
