package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.stream.DedupIngest

/** Throughput probe for streaming near-dup admission: synthesize
  * SPARK_GRAFT_DOCS (default 400k) deterministic docs — a controlled
  * fraction of them near-copies of earlier docs — replay them through
  * [[DedupIngest.admitBatch]] in SPARK_GRAFT_CHUNKS batches against a
  * growing lake-resident index, and report docs/sec per core count in
  * SPARK_GRAFT_CPUS_LIST (interleave repeats like CdcBench when listing
  * two sizes). Sanity: admitted count must be exactly the number of
  * distinct originals (copies are Hamming-0 → guaranteed banded
  * candidates → always rejected).
  *
  * Doc text is a pure function of the original id (splitmix64-seeded
  * word picks), so the run is replay-deterministic at any scale.
  */
object AdmissionProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DOCS", "400000").toLong
    val chunks = sys.env.getOrElse("SPARK_GRAFT_CHUNKS", "4").toInt
    val dupPct = sys.env.getOrElse("SPARK_GRAFT_DUP_PCT", "20").toInt
    val cpusList = sys.env.getOrElse("SPARK_GRAFT_CPUS_LIST", "32")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "1").toInt
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_DIR", "/dev/shm")
    // band mode: probe against the band-keyed index layout instead of
    // the full-scan path; tailDocs > 0 adds a small-batch tail phase
    // (tailBatches batches of tailDocs fresh docs against the full
    // index) — the shape where the band probe's manifest pruning pays
    val bandMode = sys.env.get("SPARK_GRAFT_BANDS").contains("1")
    val tailDocs = sys.env.getOrElse("SPARK_GRAFT_TAIL", "0").toLong
    val tailBatches = sys.env.getOrElse("SPARK_GRAFT_TAIL_BATCHES", "8").toInt

    val results = scala.collection.mutable.Map.empty[String, Double]
    for (rep <- 1 to repeats; cpus <- cpusList) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", s"$baseDir/graft-admit-local")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val root = Files.createTempDirectory(
          java.nio.file.Paths.get(baseDir), "graft-admit-").toString
        // doc i < originals: text = 24 words picked by splitmix64(i);
        // doc i >= originals: byte-identical copy of original i % originals
        val originals = nDocs * (100 - dupPct) / 100
        val docs = spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 24).map { w =>
            // same mix-constant trick as EventGen: word w of doc i
            val h = xxhash64(
              when(col("id") < originals, col("id"))
                .otherwise(pmod(col("id"), lit(originals))) * 31 + w)
            concat(lit("w"), pmod(h, lit(997)))
          }: _*).as("text"))
        val perChunk = (nDocs + chunks - 1) / chunks
        val table = DedupIngest.indexTable(spark, s"$root/idx", numBuckets = 8)
        val bands = if (bandMode)
          Some(DedupIngest.ensureBandTable(spark, table, s"$root/bands"))
        else None
        val t0 = System.nanoTime()
        var admitted = 0L
        (0 until chunks).foreach { c =>
          val batch = docs.filter(
            col("doc_id") >= c * perChunk && col("doc_id") < (c + 1) * perChunk)
          admitted += DedupIngest.admitBatch(table, batch, epochId = c.toLong,
            bandTable = bands).count()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val indexed = table.read().count()
        require(indexed == admitted, s"index $indexed != admitted $admitted")
        // the promised recall/precision sanity, actually enforced: every
        // copy is byte-identical (Hamming-0 ⇒ guaranteed banded candidate
        // ⇒ always rejected), and originals are random 24-of-997-word
        // docs (near-dup collisions possible but ≲1%) — so admitted must
        // sit within 1% of the original count, catching both a recall
        // regression (copies slipping through: admitted too high) and an
        // over-rejection bug (admitted too low)
        require(math.abs(admitted - originals) <= originals / 100,
          s"admitted $admitted outside 1% of originals $originals — " +
            "admission recall/precision regression")
        val rate = nDocs / sec
        val key = s"cpus=$cpus"
        results(key) = math.max(results.getOrElse(key, 0.0), rate)
        println(f"[admission] rep=$rep cpus=$cpus bands=$bandMode docs=$nDocs " +
          f"admitted=$admitted (${100.0 * admitted / nDocs}%.1f%%) " +
          f"sec=$sec%.1f rate=${rate}%.0f docs/s")
        // tail phase: tiny fresh batches against the FULL index — the
        // steady-state trigger shape (index >> batch) where the band
        // layout's manifest pruning turns the probe from a full index
        // scan into a few band-range files
        if (tailDocs > 0) {
          val tt0 = System.nanoTime()
          (0 until tailBatches).foreach { b =>
            val lo = nDocs * 10 + b * tailDocs // fresh id space
            val tb = spark.range(lo, lo + tailDocs).select(
              col("id").as("doc_id"),
              concat_ws(" ", (0 until 24).map { w =>
                concat(lit("t"), pmod(xxhash64(col("id") * 31 + w), lit(997)))
              }: _*).as("text"))
            DedupIngest.admitBatch(table, tb, epochId = chunks.toLong + b,
              bandTable = bands).count()
          }
          val tsec = (System.nanoTime() - tt0) / 1e9
          val tkey = s"tail cpus=$cpus"
          results(tkey) = math.max(results.getOrElse(tkey, 0.0),
            tailBatches / tsec)
          println(f"[admission] tail: $tailBatches batches x $tailDocs docs " +
            f"vs ${admitted}-doc index, bands=$bandMode " +
            f"sec=$tsec%.2f (${tsec / tailBatches}%.3f s/batch)")
        }
        graft.lake.LakeFs.forRoot(root).deleteRecursively(root)
      } finally spark.stop()
    }
    println("admission_summary " + results.toSeq.sortBy(_._1)
      .map { case (k, v) => f"$k:${v}%.0f" }.mkString(" "))
  }
}
