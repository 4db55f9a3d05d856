package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.model.Schemas
import graft.stream.CdcIngest

/** The CDC pipeline driven from the shared `events` test table, so the
  * whole dedup→LWW→merge→read path has an independent SQL oracle (DuckDB
  * window + filter) on data we didn't generate ourselves.
  *
  * Mapping: event_id → lsn (total order), user_id → doc_id,
  * event_type 'error' → D, 'signup' → I, else U; payload token =
  * floor(value*100).
  */
object CdcQueries {

  def eventsAsFeed(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val isDel = col("event_type") === "error"
    ev.select(
      when(isDel, "D").when(col("event_type") === "signup", "I").otherwise("U").as("op"),
      col("user_id").cast("string").as("doc_id"),
      col("event_id").as("lsn"),
      col("ts"),
      when(isDel, lit(null)).otherwise(array(floor(col("value") * 100).cast("int"))).as("tokens"),
      when(isDel, lit(null)).otherwise(lit(1)).cast("int").as("n_tok"),
      col("event_type").as("source"))
  }

  /** Full engine replay: LSN-chunked batches through dedup→LWW→merge into
    * a fresh snapshot-log table, then the merged read. Output one row per
    * surviving key: (doc_id, tok0, n_tok, source).
    */
  def replayToTable(spark: SparkSession, dir: String, chunks: Int = 4): DataFrame = {
    val feed = eventsAsFeed(spark, dir)
    val bounds = feed.agg(min("lsn"), max("lsn")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // fixed scratch path per input dir (not a fresh temp dir per call):
    // the returned DataFrame reads these files lazily, so they must
    // outlive this method — reusing the slot bounds the footprint to one
    // lake per input instead of leaking a directory per invocation
    val root = s"${sys.props("java.io.tmpdir")}/graft-q-lake-${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    deleteRecursively(java.nio.file.Paths.get(root))
    // bucket count = available parallelism: the bucket-local merged read
    // runs one task per bucket, so undersizing buckets caps the read at a
    // fraction of the machine (and at cluster scale: of the executors)
    val buckets = math.max(8, spark.sparkContext.defaultParallelism)
    val table = LakeTable.create(spark, s"$root/t", Schemas.docRow, numBuckets = buckets)
    val per = (hi - lo + chunks) / chunks
    var c = 0
    while (lo + c * per <= hi) {
      val a = lo + c * per
      val b = math.min(hi, a + per - 1)
      val batch = feed.filter(col("lsn").between(a, b))
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
      c += 1
    }
    table.read().select(
      col("doc_id"),
      element_at(col("tokens"), 1).as("tok0"),
      col("n_tok"),
      col("source"))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (!Files.exists(p)) return
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }
}
