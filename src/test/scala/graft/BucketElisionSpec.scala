package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.LakeTable

/** Upsert must produce a correctly bucket-placed delta even when the
  * incoming batch is ALREADY hash-partitioned on the key with exactly
  * numBuckets partitions (e.g. it ends in a groupBy(key) under
  * shuffle.partitions == numBuckets). In that alignment Spark elides the
  * explicit repartition as redundant, and the surviving upstream
  * aggregate exchange — unlike an explicit REPARTITION_BY_NUM — is fair
  * game for AQE partition coalescing: tasks then cover several adjacent
  * buckets and the write-side layout verification aborts the commit.
  * Found live by tools/AdmissionProbe at local[8] with an 8-bucket index.
  */
class BucketElisionSpec extends SparkSpec {
  import spark.implicits._

  test("admitBatch delta is bucket-pure at numBuckets == shuffle.partitions") {
    val root = tmpDir("elision-admit")
    val table = graft.stream.DedupIngest.indexTable(spark, s"$root/idx",
      numBuckets = 4)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
    val kept = graft.stream.DedupIngest.admitBatch(table, docs, epochId = 0L)
    assert(kept.count() > 0)
    assert(table.read().count() == kept.count())
  }

  test("upsert from a key-partitioned aggregate at numBuckets == shuffle.partitions") {
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4",
      "repro requires the alignment")
    val root = tmpDir("elision")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", LongType, nullable = true)))
    val table = LakeTable.create(spark, root, schema,
      keyCol = "doc_id", numBuckets = 4)
    // a batch whose plan ENDS in an aggregate exchange on doc_id with
    // the session's 4 shuffle partitions — tiny, so AQE wants to
    // coalesce it to one task
    val batch = spark.range(200)
      .select(col("id").as("doc_id"), (col("id") * 7).as("lsn"))
      .groupBy("doc_id").agg(max("lsn").as("lsn"))
      .select(lit("I").as("op"), col("doc_id"), col("lsn"),
        (col("doc_id") + 1).as("payload"))
    table.upsert(batch, epochId = 0L) // must not throw the layout violation
    assert(table.read().count() == 200)
    // positive contract, independently of the footer defense: every
    // on-disk data file's rows hash to exactly the bucket number its
    // Spark bucket suffix (`_0000N`) claims
    val perFile = table.read()
      .select(col("doc_id"),
        regexp_extract(input_file_name(), "_(\\d{5})\\.", 1).cast("int").as("claimed"),
        pmod(hash(col("doc_id")), lit(4)).as("actual"))
    assert(perFile.filter(col("claimed") =!= col("actual")).count() == 0)
    assert(perFile.select("claimed").distinct().count() > 1,
      "repro degenerated: all rows in one bucket proves nothing")
  }
}
