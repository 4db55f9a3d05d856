package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.LakeTable

/** Per-file key blooms (opt-in `keyBloomBits`): point lookups skip the
  * key's-bucket files that provably cannot contain the probe, and results
  * stay identical to the bloom-less path.
  */
class BloomLookupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", LongType, nullable = true)))

  private def fill(table: LakeTable, epochs: Int, rowsPer: Int): Unit =
    (0 until epochs).foreach { c =>
      val batch = spark.range(c * rowsPer.toLong, (c + 1) * rowsPer.toLong)
        .select(lit("I").as("op"), col("id").as("doc_id"),
          col("id").as("lsn"), (col("id") * 3).as("payload"))
      table.upsert(batch, epochId = c.toLong)
    }

  test("lookup opens only bloom-matching files; results equal bloom-off table") {
    val root = tmpDir("bloom")
    // ONE bucket: bucket pruning can't help, only the bloom can
    val bloomed = LakeTable.create(spark, s"$root/on", schema,
      keyCol = "doc_id", numBuckets = 1, keyBloomBits = 4096)
    val plain = LakeTable.create(spark, s"$root/off", schema,
      keyCol = "doc_id", numBuckets = 1)
    fill(bloomed, epochs = 5, rowsPer = 100)
    fill(plain, epochs = 5, rowsPer = 100)
    assert(bloomed.liveFiles().size == 5)
    assert(bloomed.liveFiles().forall(_.keyBloom.isDefined))

    // a key from epoch 3 lives in exactly one of the 5 single-bucket
    // files; the bloom must narrow the plan to ~that file (allow FP slack)
    val probe = 342L
    val q = bloomed.lookup(probe)
    assert(q.select("payload").as[Long].collect().toSeq == Seq(probe * 3))
    val opened = q.inputFiles.length
    assert(opened < 5, s"bloom pruned nothing: opened $opened of 5")
    // exact parity with the bloom-less table on hits AND misses
    assert(plain.lookup(probe).collect().toSeq == q.collect().toSeq)
    assert(bloomed.lookup(99999L).count() == 0)
    assert(bloomed.lookup(99999L).inputFiles.length <= 1,
      "a definitively-absent key should open at most FP-rate files")

    // lookupAll: keys from two different epochs — union of their files
    val multi = bloomed.lookupAll(Seq(42L, 442L))
    assert(multi.select("doc_id").as[Long].collect().toSet == Set(42L, 442L))
    assert(multi.inputFiles.length < 5)
  }

  test("blooms survive reload, checkpoint roll-up, and compaction") {
    val root = tmpDir("bloom2")
    val t0 = LakeTable.create(spark, s"$root/t", schema,
      keyCol = "doc_id", numBuckets = 2, keyBloomBits = 1024)
    fill(t0, epochs = 4, rowsPer = 50)
    // cold reload parses the manifest (possibly via a checkpoint): blooms
    // must round-trip the JSON codecs
    val re = LakeTable.load(spark, s"$root/t")
    assert(re.keyBloomBits == 1024)
    assert(re.liveFiles().forall(_.keyBloom.isDefined))
    assert(re.lookup(77L).select("payload").as[Long].head() == 231L)
    // compaction rewrites through the same writeDelta → new files carry
    // fresh blooms
    re.compact()
    assert(re.liveFiles().forall(_.keyBloom.isDefined))
    assert(re.lookup(77L).select("payload").as[Long].head() == 231L)
  }
}
