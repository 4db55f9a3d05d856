package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.lake.LakeTable
import graft.model.Schemas
import graft.stream.CdcIngest

/** Mid-feed schema evolution (FIXTURES.md §2): v2 events add `lang` and
  * widen `n_tok` int32→int64. Old files are read through field-id column
  * mapping — no rewrite.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private def ev(op: String, id: String, lsn: Long, toks: Seq[Int], src: String): Row =
    Row(op, id, lsn, new Timestamp(lsn * 1000), toks, if (toks == null) null else toks.size, src)

  private def evV2(op: String, id: String, lsn: Long, toks: Seq[Int],
                   lang: String, src: String): Row =
    Row(op, id, lsn, new Timestamp(lsn * 1000), toks,
        if (toks == null) null else toks.size.toLong, lang, src)

  test("add column + widen int32→int64 mid-replay; old files read via field-id mapping") {
    val dir = tmpDir("evo")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)

    // epoch 0: v1 events
    val v1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        ev("I", "a", 1L, Seq(1, 2, 3), "s0"),
        ev("I", "b", 2L, Seq(4, 5), "s0"),
        ev("I", "c", 3L, Seq(9), "s1"))),
      Schemas.changeEvent)
    CdcIngest.applyBatch(table, v1, epochId = 0L)

    // evolve: docs gains `lang: string`, n_tok widens to long
    val evolved = table.evolveSchema(StructType(Seq(
      StructField("doc_id", StringType, nullable = false),
      StructField("tokens", ArrayType(IntegerType, containsNull = false)),
      StructField("n_tok", LongType),
      StructField("lang", StringType),
      StructField("source", StringType))))
    assert(evolved.schemaId == 1)
    // same-name fields keep their ids; lang got a fresh id
    val ids = evolved.fields.map(f => f.name -> f.id).toMap
    assert(ids("doc_id") == 1 && ids("tokens") == 2 && ids("n_tok") == 3)
    assert(ids("lang") > 4)

    // epoch 1: v2 events — update b, delete c, insert d (with lang)
    val v2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        evV2("U", "b", 10L, Seq(7, 7, 7), "en", "s0"),
        evV2("D", "c", 11L, null, null, "s1"),
        evV2("I", "d", 12L, Seq(42), "fr", "s2"))),
      Schemas.changeEventV2)
    CdcIngest.applyBatch(table, v2, epochId = 1L)

    val out = table.read().collect().map(r =>
      r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "d"))
    // old-file row: lang null, n_tok read as long through the widening cast
    val a = out("a")
    assert(a.schema("n_tok").dataType == LongType)
    assert(a.getLong(2) == 3L && a.isNullAt(3) && a.getString(4) == "s0")
    assert(a.getSeq[Int](1) == Seq(1, 2, 3))
    val b = out("b")
    assert(b.getLong(2) == 3L && b.getString(3) == "en")
    assert(b.getSeq[Int](1) == Seq(7, 7, 7))
    val d = out("d")
    assert(d.getString(3) == "fr" && d.getLong(2) == 1L)

    // compaction rewrites everything at the current schema and state survives
    table.compact()
    val out2 = table.read().collect().map(r => r.getString(0) -> r).toMap
    assert(out2.keySet == Set("a", "b", "d"))
    assert(out2("a").isNullAt(3) && out2("b").getString(3) == "en")
    val dataFiles = table.liveFiles()
    assert(dataFiles.forall(_.schemaId == 1))
  }

  test("illegal type change is rejected") {
    val dir = tmpDir("evo2")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    intercept[IllegalArgumentException] {
      table.evolveSchema(StructType(Seq(
        StructField("doc_id", StringType),
        StructField("tokens", ArrayType(IntegerType)),
        StructField("n_tok", StringType), // int -> string: not widenable
        StructField("source", StringType))))
    }
  }
}
