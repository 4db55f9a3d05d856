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

  test("auto-evolve: the v2 batch grows the table schema by itself") {
    val dir = tmpDir("evo3")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val v1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        ev("I", "a", 1L, Seq(1, 2, 3), "s0"),
        ev("I", "b", 2L, Seq(4, 5), "s0"))),
      Schemas.changeEvent)
    // a matching-schema batch with autoEvolve on is a schema no-op
    CdcIngest.applyBatch(table, v1, epochId = 0L, autoEvolve = true)
    assert(table.currentSchema.schemaId == 0)

    // v2 feed arrives: lang appears, n_tok widens — NO manual
    // evolveSchema call anywhere
    val v2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        evV2("U", "b", 10L, Seq(7, 7, 7), "en", "s0"),
        evV2("I", "d", 12L, Seq(42), "fr", "s2"))),
      Schemas.changeEventV2)
    CdcIngest.applyBatch(table, v2, epochId = 1L, autoEvolve = true)
    val cur = table.currentSchema
    assert(cur.schemaId == 1)
    val byName = cur.fields.map(f => f.name -> f).toMap
    assert(byName("n_tok").dataType == LongType)
    assert(byName.contains("lang"))
    // protocol columns never leak into the table schema
    assert(!byName.contains("op") && !byName.contains("lsn") && !byName.contains("ts"))
    // same-name fields keep their field ids (column mapping intact)
    assert(byName("doc_id").id == 1 && byName("n_tok").id == 3)
    val out = table.read().collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "d"))
    val lang = cur.fields.indexWhere(_.name == "lang")
    assert(out("a").isNullAt(lang) && out("b").getString(lang) == "en")
    assert(out("b").getLong(2) == 3L)

    // a later v1-shaped batch (narrower n_tok, no lang) evolves nothing
    // and upcasts through the name-matched projection
    val v1b = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(ev("I", "e", 20L, Seq(9, 9), "s1"))),
      Schemas.changeEvent)
    CdcIngest.applyBatch(table, v1b, epochId = 2L, autoEvolve = true)
    assert(table.currentSchema.schemaId == 1)
    val e = table.read().filter(org.apache.spark.sql.functions.col("doc_id") === "e")
      .collect().head
    assert(e.getLong(2) == 2L && e.isNullAt(lang))
  }

  test("racing identical auto-evolutions converge through the schema CAS") {
    val dir = tmpDir("evo4")
    val a = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    val b = LakeTable.load(spark, s"$dir/t") // second writer, own metadata state
    assert(b.currentSchema.schemaId == 0) // materialise b's (stale) view
    assert(a.mergeSchemaFrom(Schemas.changeEventV2))
    // b still sees v0; its identical merge loses the dense-id CAS, must
    // refresh, observe the winner already fits, and converge WITHOUT
    // publishing (false = nothing published by this call)
    assert(!b.mergeSchemaFrom(Schemas.changeEventV2))
    assert(b.currentSchema.schemaId == 1 &&
      b.currentSchema.fields.exists(_.name == "lang"))
    // a CONFLICTING merge after the race still applies on retry: a third
    // writer bringing a different new column appends it at the next id
    val c = LakeTable.load(spark, s"$dir/t")
    val withExtra = StructType(Schemas.changeEventV2.fields :+
      StructField("rev", IntegerType, nullable = true))
    assert(c.mergeSchemaFrom(withExtra))
    assert(c.currentSchema.fields.exists(_.name == "rev") &&
      c.currentSchema.fields.exists(_.name == "lang"))
  }

  test("streaming auto-evolve: run() follows the feed schema end to end") {
    val dir = tmpDir("evo5")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    // phase 1: v1 feed through the normal stream
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        ev("I", "a", 1L, Seq(1, 2), "s0"),
        ev("I", "b", 2L, Seq(3), "s0"))),
      Schemas.changeEvent).write.parquet(s"$dir/feed1")
    CdcIngest.run(spark, s"$dir/feed1", table, s"$dir/ckpt1",
      autoEvolve = true).awaitTermination()
    assert(table.currentSchema.schemaId == 0)
    // phase 2: the connector restarts declaring the v2 feed schema; the
    // table follows with no manual evolution step
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        evV2("U", "a", 10L, Seq(5, 5), "en", "s0"),
        evV2("I", "c", 11L, Seq(8), "de", "s1"))),
      Schemas.changeEventV2).write.parquet(s"$dir/feed2")
    val base = table.lastCommittedEpoch
    val events2 = spark.readStream.schema(Schemas.changeEventV2)
      .parquet(s"$dir/feed2")
    events2.writeStream
      .option("checkpointLocation", s"$dir/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        CdcIngest.applyBatch(table, batch, base + 1 + epoch, autoEvolve = true)
        ()
      }.start().awaitTermination()
    val cur = table.currentSchema
    assert(cur.schemaId == 1 && cur.fields.exists(_.name == "lang"))
    val out = table.read().collect().map(r => r.getString(0) -> r).toMap
    val lang = cur.fields.indexWhere(_.name == "lang")
    assert(out.keySet == Set("a", "b", "c"))
    assert(out("a").getString(lang) == "en" && out("b").isNullAt(lang))
    assert(out("a").schema("n_tok").dataType == LongType)
  }
}
