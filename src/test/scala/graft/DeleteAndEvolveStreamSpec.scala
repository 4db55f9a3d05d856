package graft

import org.apache.spark.sql.functions._

import graft.feed.{ChangeFeed, EventGen, FeedConfig}
import graft.lake.LakeTable
import graft.model.Schemas
import graft.stream.CdcIngest
import graft.verify.FoldOracle

/** Predicate deletes (delete-by-graph analog) and schema evolution across
  * streaming restarts.
  */
class DeleteAndEvolveStreamSpec extends SparkSpec {
  import spark.implicits._

  test("deleteMatching drops a whole source 'graph'; time travel keeps it") {
    val cfg = FeedConfig(seed = 11L, numEvents = 5000, numDocs = 200,
      deletePct = 0, maxTokens = 8, numSources = 3)
    val dir = tmpDir("del")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val batch = ChangeFeed.events(spark, cfg).toDF()
    CdcIngest.applyBatch(table, batch, epochId = 0L)
    val preSnap = table.currentSnapshotId
    val before = table.read()
    val bySource = before.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.contains("src_1") && bySource("src_1") > 0)

    table.deleteMatching(col("source") === "src_1", epochId = 1L)
    val after = table.read()
    assert(after.filter($"source" === "src_1").isEmpty)
    assert(after.count() == before.count() - bySource("src_1"))
    // time travel: the graph still exists in the pre-delete snapshot
    assert(table.readAt(preSnap).filter($"source" === "src_1").count() == bySource("src_1"))
    // re-delivered delete epoch is a no-op
    val snaps = table.currentSnapshotId
    table.deleteMatching(col("source") === "src_1", epochId = 1L)
    assert(table.currentSnapshotId == snaps)
  }

  test("schema evolution across a streaming restart: v1 stream, evolve, v2 stream") {
    val cfg = FeedConfig(seed = 21L, numEvents = 4000, numDocs = 150,
      deletePct = 5, maxTokens = 8)
    val dir = tmpDir("evostream")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed1", chunks = 4)
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)

    // phase 1: v1 schema stream
    val q1 = CdcIngest.run(spark, s"$dir/feed1", table, s"$dir/ckpt1",
      maxFilesPerTrigger = 4)
    q1.awaitTermination()
    assert(FoldOracle.diff(table.read(), FoldOracle.finalState(cfg)).isEmpty)
    val epochsAfterV1 = table.lastCommittedEpoch

    // evolve the table: add lang, widen n_tok
    table.evolveSchema(Schemas.changeEventV2
      .fields.filter(f => Set("doc_id", "tokens", "n_tok", "lang", "source").contains(f.name))
      .foldLeft(new org.apache.spark.sql.types.StructType)((st, f) => st.add(f)))

    // phase 2: v2 feed (adds lang, long n_tok) — new stream, new
    // checkpoint (source schema changed), epochs continue via offset
    val v2rows = (0 until 500).map { i =>
      val e = EventGen.event(cfg.copy(seed = 99L), 100000L + i)
      org.apache.spark.sql.Row(e.op, e.doc_id, e.lsn, e.ts, e.tokens,
        if (e.n_tok == null) null else e.n_tok.longValue(),
        if (e.op == "D") null else s"lang_${i % 3}", e.source)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(v2rows), Schemas.changeEventV2)
      .write.parquet(s"$dir/feed2")
    val events2 = spark.readStream.schema(Schemas.changeEventV2)
      .option("maxFilesPerTrigger", 4).parquet(s"$dir/feed2")
    val q2 = events2.writeStream
      .option("checkpointLocation", s"$dir/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, epoch: Long) =>
        CdcIngest.applyBatch(table, b, epochsAfterV1 + 1 + epoch)
        ()
      }
      .start()
    q2.awaitTermination()

    val out = table.read()
    assert(out.schema("n_tok").dataType == org.apache.spark.sql.types.LongType)
    assert(out.schema.fieldNames.contains("lang"))
    // v2 rows carry lang; surviving v1 rows have null lang
    assert(out.filter($"lang".isNotNull).count() > 0)
    assert(out.filter($"lang".isNull).count() > 0)
    // invariant survives evolution: n_tok == size(tokens) on visible rows
    assert(out.filter($"tokens".isNotNull && $"n_tok" =!= size($"tokens")).isEmpty)
  }
}
