package graft

import org.apache.spark.sql.functions._

import graft.stream.EmbedIngest

/** Embedding-cosine admission: exact copies always rejected (identical
  * vector ⇒ identical bucket ⇒ guaranteed candidate ⇒ cosine 1.0),
  * replay no-op, stream == sequential fold.
  */
class EmbedIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select($"vec_id", $"embedding")

  test("exact vector copies are rejected, fresh vectors admitted; replay no-op") {
    val root = tmpDir("eadmit1")
    val table = EmbedIngest.indexTable(spark, s"$root/idx", dim = 64, bits = 2, seed = 42L)
    val b1 = emb.filter($"vec_id" < 40)
    val kept1 = EmbedIngest.admitBatch(table, b1, 0L, dim = 64, bits = 2,
      seed = 42L, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept1.nonEmpty && kept1.size <= 40)
    assert(table.read().count() == kept1.size)

    val copies = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 9000).as("vec_id"), $"embedding")
    val freshVecs = emb.filter($"vec_id" >= 200 && $"vec_id" < 215)
    val kept2 = EmbedIngest.admitBatch(table, copies.union(freshVecs), 1L,
      dim = 64, bits = 2, seed = 42L, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    val admittedUnder20 = kept1.filter(_ < 20)
    assert(admittedUnder20.forall(id => !kept2.contains(id + 9000)),
      s"copies of admitted vectors slipped through: ${kept2.filter(_ >= 9000)}")

    // replay epoch 1: no new snapshot, state unchanged
    val snap = table.currentSnapshotId
    EmbedIngest.admitBatch(table, copies.union(freshVecs), 1L,
      dim = 64, bits = 2, seed = 42L, threshold = 0.95)
    assert(table.currentSnapshotId == snap)
  }

  test("streaming == sequential batch admission") {
    val root = tmpDir("eadmit2")
    val all = emb.filter($"vec_id" < 100)
    (0 until 3).foreach { i =>
      all.filter($"vec_id" % 3 === i).coalesce(1)
        .write.parquet(s"$root/feed/chunk=$i")
    }
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/feed")
    // numBuckets == shuffle.partitions (4): the alignment that once let
    // an elided placement repartition coalesce under streaming conf
    // propagation — locked for the vector path too
    val q = EmbedIngest.run(stream, s"$root/idx", s"$root/ckpt",
      dim = 64, bits = 2, threshold = 0.9, numBuckets = 4,
      docsRoot = Some(s"$root/docs"))
    q.awaitTermination()
    val streamed = graft.lake.LakeTable.load(spark, s"$root/idx")
      .read().select("vec_id").as[Long].collect().toSet
    // the admitted-vectors sink tracks the index exactly
    assert(graft.lake.LakeTable.load(spark, s"$root/docs")
      .read().select("vec_id").as[Long].collect().toSet == streamed)

    val ref = EmbedIngest.indexTable(spark, s"$root/ref", dim = 64, bits = 2, seed = 42L)
    (0 until 3).foreach { i =>
      EmbedIngest.admitBatch(ref, spark.read.parquet(s"$root/feed/chunk=$i"),
        i.toLong, dim = 64, bits = 2, seed = 42L, threshold = 0.9)
    }
    val sequential = ref.read().select("vec_id").as[Long].collect().toSet
    assert(streamed == sequential)
    assert(streamed.nonEmpty)
  }

  test("degenerate vectors are dropped deterministically; LSH param drift refused") {
    val root = tmpDir("eadmit3")
    val table = EmbedIngest.indexTable(spark, s"$root/idx", dim = 3,
      bits = 2, seed = 7L)
    val batch = Seq(
      (1L, Some(Seq(1f, 0f, 0f))),
      (2L, None),                      // null embedding
      (3L, Some(Seq(0f, 0f, 0f))),     // zero norm
      (4L, Some(Seq(0f, 1f, 0f)))).toDF("vec_id", "embedding")
    val kept = EmbedIngest.admitBatch(table, batch, 0L, dim = 3, bits = 2,
      seed = 7L, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    // real vectors admitted (orthogonal — not near-dups); degenerates gone
    assert(kept == Set(1L, 4L), s"got $kept")
    assert(table.read().count() == 2)
    // a poison row must NOT wedge the stream: the same batch replays fine
    // under a new epoch with more degenerates
    val kept2 = EmbedIngest.admitBatch(table,
      Seq((9L, None: Option[Seq[Float]]), (10L, Some(Seq(0f, 0f, 0f))))
        .toDF("vec_id", "embedding"), 1L, dim = 3, bits = 2, seed = 7L,
      threshold = 0.9)
    assert(kept2.count() == 0)
    // parameter drift: different bits against the same index refuses loudly
    assertThrows[IllegalArgumentException](
      EmbedIngest.indexTable(spark, s"$root/idx", dim = 3, bits = 3, seed = 7L))
  }

  test("clustered index: single-bucket probe opens a strict file subset") {
    val root = tmpDir("eadmit4")
    val table = EmbedIngest.indexTable(spark, s"$root/idx", dim = 64,
      bits = 2, seed = 42L, numBuckets = 2)
    val b1 = emb.filter($"vec_id" < 300)
    EmbedIngest.admitBatch(table, b1, 0L, dim = 64, bits = 2, seed = 42L,
      threshold = 0.95)
    // commits are clustered by LSH bucket: every file carries a tight
    // single-value bucket stat (bits=2 → cluster == bucket)
    assert(table.liveFiles().size > 2)
    assert(table.liveFiles().forall(f =>
      f.colMin.get("bucket").isDefined && f.colMin.get("bucket") == f.colMax.get("bucket")),
      "index file spans LSH buckets — stats cannot prune")
    // a probe restricted to ONE lsh bucket opens only that bucket's files
    val probe = table.readInsertOnly().filter(col("bucket") === 1)
    probe.collect()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val scanned = unwrap(probe.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    val expected = table.liveFiles().count(_.colMin.get("bucket").contains("1"))
    assert(scanned == expected && expected < table.liveFiles().size,
      s"probe opened $scanned of ${table.liveFiles().size}, expected $expected")
  }

  test("two-table admission: vectors-before-index commit order survives a mid-crash") {
    import org.apache.spark.sql.types._
    val root = tmpDir("eadmit5")
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true)))
    val idx = EmbedIngest.indexTable(spark, s"$root/idx", dim = 64, bits = 2, seed = 42L)
    val out = graft.lake.LakeTable.create(spark, s"$root/out", schema,
      keyCol = "vec_id", numBuckets = 4)
    val b0 = emb.filter($"vec_id" < 40)
    val b1 = emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 5000).as("vec_id"), $"embedding") // copies → rejected
      .union(emb.filter($"vec_id" >= 300 && $"vec_id" < 330))
    EmbedIngest.admitBatch(idx, b0, 0L, dim = 64, bits = 2, seed = 42L,
      threshold = 0.95, docsTable = Some(out))
    // derive batch 1's survivors against the same index state on a scratch
    // root (admission is a pure function of (batch, index state))
    val scratch = EmbedIngest.indexTable(spark, s"$root/scratch", dim = 64,
      bits = 2, seed = 42L)
    EmbedIngest.admitBatch(scratch, b0, 0L, dim = 64, bits = 2, seed = 42L,
      threshold = 0.95)
    val survivors1 = EmbedIngest.admitBatch(scratch, b1, 1L, dim = 64,
      bits = 2, seed = 42L, threshold = 0.95)
    // CRASH SIMULATION: the vectors sink committed epoch 1, the index did
    // not — exactly the state the vectors-first order can leave
    out.upsert(survivors1.select(lit("I").as("op"), lit(1L).as("lsn"),
      $"vec_id", $"embedding"), epochId = 1L)
    val replayed = EmbedIngest.admitBatch(idx, b1, 1L, dim = 64, bits = 2,
      seed = 42L, threshold = 0.95, docsTable = Some(out))
    val outIds = out.read().select("vec_id").as[Long].collect().toSet
    val idxIds = idx.read().select("vec_id").as[Long].collect().toSet
    assert(outIds == idxIds, "vectors sink and index must agree after replay")
    assert(replayed.select("vec_id").as[Long].collect().toSet ==
      survivors1.select("vec_id").as[Long].collect().toSet)
    assert(out.read().count() == outIds.size)
    // full re-delivery (crash after BOTH commits): original survivors back
    val redelivered = EmbedIngest.admitBatch(idx, b1, 1L, dim = 64, bits = 2,
      seed = 42L, threshold = 0.95, docsTable = Some(out))
      .select("vec_id").as[Long].collect().toSet
    assert(redelivered == survivors1.select("vec_id").as[Long].collect().toSet)
  }

  test("inline compaction keeps the index bounded and clustered; admitted set unchanged") {
    val root = tmpDir("eadmit6")
    val all = emb.filter($"vec_id" < 120)
    (0 until 6).foreach { i =>
      all.filter($"vec_id" % 6 === i).coalesce(1)
        .write.parquet(s"$root/feed/chunk=$i")
    }
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/feed")
    val q = EmbedIngest.run(stream, s"$root/idx", s"$root/ckpt",
      dim = 64, bits = 2, threshold = 0.9, numBuckets = 2,
      docsRoot = Some(s"$root/docs"), maxFilesPerBucket = 4)
    q.awaitTermination()
    val idx = graft.lake.LakeTable.load(spark, s"$root/idx")
    val perBucket = idx.liveFiles().groupBy(_.bucket).map(_._2.size)
    assert(perBucket.forall(_ <= 4), s"buckets exceed file bound: $perBucket")
    // the clustered compaction keeps every file pure in its LSH bucket
    assert(idx.liveFiles().forall(f =>
      f.colMin.get("bucket") == f.colMax.get("bucket")),
      "compaction erased the bucket clustering")
    val ref = EmbedIngest.indexTable(spark, s"$root/ref", dim = 64, bits = 2,
      seed = 42L, numBuckets = 2)
    (0 until 6).foreach { i =>
      EmbedIngest.admitBatch(ref, spark.read.parquet(s"$root/feed/chunk=$i"),
        i.toLong, dim = 64, bits = 2, seed = 42L, threshold = 0.9)
    }
    assert(idx.read().select("vec_id").as[Long].collect().toSet ==
      ref.read().select("vec_id").as[Long].collect().toSet)
  }

  test("LSH param drift across a stream RESTART is refused before any batch runs") {
    val root = tmpDir("eadmit7")
    val all = emb.filter($"vec_id" < 60)
    all.coalesce(1).write.parquet(s"$root/feed/chunk=0")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/feed")
    EmbedIngest.run(stream, s"$root/idx", s"$root/ckpt", dim = 64, bits = 2,
      threshold = 0.9, numBuckets = 2).awaitTermination()
    assert(graft.lake.LakeTable.load(spark, s"$root/idx").read().count() > 0)
    // restart the SAME stream with different planes: must refuse at start
    // (stored buckets are a function of the planes), not corrupt silently
    assertThrows[IllegalArgumentException](
      EmbedIngest.run(stream, s"$root/idx", s"$root/ckpt", dim = 64, bits = 3,
        threshold = 0.9, numBuckets = 2))
    // and a faithful restart still works (nothing new → no commits)
    val before = graft.lake.LakeTable.load(spark, s"$root/idx").currentSnapshotId
    EmbedIngest.run(stream, s"$root/idx", s"$root/ckpt", dim = 64, bits = 2,
      threshold = 0.9, numBuckets = 2).awaitTermination()
    assert(graft.lake.LakeTable.load(spark, s"$root/idx").currentSnapshotId == before)
  }
}
