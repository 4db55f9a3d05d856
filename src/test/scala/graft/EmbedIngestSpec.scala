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
}
