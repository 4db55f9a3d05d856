package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{JoinView, LakeTable}
import graft.model.Schemas
import graft.stream.CdcIngest

/** Keyed enrichment view: left ⟕ right over current winners, equal to
  * the from-scratch join after every maintain, under independent updates
  * and deletes on both sides, crash-replay, and bounded catch-up.
  */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private val scoreSchema = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("quality", IntegerType, nullable = true),
    StructField("judge", StringType, nullable = true)))

  private def docBatch(base: LakeTable,
      rows: Seq[(String, String, Long, Seq[Int], String)], e: Long): Unit = {
    val df = rows.toDF("op", "doc_id", "lsn", "tokens", "source")
      .select(col("op"), col("doc_id"), col("lsn"),
        current_timestamp().as("ts"),
        when(col("op") === "D", lit(null)).otherwise(col("tokens")).as("tokens"),
        when(col("op") === "D", lit(null))
          .otherwise(size(col("tokens"))).cast("int").as("n_tok"),
        col("source"))
    CdcIngest.applyBatch(base, df, epochId = e)
  }

  private def scoreBatch(base: LakeTable,
      rows: Seq[(String, String, Long, Integer, String)], e: Long): Unit = {
    val df = rows.toDF("op", "doc_id", "lsn", "quality", "judge")
    CdcIngest.applyBatch(base, df, epochId = e)
  }

  private def expected(docs: LakeTable, scores: LakeTable): Set[Row5] =
    docs.read().join(scores.read(), Seq("doc_id"), "left")
      .select(col("doc_id"), element_at(col("tokens"), 1).as("t0"),
        col("source"), col("quality"), col("judge"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.get(1).toString,
        r.getString(2),
        if (r.isNullAt(3)) null else r.get(3).toString,
        r.getString(4))).toSet

  private type Row5 = (String, String, String, String, String)

  private def got(v: JoinView): Set[Row5] =
    v.read()
      .select(col("doc_id"), element_at(col("tokens"), 1).as("t0"),
        col("source"), col("quality"), col("judge"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.get(1).toString,
        r.getString(2),
        if (r.isNullAt(3)) null else r.get(3).toString,
        r.getString(4))).toSet

  test("bootstrap + both-side updates/deletes stay equal to the fresh join") {
    val dir = tmpDir("jv1")
    val docs = LakeTable.create(spark, s"$dir/d", Schemas.docRow, numBuckets = 2)
    val scores = LakeTable.create(spark, s"$dir/s", scoreSchema, numBuckets = 2)
    docBatch(docs, Seq(("I", "a", 1L, Seq(5), "g1"), ("I", "b", 2L, Seq(7), "g1"),
      ("I", "c", 3L, Seq(9), "g2")), 0L)
    scoreBatch(scores, Seq(("I", "a", 1L, 90, "j0"), ("I", "zz", 2L, 10, "j0")), 0L)

    val v = JoinView.create(spark, s"$dir/v", docs, scores)
    assert(v.maintain().isDefined)
    assert(got(v) == expected(docs, scores))
    // right-only key 'zz' produced no view row
    assert(!got(v).exists(_._1 == "zz"))

    // right side catches up: score lands for b, a's score is updated,
    // and doc c is deleted on the left — independent folds
    scoreBatch(scores, Seq(("I", "b", 10L, 70, "j1"), ("U", "a", 11L, 95, "j1")), 1L)
    docBatch(docs, Seq(("D", "c", 10L, null, "g2")), 1L)
    assert(v.maintain().isDefined)
    assert(got(v) == expected(docs, scores))
    assert(!got(v).exists(_._1 == "c")) // left delete tombstones the view row

    // score DELETED: view row stays, right columns null out
    scoreBatch(scores, Seq(("D", "a", 20L, null, null)), 2L)
    assert(v.maintain().isDefined)
    assert(got(v) == expected(docs, scores))
    assert(got(v).exists(t => t._1 == "a" && t._4 == null))
  }

  test("caught-up view no-ops; reload resumes from persisted frontiers") {
    val dir = tmpDir("jv2")
    val docs = LakeTable.create(spark, s"$dir/d", Schemas.docRow, numBuckets = 2)
    val scores = LakeTable.create(spark, s"$dir/s", scoreSchema, numBuckets = 2)
    docBatch(docs, Seq(("I", "a", 1L, Seq(1), "g")), 0L)
    val v = JoinView.create(spark, s"$dir/v", docs, scores)
    assert(v.maintain().isDefined)
    assert(v.maintain().isEmpty)
    val r = JoinView.load(spark, s"$dir/v", docs, scores)
    assert(r.maintain().isEmpty)
    // a late right table APPEARING after bootstrap still joins in
    scoreBatch(scores, Seq(("I", "a", 1L, 50, "j")), 0L)
    assert(r.maintain().isDefined)
    assert(got(r) == expected(docs, scores))
    assert(got(r).exists(t => t._1 == "a" && t._4 == "50"))
  }

  test("bounded catch-up over many snapshots == one shot") {
    val dir = tmpDir("jv3")
    val docs = LakeTable.create(spark, s"$dir/d", Schemas.docRow, numBuckets = 2)
    val scores = LakeTable.create(spark, s"$dir/s", scoreSchema, numBuckets = 2)
    (0 until 4).foreach { e =>
      docBatch(docs, Seq(("I", s"k$e", e * 10L + 1, Seq(e), s"g${e % 2}")), e.toLong)
      scoreBatch(scores, Seq(("I", s"k${3 - e}", e * 10L + 2, e * 10, "j")), e.toLong)
    }
    val stepped = JoinView.create(spark, s"$dir/vs", docs, scores)
    stepped.catchUp(maxSnapshotsPerStep = 1)
    val oneShot = JoinView.create(spark, s"$dir/vo", docs, scores)
    oneShot.catchUp()
    assert(got(stepped) == got(oneShot))
    assert(got(stepped) == expected(docs, scores))
  }

  test("views compose: per-judge stats MatView over the enrichment view's table") {
    val dir = tmpDir("jv5")
    val docs = LakeTable.create(spark, s"$dir/d", Schemas.docRow, numBuckets = 2)
    val scores = LakeTable.create(spark, s"$dir/s", scoreSchema, numBuckets = 2)
    docBatch(docs, Seq(("I", "a", 1L, Seq(5), "g1"), ("I", "b", 2L, Seq(7), "g1"),
      ("I", "c", 3L, Seq(9), "g2")), 0L)
    scoreBatch(scores, Seq(("I", "a", 1L, 90, "j0"), ("I", "b", 2L, 70, "j1")), 0L)
    val jv = JoinView.create(spark, s"$dir/v", docs, scores)
    jv.catchUpAll()
    // a MatView whose BASE is the join view's backing table: the derived
    // pipeline docs ⟕ scores → per-judge (cnt, sum quality) stays exact
    // through further folds of the upstream pair
    val stats = graft.lake.MatView.create(spark, s"$dir/vv", jv.table,
      Seq("judge"), Seq("sum_q" -> "quality"))
    stats.catchUpAll()
    def expect: Set[(String, Long, Long)] =
      jv.read().groupBy(col("judge"))
        .agg(count(lit(1)).as("c"),
          sum(coalesce(col("quality").cast("long"), lit(0L))).as("s"))
        .as[(String, Long, Long)].collect().toSet
    def actual: Set[(String, Long, Long)] =
      stats.read().select(col("judge"), col("cnt"), col("sum_q"))
        .as[(String, Long, Long)].collect().toSet
    assert(actual == expect)
    // upstream moves: judge reassignment + a left-side delete ripple
    // through TWO view layers
    scoreBatch(scores, Seq(("U", "a", 10L, 95, "j1")), 1L)
    docBatch(docs, Seq(("D", "b", 10L, null, "g1")), 1L)
    jv.catchUpAll()
    stats.catchUpAll()
    assert(actual == expect)
    assert(actual == Set(("j1", 1L, 95L), (null, 1L, 0L)))
  }

  test("streaming ingest maintains an attached JoinView (Maintainable seam)") {
    val dir = tmpDir("jv6")
    val docs = LakeTable.create(spark, s"$dir/d", Schemas.docRow, numBuckets = 2)
    val scores = LakeTable.create(spark, s"$dir/s", scoreSchema, numBuckets = 2)
    scoreBatch(scores, Seq(("I", "a", 1L, 90, "j0"), ("I", "b", 2L, 70, "j1")), 0L)
    val v = JoinView.create(spark, s"$dir/v", docs, scores)
    // docs arrive via the streaming ingest loop with the view attached
    val feed = Seq(("I", "a", 1L, Seq(5), "g1"), ("I", "b", 2L, Seq(7), "g1"))
      .toDF("op", "doc_id", "lsn", "tokens", "source")
      .select(col("op"), col("doc_id"), col("lsn"),
        current_timestamp().as("ts"), col("tokens"),
        size(col("tokens")).cast("int").as("n_tok"), col("source"))
    feed.write.parquet(s"$dir/feed")
    CdcIngest.run(spark, s"$dir/feed", docs, s"$dir/ckpt",
      views = Seq(v)).awaitTermination()
    assert(got(v) == expected(docs, scores))
    assert(got(v).exists(t => t._1 == "a" && t._4 == "90"))
  }

  test("static right at a HIGH snapshot id: successive folds never tie in the view merge") {
    // regression: view-row lsn was max(toL, toR); with the right base
    // parked at snapshot 5 every fold stamped lsn=5, so a later fold's
    // rewrite TIED its own stale predecessor in the view's max_by merge —
    // updates could read stale and left-deletes could fail to delete
    val dir = tmpDir("jv7")
    val docs = LakeTable.create(spark, s"$dir/d", Schemas.docRow, numBuckets = 2)
    val scores = LakeTable.create(spark, s"$dir/s", scoreSchema, numBuckets = 2)
    (0 until 6).foreach { e => // park the right side at snapshot id 5
      scoreBatch(scores, Seq(("U", "a", e * 10L + 1, e * 10, s"j$e")), e.toLong)
    }
    docBatch(docs, Seq(("I", "a", 1L, Seq(5), "g1"), ("I", "b", 2L, Seq(7), "g1")), 0L)
    val v = JoinView.create(spark, s"$dir/v", docs, scores)
    assert(v.maintain().isDefined) // bootstrap
    // fold 2: update a, delete b — right untouched
    docBatch(docs, Seq(("U", "a", 10L, Seq(9), "g2"), ("D", "b", 11L, null, "g1")), 1L)
    assert(v.maintain().isDefined)
    assert(got(v) == expected(docs, scores))
    assert(got(v) == Set(("a", "9", "g2", "50", "j5")))
    // fold 3: delete a too — the view must end empty
    docBatch(docs, Seq(("D", "a", 20L, null, "g2")), 2L)
    assert(v.maintain().isDefined)
    assert(v.read().isEmpty)
  }

  test("small-batch fold opens a strict file subset of a multi-file base " +
      "(bucket + bloom pruned winner reads)") {
    val dir = tmpDir("jv8")
    val docs = LakeTable.create(spark, s"$dir/d", Schemas.docRow, numBuckets = 4)
    val scores = LakeTable.create(spark, s"$dir/s", scoreSchema, numBuckets = 4)
    // many small batches → several live files per bucket on both sides
    (0 until 8).foreach { e =>
      docBatch(docs, (0 until 8).map(i =>
        ("I", s"d${e}_$i", e * 100L + i, Seq(e + i), s"g${i % 3}")), e.toLong)
      scoreBatch(scores, (0 until 8).map(i =>
        ("I", s"d${e}_$i", e * 100L + i, Integer.valueOf(e * 10 + i), s"j${i % 2}")),
        e.toLong)
    }
    val v = JoinView.create(spark, s"$dir/v", docs, scores)
    v.catchUpAll() // bootstrap (all keys)
    val totalL = docs.mergedWinners(None).inputFiles.length
    val totalR = scores.mergedWinners(None).inputFiles.length
    assert(totalL >= 8 && totalR >= 8, s"base not multi-file: $totalL/$totalR")
    // steady state: touch ONE key per side — the fold's winner reads must
    // open only those keys' buckets' bloom-surviving files
    docBatch(docs, Seq(("U", "d3_4", 9999L, Seq(42), "g0")), 8L)
    scoreBatch(scores, Seq(("U", "d5_6", 9998L, Integer.valueOf(77), "j0")), 8L)
    assert(v.maintain().isDefined)
    val (fl, fr) = v.lastFoldFiles.get
    assert(fl > 0 && fl < totalL, s"left fold opened $fl of $totalL files")
    assert(fr > 0 && fr < totalR, s"right fold opened $fr of $totalR files")
    assert(got(v) == expected(docs, scores))
    // and the pruned fold saw BOTH touched keys' new values
    assert(got(v).exists(t => t._1 == "d3_4" && t._2 == "42"))
    assert(got(v).exists(t => t._1 == "d5_6" && t._4 == "77"))
  }

  test("name collisions and key-type mismatches are rejected at create") {
    val dir = tmpDir("jv4")
    val docs = LakeTable.create(spark, s"$dir/d", Schemas.docRow, numBuckets = 2)
    val clash = LakeTable.create(spark, s"$dir/c", StructType(Seq(
      StructField("doc_id", StringType, nullable = false),
      StructField("source", StringType, nullable = true))), numBuckets = 2)
    intercept[IllegalArgumentException] {
      JoinView.create(spark, s"$dir/v1", docs, clash)
    }
    val longKey = LakeTable.create(spark, s"$dir/l", StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("quality", IntegerType, nullable = true))), numBuckets = 2)
    intercept[IllegalArgumentException] {
      JoinView.create(spark, s"$dir/v2", docs, longKey)
    }
  }
}
