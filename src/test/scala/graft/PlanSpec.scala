package graft

import org.apache.spark.sql.functions._

import graft.cdc.Lww
import graft.feed.{ChangeFeed, FeedConfig}
import graft.lake.LakeTable
import graft.model.Schemas
import graft.stream.CdcIngest

/** Physical-plan assertions: the plans must stay the plans we designed —
  * filters pushed to parquet, dims broadcast, ONE exchange in the upsert
  * pipeline, column-pruned delete view. Regressions here are performance
  * bugs even when results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("projected merged winners prune unrequested columns from the scan") {
    import graft.lake.LakeTable
    import graft.model.Schemas
    val dir = tmpDir("plan-projwin")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    (0 to 1).foreach { e => // two snapshots → the real winner-merge path
      graft.stream.CdcIngest.applyBatch(table,
        spark.range(e * 50L, e * 50L + 50).selectExpr("'U' AS op",
          "CAST(id % 20 AS STRING) AS doc_id", "id AS lsn",
          "current_timestamp() AS ts", "array(CAST(id AS INT)) AS tokens",
          "1 AS n_tok", "'s' AS source"), epochId = e.toLong)
    }
    val projected = table.mergedWinners(None, Seq("source", "n_tok"))
    val schemaLine = planOf(projected).linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    // the view-fold scan must not drag the token arrays off disk
    assert(!schemaLine.contains("tokens") && schemaLine.contains("n_tok"),
      schemaLine)
    // and the projection changes no winner: values match the full merge
    val full = table.mergedWinners(None)
      .select("doc_id", "source", "n_tok", LakeTable.LsnCol, LakeTable.TombCol)
    assert(projected.select("doc_id", "source", "n_tok",
        LakeTable.LsnCol, LakeTable.TombCol)
      .collect().map(_.toString).sorted.toSeq ==
      full.collect().map(_.toString).sorted.toSeq)
  }

  test("filter + projection push down to the parquet scan (q01)") {
    val df = SparkEntry.queries("q01_agg_filter")(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThanOrEqual(l_shipdate"), plan.take(2000))
    // column pruning: unneeded columns (l_partkey etc.) absent from scan
    val scanSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanSchema.contains("l_partkey") && scanSchema.contains("l_quantity"))
  }

  test("dimension joins broadcast (q02, q03)") {
    assert(planOf(SparkEntry.queries("q02_join_broadcast")(spark, sfDir))
      .contains("BroadcastHashJoin"))
    assert(planOf(SparkEntry.queries("q03_chain_join")(spark, sfDir))
      .contains("BroadcastHashJoin"))
  }

  test("contamination joins the eval side broadcast (qd73)") {
    // never all-pairs: the eval shingle frame is the build side of a
    // broadcast hash join (the corpus side still shuffles for its own
    // distinct/groupBy aggregates — only the JOIN avoids moving it)
    assert(planOf(SparkEntry.queries("qd73_contamination")(spark, sfDir))
      .contains("BroadcastHashJoin"))
  }

  test("fused bucketed LWW plans exactly one exchange") {
    import spark.implicits._
    val events = ChangeFeed.events(spark, FeedConfig(numEvents = 1000)).toDF()
    val reduced = Lww.reduceBucketed(events, "doc_id", 8)
    val exchanges = planOf(reduced).linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
  }

  test("multi-snapshot read is bucket-local: ZERO exchanges, no join") {
    import spark.implicits._
    val dir = tmpDir("plan-lake")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val cfg = FeedConfig(numEvents = 2000)
    // three batches so the read path must merge across snapshots
    (0 until 3).foreach { c =>
      val batch = spark.range(c * 600L, (c + 1) * 600L)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(cfg, i))).toDF()
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
    }
    assert(table.snapshots.size >= 3)
    val plan = planOf(table.read())
    // winner resolution rides the manifest-backed bucketed relation: the
    // scan reports HashPartitioning(key, n), so the aggregate's clustered
    // distribution is satisfied with no Exchange — a 100 TB read must
    // never re-shuffle data the writer already bucketed
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 0, s"expected 0 exchanges, got $exchanges:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), "bucket-local merge must not join")
    assert(plan.contains("max_by") || plan.contains("MaxBy"),
      "winner aggregate missing")
    // ONE scan node (not a plan branch per bucket), recognised as bucketed
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 bucketed scan, got $scans")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scan not bucketed:\n${plan.take(3000)}")
  }

  test("co-located join: two same-bucketed tables join with no exchange") {
    import spark.implicits._
    val dir = tmpDir("plan-spj")
    val ta = LakeTable.create(spark, s"$dir/a", Schemas.docRow, numBuckets = 4)
    val tb = LakeTable.create(spark, s"$dir/b", Schemas.docRow, numBuckets = 4)
    val cfg = FeedConfig(numEvents = 1500)
    (0 until 2).foreach { c =>
      val batch = spark.range(c * 700L, (c + 1) * 700L)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(cfg, i))).toDF()
      CdcIngest.applyBatch(ta, batch, epochId = c.toLong)
      CdcIngest.applyBatch(tb, batch, epochId = c.toLong)
    }
    // disable broadcast so the join must rely on the reported partitioning
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = ta.read().join(tb.read().select($"doc_id", $"n_tok".as("n2")), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      // both merged reads report HashPartitioning(doc_id, 4): the join is
      // co-located — at 100 TB the single biggest shuffle a consumer
      // would otherwise pay
      assert(exchanges == 0, s"expected 0 exchanges, got $exchanges:\n${plan.take(3000)}")
      assert(joined.count() > 0)
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("IVF cell assignment plans as a partial-aggregatable max_by, not a window") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = graft.operators.Similarity.kmeansCentroids(emb, nCells = 4, iters = 1)
    val plan = planOf(graft.operators.Similarity.ivfAssign(emb, centroids))
    // map-side combine: each mapper ships ONE candidate row per vec_id,
    // where the old row_number design shuffled and sorted all N×nCells
    // scored rows — at corpus scale that is nCells× the wire traffic
    assert(plan.contains("partial_max_by"), plan.take(2000))
    assert(!plan.contains("Window"), "assignment must not window-sort the corpus")
  }

  test("simhash near-dup pipeline joins on band keys — never an all-pairs product") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = planOf(graft.operators.DedupOps.simhashNearDups(docs, maxLen = 64, maxDist = 3))
    // the candidate step must be an equi-join on (block, value); a
    // cartesian/nested-loop shape is the O(N²) corpus-scale killer
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join shape detected:\n${plan.take(2000)}")
    val jac = planOf(graft.operators.DedupOps.ngramJaccard(docs, 3, 40, 0.1, maxDocFreq = 64))
    assert(!jac.contains("CartesianProduct") && !jac.contains("BroadcastNestedLoopJoin"))
  }

  test("single-snapshot read takes the fast path (no join)") {
    import spark.implicits._
    val dir = tmpDir("plan-lake2")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val cfg = FeedConfig(numEvents = 1000)
    val batch = spark.range(0L, 1000L)
      .mapPartitions(_.map(i => graft.feed.EventGen.event(cfg, i))).toDF()
    CdcIngest.applyBatch(table, batch, epochId = 0L)
    val plan = planOf(table.read())
    assert(!plan.contains("Join"), "fast path should not join")
    assert(!plan.contains("max_by"), "fast path should not aggregate")
  }

  test("point lookup prunes to one bucket (statement-pattern access path)") {
    import spark.implicits._
    val dir = tmpDir("plan-lookup")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    val cfg = FeedConfig(numEvents = 1200)
    (0 until 2).foreach { c =>
      val batch = spark.range(c * 600L, (c + 1) * 600L)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(cfg, i))).toDF()
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
    }
    val someKey = table.read().select("doc_id").head().getString(0)
    // reference analog: getStatements(s, nil, nil) point lookup via the
    // native-store index (repository.clj:716-727) — the key's bucket is
    // computed driver-side and only that bucket's files enter the plan
    // (manifest pruning: zero file opens outside the bucket, independent
    // of planner bucketing rules)
    val q = table.lookup(someKey)
    // 2 snapshots x 4 buckets = 8 live files; the key's bucket holds 2
    assert(q.inputFiles.length == 2,
      s"lookup scanned ${q.inputFiles.length} of ${table.liveFiles().size} files")
    assert(q.count() == 1)
    assert(q.head().getString(0) == someKey)
    // lookups keep pruning after compaction (single-snapshot path)
    table.compact()
    val q2 = table.lookup(someKey)
    assert(q2.inputFiles.length == 1,
      s"post-compaction lookup scanned ${q2.inputFiles.length} files")
    assert(q2.count() == 1)
    // a missing key returns empty, never errors
    assert(table.lookup("no_such_key").isEmpty)
  }

  test("lookupAll prunes to the union of key buckets; readAtEpoch resolves batch coordinates") {
    import spark.implicits._
    val dir = tmpDir("lake-multikey")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 8)
    (0 until 3).foreach { c =>
      val batch = spark.range(c * 100L, (c + 1) * 100L).map { i =>
        (s"d${i % 60}", i, Seq(i.toInt), 1, "s")
      }.toDF("doc_id", "lsn", "tokens", "n_tok", "source").withColumn("op", lit("U"))
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
    }
    // two keys → at most two buckets' files in the plan
    val keys = Seq("d3", "d7")
    val df = table.lookupAll(keys)
    assert(df.count() == 2)
    val planned = df.inputFiles.length
    val perBucket = table.liveFiles().groupBy(_.bucket)
    val maxTwoBuckets = perBucket.values.toSeq.map(_.size).sorted.reverse.take(2).sum
    assert(planned <= maxTwoBuckets && planned < table.liveFiles().size,
      s"lookupAll planned $planned files of ${table.liveFiles().size}")
    // same rows as individual lookups
    val single = keys.flatMap(k => table.lookup(k).collect()).toSet
    assert(df.collect().toSet == single)
    // epoch-addressed time travel: after batch 0, keys 0..59 with lsn <= 99
    val at0 = table.readAtEpoch(0L)
    assert(at0.count() == 60)
    assert(table.readAtEpoch(2L).agg(max(length(col("doc_id")))).head() != null)
    intercept[IllegalArgumentException](table.readAtEpoch(-5L))
  }

  test("stat-string truncation: bounds stay conservative, comparator matches UTF-8 byte order") {
    import graft.lake.LakeTable.{cpCompare, truncateLower, truncateUpper}
    def utf8Cmp(a: String, b: String): Int = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return Integer.signum(d)
        i += 1
      }
      Integer.signum(x.length - y.length)
    }
    // adversarial set: the exact region where UTF-16 order and byte order
    // diverge (supplementary vs U+E000..U+FFFF), plus plain cases
    val adversarial = Seq("", "a", "ab", "b", "", "�",
      new String(Character.toChars(0x10000)), new String(Character.toChars(0x10FFFF)),
      "a", "a" + new String(Character.toChars(0x10400)), "aa", "aÿ")
    for (a <- adversarial; b <- adversarial)
      assert(Integer.signum(cpCompare(a, b)) == utf8Cmp(a, b),
        s"cpCompare diverged from UTF-8 byte order on ${a.codePoints().toArray.toSeq} vs ${b.codePoints().toArray.toSeq}")
    // truncation properties on long strings (cap = 64 code points)
    val cap = graft.lake.LakeTable.StatTruncateChars
    val longs = Seq(
      "x" * 200,
      ("y" * 63) + new String(Character.toChars(0x10400)) + ("z" * 50),
      ("q" * 64) + "" + ("r" * 10),
      new String(Character.toChars(0x10FFFF)) * 80)
    longs.foreach { s =>
      assert(cpCompare(truncateLower(s, cap), s) <= 0, "lower bound must be <=")
      truncateUpper(s, cap) match {
        case Some(hi) =>
          assert(cpCompare(hi, s) > 0, s"upper bound must exceed the original")
          assert(hi.codePoints().count() <= cap)
        case None => // all-ceiling prefix: dropping the stat is the contract
          assert(s.codePoints().toArray.take(cap).forall(_ == 0x10FFFF))
      }
    }
    // short strings pass through exact
    assert(truncateUpper("short", cap).contains("short"))
    assert(truncateLower("short", cap) == "short")
  }

  test("long-string stats: manifest stays bounded, pruning still correct") {
    import spark.implicits._
    val dir = tmpDir("lake-longstat")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    // three batches whose source values share a 100-char prefix — longer
    // than the stat cap, so truncated ranges OVERLAP and must not prune
    val prefix = "p" * 100
    Seq("alpha", "beta", "gamma").zipWithIndex.foreach { case (sfx, c) =>
      val batch = spark.range(c * 10L, (c + 1) * 10L).map { i =>
        (s"d$i", i, Seq(i.toInt), 1, prefix + sfx)
      }.toDF("doc_id", "lsn", "tokens", "n_tok", "source")
        .withColumn("op", lit("U"))
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
    }
    // manifest entries bounded: no stat string longer than the cap
    val cap = LakeTable.StatTruncateChars
    table.liveFiles().foreach { f =>
      (f.colMin.values ++ f.colMax.values).foreach(v =>
        assert(v.codePoints().count() <= cap, s"unbounded stat: ${v.length} chars"))
    }
    // equality on a full long value: truncated ranges of ALL batches
    // admit the shared prefix — nothing prunes, results stay IDENTICAL
    val full = table.changesBetween(-1L, table.currentSnapshotId)
      .filter(col("source") === (prefix + "beta"))
    assert(full.count() == 10)
    // and a DISJOINT long value (different first char) still prunes all
    val none = table.changesBetween(-1L, table.currentSnapshotId)
      .filter(col("source") === ("z" * 100))
    assert(none.count() == 0)
  }

  test("manifest column stats skip files: source-restricted reads open only matching files") {
    import spark.implicits._
    val dir = tmpDir("lake-skip")
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 2)
    // three feeds, one source value per batch (the realistic CDC layout:
    // a batch comes from ONE upstream feed) — per-file source stats are
    // then tight single-value ranges
    Seq("alpha", "beta", "gamma").zipWithIndex.foreach { case (src, c) =>
      val batch = spark.range(c * 100L, (c + 1) * 100L).map { i =>
        (s"d$i", i, Seq(i.toInt), 1, src)
      }.toDF("doc_id", "lsn", "tokens", "n_tok", "source")
        .withColumn("op", lit("U"))
      CdcIngest.applyBatch(table, batch, epochId = c.toLong)
    }
    val allFiles = table.liveFiles().size
    assert(allFiles == 6, s"expected 2 buckets x 3 batches, got $allFiles")
    // every live file carries a source stat range in the manifest
    assert(table.liveFiles().forall(f =>
      f.colMin.contains("source") && f.colMax.contains("source")))

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case other => Seq(other)
      }
      val scans = unwrap(df.queryExecution.executedPlan).flatMap(_.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      })
      assert(scans.nonEmpty, "no file scan in plan")
      scans.map(_.metrics("numFiles").value).sum
    }

    // changelog read restricted to one source: the filter pushes to the
    // scan and the manifest prunes to that batch's files — 2 of 6
    val head = table.currentSnapshotId
    val restricted = table.changesBetween(-1L, head).filter(col("source") === "beta")
    assert(restricted.count() == 100L)
    assert(scannedFiles(restricted) == 2L,
      "source-restricted changelog did not skip non-matching files")
    // an unrestricted read still opens everything (pruning is conservative)
    assert(scannedFiles(table.changesBetween(-1L, head)) == 6L)
    // range predicates prune on the integral lsn stats too
    val lsnRestricted = table.changesBetween(-1L, head)
      .filter(col(LakeTable.LsnCol) >= 200L)
    assert(scannedFiles(lsnRestricted) == 2L)
    // IN-set predicates prune to the union of matching batches
    val inSet = table.changesBetween(-1L, head)
      .filter(col("source").isin("alpha", "gamma"))
    assert(inSet.count() == 200L && scannedFiles(inSet) == 4L)

    // results are IDENTICAL with skipping defeated (correctness guard)
    val unpruned = table.changesBetween(-1L, head)
      .filter(col("source") === "beta").collect().toSet
    assert(restricted.collect().toSet == unpruned)
  }

  test("float-column manifest stats prune files; NaN ranges and float literals stay exact") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = tmpDir("lake-fskip")
    val schema = StructType(Seq(
      StructField("doc_id", StringType, nullable = false),
      StructField("quality", DoubleType, nullable = true),
      StructField("score", FloatType, nullable = true)))
    val table = LakeTable.create(spark, s"$dir/t", schema, numBuckets = 2)
    // batches 0..2: disjoint quality ranges [c, c+0.99]; batch 3 is
    // NaN-polluted (parquet's Math.min/max fold makes its min/max NaN)
    def batchFor(c: Int) = {
      val base = spark.range(c * 100L, (c + 1) * 100L).toDF("id")
      val quality =
        if (c == 3) when(col("id") % 2 === 0, lit(Double.NaN))
          .otherwise(lit(0.5d))
        else lit(c.toDouble) + (col("id") % 100).cast("double") / 100.0
      base.select(
        lit("I").as("op"), concat(lit("d"), col("id")).as("doc_id"),
        col("id").as("lsn"), quality.as("quality"),
        quality.cast("float").as("score"))
    }
    (0 to 3).foreach(c => table.upsert(batchFor(c), epochId = c.toLong))
    // in-memory twin: same rows, same Spark predicate semantics, no lake
    // — the oracle for every count below (NaN comparison semantics are
    // Spark's business, not this test's). Deliberately NOT .cache()d:
    // InMemoryTableScan's batch-stat pruning drops NaN rows under range
    // predicates (measured: 50 uncached vs 0 cached on this very shape) —
    // the exact NaN-poisoned-stat trap the manifest's drop-the-stat
    // policy exists to avoid.
    val twin = (0 to 3).map(batchFor).reduce(_ unionAll _)
    assert(table.liveFiles().size == 8)
    // non-NaN batches carry both float stats; the NaN batch carries none
    // for the polluted columns (unknown range must never prune)
    val nanFiles = table.liveFiles().filter(_.minLsn >= 300L)
    assert(nanFiles.nonEmpty && nanFiles.forall(f =>
      !f.colMin.contains("quality") && !f.colMin.contains("score")))
    assert(table.liveFiles().filter(_.maxLsn < 300L).forall(f =>
      f.colMin.contains("quality") && f.colMin.contains("score")))

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      unwrap(df.queryExecution.executedPlan).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val head = table.currentSnapshotId
    def changes = table.changesBetween(-1L, head)

    // a double range predicate prunes to batch 2's files + the NaN files
    // (whatever Spark's NaN ordering says, the NaN files' range is
    // unknown and must scan; batches 0/1 skip on their tight stats)
    val hi = changes.filter(col("quality") >= 2.0d)
    assert(hi.count() == twin.filter(col("quality") >= 2.0d).count())
    assert(scannedFiles(hi) == 4L, "expected batch-2 + NaN files only")
    // a float EQUALITY probe on a value the corpus holds keeps the
    // holding file (double-widened stat strings — Float.toString parsed
    // as double would prune the true match away)
    val eq = changes.filter(col("score") === lit(0.25f))
    assert(eq.count() == twin.filter(col("score") === lit(0.25f)).count()
      && eq.count() >= 1L)
    assert(scannedFiles(eq) == 4L, "expected batch-0 + NaN files")
    // a non-representable probe value still prunes everything but the
    // unknown-range NaN files
    val none = changes.filter(col("quality") > 100.0d)
    assert(none.count() == twin.filter(col("quality") > 100.0d).count())
    assert(scannedFiles(none) == 2L, "expected only the NaN files to scan")
    // correctness guard: identical row sets with skipping defeated (the
    // twin is an unpruned in-memory frame under the same predicates)
    assert(hi.select("doc_id").collect().map(_.getString(0)).toSet ==
      twin.filter(col("quality") >= 2.0d)
        .select("doc_id").collect().map(_.getString(0)).toSet)
  }
}
