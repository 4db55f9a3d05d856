package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, MatView}
import graft.model.Schemas
import graft.stream.CdcIngest

/** Derived-view scale smoke: replay SPARK_GRAFT_EVENTS (default 12M)
  * events chunk by chunk with BOTH view families attached and folded per
  * chunk — a per-source aggregate MatView (decomposable + recompute
  * aggs) — then verify the final view EXACTLY equals the from-scratch
  * groupBy over the merged table: cnt, sum, min, max per group, at
  * 3 orders of magnitude beyond the sbt-test sizes. Prints one JSON
  * line with the replay throughput and the verification verdict.
  */
object ViewSmoke {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_EVENTS", "12000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val chunks = sys.env.getOrElse("SPARK_GRAFT_CHUNKS", "8").toInt
    val tmpfs = sys.env.get("SPARK_GRAFT_TMPFS").contains("1")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (tmpfs) b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = graft.feed.FeedConfig(seed = 42L, numEvents = nEvents,
      numDocs = math.max(1000L, nEvents / 10), deletePct = 5, maxTokens = 64)
    val root = (if (tmpfs) Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft-viewsmoke")
      else Files.createTempDirectory("graft-viewsmoke")).toString
    // mode "sums" = decomposable-only (changed-key cost — the right
    // config for few giant groups); "recompute" adds min/max (affected-
    // group recompute — here 3 giant groups, i.e. the documented
    // full-re-agg-per-fold worst case, kept measurable on purpose);
    // "join" = two independently-replayed tables assembled by a JoinView
    // folded per chunk, verified against the fresh join
    val mode = sys.env.getOrElse("SPARK_GRAFT_VIEW_MODE", "sums")
    val preimages = sys.env.get("SPARK_GRAFT_PREIMAGES").contains("1")
    if (mode == "join") { joinSmoke(spark, cfg, root, chunks); return }
    val table = LakeTable.create(spark, s"$root/t", Schemas.docRow, numBuckets = 32)
    // "distinct" = count-distinct via the decomposable paths (key-col →
    // cnt alias; non-key → internal stacked views, gate forced OPEN so
    // the stack is what gets measured); "distinct_legacy" computes the
    // SAME values through parser-defeating expressions, so maintenance
    // runs the legacy affected-group recompute — the A/B that sets
    // MatView.StackMinBaseRows (measured: legacy wins at ≤4 M rows,
    // the stack's O(changed keys) wins once group re-agg outgrows the
    // two extra per-fold commits)
    if (mode == "distinct") MatView.StackMinBaseRows = 0L
    val view = MatView.create(spark, s"$root/v", table, Seq("source"),
      sums = Seq("sum_ntok" -> "n_tok"),
      recomputed = mode match {
        case "recompute" =>
          Seq("min_ntok" -> "min(n_tok)", "max_ntok" -> "max(n_tok)")
        case "distinct" =>
          Seq("nd_docs" -> "count(distinct doc_id)",
            "nd_tok" -> "count(distinct n_tok)")
        case "distinct_legacy" =>
          Seq("nd_docs" -> "count(distinct concat(doc_id))",
            "nd_tok" -> "count(distinct n_tok + 0)")
        case _ => Seq.empty
      })
    // nViews > 1 attaches extra aggregate views over the same captured
    // columns — the amortization case: ONE capture scan at ingest serves
    // every view's fold
    val nViews = sys.env.getOrElse("SPARK_GRAFT_NVIEWS", "1").toInt
    val extraViews = (1 until nViews).map(i =>
      MatView.create(spark, s"$root/v$i", table, Seq("n_tok"),
        sums = Seq("cnt_src" -> s"length(source) + $i")))
    val allViews = view +: extraViews
    val per = (nEvents + chunks - 1) / chunks
    val t0 = System.nanoTime()
    var c = 0
    while (c * per < nEvents) {
      val lo = c * per
      val hi = math.min(nEvents, lo + per)
      val batch = spark.range(lo, hi)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(cfg, i))).toDF()
      CdcIngest.applyBatch(table, batch, epochId = c.toLong,
        capturePreimages = preimages,
        preimageColumns = Seq("source", "n_tok"))
      allViews.foreach(_.catchUpAll())
      c += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9

    // tail phase: small batches against the big table — the realistic
    // continuous-ingest shape, where a fold's changed-key side is tiny
    // and the per-fold price is dominated by the (column-pruned)
    // before-image merge over the full table
    val tailSize = sys.env.getOrElse("SPARK_GRAFT_TAIL", "20000").toLong
    val tailBatches = 8
    // maintenance cadence (CdcIngest.run's maintainEvery policy): fold
    // attached views every K tail batches instead of every batch — the
    // per-maintain floor amortizes K× and each fold covers a K-batch
    // range in ONE maintain (multi-snapshot before-images), at a bounded
    // staleness of K−1 batches. The trailing catchUp (cadence remainder)
    // is timed too: the amortization claim covers TOTAL work, not just
    // the batches that skipped their fold.
    val maintainEvery = sys.env.getOrElse("SPARK_GRAFT_MAINTAIN_EVERY", "1").toInt
    val t1 = System.nanoTime()
    (0 until tailBatches).foreach { i =>
      val lo = nEvents + i * tailSize
      val batch = spark.range(lo, lo + tailSize)
        .mapPartitions(_.map(j => graft.feed.EventGen.event(cfg, j))).toDF()
      CdcIngest.applyBatch(table, batch, epochId = c.toLong + i,
        capturePreimages = preimages,
        preimageColumns = Seq("source", "n_tok"))
      if ((i + 1) % maintainEvery == 0) allViews.foreach(_.catchUpAll())
    }
    if (tailBatches % maintainEvery != 0) allViews.foreach(_.catchUpAll())
    val tailSec = (System.nanoTime() - t1) / 1e9

    val recAggs =
      if (mode == "recompute")
        Seq(min(col("n_tok")).as("min_ntok"), max(col("n_tok")).as("max_ntok"))
      else if (mode.startsWith("distinct"))
        Seq(count_distinct(col("doc_id")).as("nd_docs"),
          count_distinct(col("n_tok")).as("nd_tok"))
      else Seq.empty
    val aggs = count(lit(1)).as("cnt") +:
      (sum(coalesce(col("n_tok").cast("long"), lit(0L))).as("sum_ntok") +: recAggs)
    val want = table.read().groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(_.toString).sorted.toSeq
    val outCols = Seq("source", "cnt", "sum_ntok") ++
      (if (mode == "recompute") Seq("min_ntok", "max_ntok")
      else if (mode.startsWith("distinct")) Seq("nd_docs", "nd_tok")
      else Seq.empty)
    val got = view.read()
      .select(outCols.map(col): _*)
      .collect().map(_.toString).sorted.toSeq
    val ok = want == got
    println(s"""{"metric":"view_smoke","mode":"$mode","preimages":$preimages,"views":$nViews,"events":$nEvents,""" +
      s""""chunks":$chunks,"events_per_sec":${(nEvents / sec).toLong},""" +
      s""""tail_batch":$tailSize,"maintain_every":$maintainEvery,""" +
      s""""tail_sec_per_fold":${"%.2f".format(tailSec / tailBatches)},""" +
      s""""groups":${got.size},"exact_match":$ok}""")
    CdcBenchCleanup.delete(root)
    if (!ok) {
      System.err.println(s"view:\n${got.mkString("\n")}\nrecompute:\n${want.mkString("\n")}")
      sys.exit(1)
    }
    spark.stop()
  }

  /** Two tables from one feed (even/odd lsn split), each replayed chunk
    * by chunk with a [[graft.lake.JoinView]] catching up after every
    * pair of commits; final view checked EXACTLY against the fresh
    * left join of both merged states.
    */
  private def joinSmoke(spark: SparkSession, cfg: graft.feed.FeedConfig,
                        root: String, chunks: Int): Unit = {
    import spark.implicits._
    import graft.lake.JoinView
    val nEvents = cfg.numEvents
    val docs = LakeTable.create(spark, s"$root/d", Schemas.docRow, numBuckets = 32)
    val scoreSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("quality",
        org.apache.spark.sql.types.IntegerType, nullable = true)))
    val scores = LakeTable.create(spark, s"$root/s", scoreSchema, numBuckets = 32)
    var view: JoinView = null
    val per = (nEvents + chunks - 1) / chunks
    val t0 = System.nanoTime()
    var c = 0
    while (c * per < nEvents) {
      val lo = c * per
      val hi = math.min(nEvents, lo + per)
      val batch = spark.range(lo, hi)
        .mapPartitions(_.map(i => graft.feed.EventGen.event(cfg, i))).toDF()
        .localCheckpoint() // both splits read it; one generator pass
      CdcIngest.applyBatch(docs, batch.filter(col("lsn") % 2 === 0), epochId = c.toLong)
      CdcIngest.applyBatch(scores,
        batch.filter(col("lsn") % 2 === 1).select(col("op"), col("doc_id"),
          col("lsn"), col("n_tok").as("quality")), epochId = c.toLong)
      if (view == null) view = JoinView.create(spark, s"$root/v", docs, scores)
      view.catchUpAll()
      batch.unpersist()
      c += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // tail: small paired batches against the bulk-built tables — the
    // incremental case the per-chunk bulk phase (all keys touched every
    // fold) deliberately does not show
    val tailSize = sys.env.getOrElse("SPARK_GRAFT_TAIL", "20000").toLong
    val tailBatches = 8
    val t1 = System.nanoTime()
    (0 until tailBatches).foreach { i =>
      val lo = nEvents + i * tailSize
      val batch = spark.range(lo, lo + tailSize)
        .mapPartitions(_.map(j => graft.feed.EventGen.event(cfg, j))).toDF()
        .localCheckpoint()
      CdcIngest.applyBatch(docs, batch.filter(col("lsn") % 2 === 0),
        epochId = c.toLong + i)
      CdcIngest.applyBatch(scores,
        batch.filter(col("lsn") % 2 === 1).select(col("op"), col("doc_id"),
          col("lsn"), col("n_tok").as("quality")), epochId = c.toLong + i)
      view.catchUpAll()
      batch.unpersist()
    }
    val tailSec = (System.nanoTime() - t1) / 1e9
    val want = docs.read().join(scores.read(), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"), col("source"), col("quality"))
      .collect().map(_.toString).sorted.toSeq
    val got = view.read()
      .select(col("doc_id"), col("n_tok"), col("source"), col("quality"))
      .collect().map(_.toString).sorted.toSeq
    val ok = want == got
    println(s"""{"metric":"view_smoke","mode":"join","events":$nEvents,""" +
      s""""chunks":$chunks,"events_per_sec":${(nEvents / sec).toLong},""" +
      s""""tail_batch":$tailSize,"tail_sec_per_fold":${"%.2f".format(tailSec / tailBatches)},""" +
      s""""rows":${got.size},"exact_match":$ok}""")
    CdcBenchCleanup.delete(root)
    if (!ok) sys.exit(1)
    spark.stop()
  }
}

private object CdcBenchCleanup {
  def delete(root: String): Unit =
    graft.CdcBench.deleteRecursively(java.nio.file.Paths.get(root))
}
