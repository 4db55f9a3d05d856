package graft.feed

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.ChangeEvent

/** Distributed materialisation of the synthetic WAL.
  *
  * `spark.range` splits the [0, n) counter across executors with no shuffle;
  * each event is a pure function of its index (see [[EventGen]]), so the
  * generator itself scales linearly — at 10^10 events nothing is ever
  * collected or ordered globally. This plays the role of the reference's
  * bounded-buffer streaming parse (/root/reference/grafter.io/src/
  * grafter_2/rdf4j/io.clj:649-678): the producer side of a change feed.
  */
object ChangeFeed {

  def events(spark: SparkSession, cfg: FeedConfig): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.range(0L, cfg.numEvents).mapPartitions { it =>
      it.map(i => EventGen.event(cfg, i))
    }
  }

  /** Events with duplicate deliveries mixed in: every event whose hash falls
    * under `dupPct`% is delivered twice (the dedup fixture — mirrors the
    * reference's exact batch-split tests,
    * grafter.io/test/grafter_2/rdf/batching_test.clj:47-62).
    * The duplicate is byte-identical (same doc_id, lsn, payload).
    */
  def eventsWithDuplicates(spark: SparkSession, cfg: FeedConfig, dupPct: Int): Dataset[ChangeEvent] = {
    import spark.implicits._
    val base = events(spark, cfg)
    val dups = base.filter { e =>
      java.lang.Long.remainderUnsigned(EventGen.mix64(cfg.seed ^ e.lsn ^ 0x7F4A7C15L), 100L) < dupPct
    }
    base.union(dups)
  }

  /** Write the feed to `dir` as `chunks` sequential parquet files — the
    * on-disk WAL segment layout a file-based Structured Streaming source
    * tails (LSN-ordered segment files; `maxFilesPerTrigger` gives the
    * bounded-buffer backpressure of io.clj:649-650).
    * Within a chunk rows are hash-scattered across the write tasks, so
    * micro-batches see out-of-LSN-order rows — LWW must not care.
    */
  def writeFeed(spark: SparkSession, cfg: FeedConfig, dir: String,
                chunks: Int, dupPct: Int = 0): Unit = {
    val n = cfg.numEvents
    val per = math.max(1L, (n + chunks - 1) / chunks)
    var c = 0
    while (c * per < n) {
      val lo = c * per
      val hi = math.min(n, lo + per)
      val chunkCfg = cfg
      val ds = {
        import spark.implicits._
        val base = spark.range(lo, hi).mapPartitions(_.map(i => EventGen.event(chunkCfg, i)))
        if (dupPct > 0)
          base.union(base.filter { e =>
            java.lang.Long.remainderUnsigned(EventGen.mix64(chunkCfg.seed ^ e.lsn ^ 0x7F4A7C15L), 100L) < dupPct
          })
        else base
      }
      ds.write.mode("append").parquet(dir)
      c += 1
    }
  }
}
