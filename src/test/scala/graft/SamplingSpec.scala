package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, TermStats}

/** Behavioral pins for the seeded-sampling and term-statistics layer —
  * the invariants the DuckDB oracle can't see (nesting, stability across
  * runs and k, partition of the input).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()

  test("hexThreshold edge cases and monotonicity") {
    assert(Sampling.hexThreshold(0.0) == "000000000000")
    assert(Sampling.hexThreshold(-1.0) == "000000000000")
    assert(Sampling.hexThreshold(1.0) == "g")
    assert(Sampling.hexThreshold(2.0) == "g")
    assert(Sampling.hexThreshold(0.25) == "400000000000")
    val ps = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
    val ts = ps.map(Sampling.hexThreshold)
    assert(ts == ts.sorted, "threshold must be monotone in p")
  }

  test("bernoulli: p=1 keeps all, p=0 keeps none, deterministic, nested in p") {
    val n = docs.count()
    assert(Sampling.bernoulli(docs, $"doc_id", 1.0, "s").count() == n)
    assert(Sampling.bernoulli(docs, $"doc_id", 0.0, "s").count() == 0)
    val a = Sampling.bernoulli(docs, $"doc_id", 0.25, "s").select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.bernoulli(docs, $"doc_id", 0.25, "s").select("doc_id")
      .as[Long].collect().toSet
    assert(a == b, "same (seed, p) must select the same rows")
    // threshold sampling gives NESTED samples: raising p only adds rows —
    // the property that lets a pipeline grow a sample without resampling
    val wider = Sampling.bernoulli(docs, $"doc_id", 0.5, "s").select("doc_id")
      .as[Long].collect().toSet
    assert(a.subsetOf(wider))
    // and a different seed draws a genuinely different set
    val other = Sampling.bernoulli(docs, $"doc_id", 0.25, "t").select("doc_id")
      .as[Long].collect().toSet
    assert(a != other)
  }

  test("bernoulli: null keys draw deterministically instead of vanishing") {
    val withNull = Seq(Some(1L), Some(2L), None).toDF("k")
    assert(Sampling.bernoulli(withNull, $"k", 1.0, "n").count() == 3,
      "p=1 must keep ALL rows, null keys included")
    assert(Sampling.bernoulli(withNull, $"k", 0.0, "n").count() == 0)
    // the null class is stable across runs
    val a = Sampling.bernoulli(withNull, $"k", 0.5, "n").count()
    val b = Sampling.bernoulli(withNull, $"k", 0.5, "n").count()
    assert(a == b)
  }

  test("bernoulli: rate is approximately honored") {
    val n = docs.count().toDouble
    val kept = Sampling.bernoulli(docs, $"doc_id", 0.25, "rate").count().toDouble
    // 500 draws at p=0.25: ±5 sigma ≈ ±0.097
    assert(math.abs(kept / n - 0.25) < 0.1, s"kept ${kept / n}")
  }

  test("stratified equals per-stratum bernoulli") {
    val rates = Map("src0" -> 0.9, "src1" -> 0.3)
    val strat = Sampling.stratified(docs, $"doc_id", $"source", rates, 0.1, "s63")
      .select("doc_id").as[Long].collect().toSet
    val manual = (rates.toSeq :+ ("", 0.1)).flatMap { case (s, p) =>
      val part = if (s.isEmpty) docs.filter(!$"source".isin(rates.keys.toSeq: _*))
                 else docs.filter($"source" === s)
      Sampling.bernoulli(part, $"doc_id", p, "s63").select("doc_id").as[Long].collect()
    }.toSet
    assert(strat == manual)
  }

  test("exactK: exact size, deterministic, nested in k, ceiling at N") {
    val k50 = Sampling.exactK(docs, $"doc_id", 50, "k").select("doc_id")
      .as[Long].collect().toSet
    assert(k50.size == 50)
    val k100 = Sampling.exactK(docs, $"doc_id", 100, "k").select("doc_id")
      .as[Long].collect().toSet
    assert(k100.size == 100)
    assert(k50.subsetOf(k100), "growing k must only add rows")
    val n = docs.count().toInt
    assert(Sampling.exactK(docs, $"doc_id", n + 10, "k").count() == n)
    assert(Sampling.exactK(docs, $"doc_id", 0, "k").count() == 0)
  }

  test("weightBudgetPerStratum: per-stratum weight stays within budget, nested in budget") {
    val b3k = Sampling.weightBudgetPerStratum(docs, $"doc_id", $"source",
      $"n_chars", 3000L, "wb")
    val perSource = b3k.groupBy("source").agg(sum("n_chars").as("w"))
      .as[(String, Long)].collect().toMap
    assert(perSource.nonEmpty && perSource.values.forall(_ <= 3000L))
    // nested: a larger budget keeps a superset
    val ids3k = b3k.select("doc_id").as[Long].collect().toSet
    val ids6k = Sampling.weightBudgetPerStratum(docs, $"doc_id", $"source",
      $"n_chars", 6000L, "wb").select("doc_id").as[Long].collect().toSet
    assert(ids3k.subsetOf(ids6k) && ids6k.size > ids3k.size)
    // zero budget keeps nothing; a budget above the corpus keeps all
    assert(Sampling.weightBudgetPerStratum(docs, $"doc_id", $"source",
      $"n_chars", 0L, "wb").count() == 0)
    assert(Sampling.weightBudgetPerStratum(docs, $"doc_id", $"source",
      $"n_chars", Long.MaxValue / 2, "wb").count() == docs.count())
  }

  test("assignSplits: labels partition the input; assignment is stable under corpus growth") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labelled = Sampling.assignSplits(docs, $"doc_id", splits, "s64").cache()
    assert(labelled.count() == docs.count())
    val counts = labelled.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == docs.count())
    // rough proportions at n=500 (±5 sigma on p=0.8 is ±0.09)
    assert(math.abs(counts("train").toDouble / docs.count() - 0.8) < 0.1)
    // STABILITY: a doc's split must not change when the corpus shrinks or
    // grows — label the first half alone and compare
    val half = docs.filter($"doc_id" < 250)
    val sub = Sampling.assignSplits(half, $"doc_id", splits, "s64")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = labelled.filter($"doc_id" < 250)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(sub == full)
    labelled.unpersist()
  }

  test("splitThresholds: one cut per split except the last, monotone") {
    val cuts = Sampling.splitThresholds(Seq("a" -> 1.0, "b" -> 1.0, "c" -> 2.0))
    assert(cuts.length == 2)
    assert(cuts == cuts.sorted)
    assertThrows[IllegalArgumentException](Sampling.splitThresholds(Nil))
    assertThrows[IllegalArgumentException](
      Sampling.splitThresholds(Seq("a" -> 0.0)))
  }

  test("exactKPerStratum: exactly k per stratum, nested in k") {
    val per = Sampling.exactKPerStratum(docs, $"doc_id", $"source", 20, "ks")
    val counts = per.groupBy("source").count().as[(String, Long)].collect().toMap
    val nSources = docs.select("source").distinct().count()
    assert(counts.size == nSources && counts.values.forall(_ == 20L))
    val k10 = Sampling.exactKPerStratum(docs, $"doc_id", $"source", 10, "ks")
      .select("doc_id").as[Long].collect().toSet
    val k20 = per.select("doc_id").as[Long].collect().toSet
    assert(k10.subsetOf(k20))
    // k above the stratum size returns the whole stratum
    val all = Sampling.exactKPerStratum(docs, $"doc_id", $"source", 10000, "ks")
    assert(all.count() == docs.count())
  }

  test("sampling ops are streaming-safe: stateless narrow filters, stream == batch") {
    val dir = tmpDir("sampstream")
    docs.limit(200).repartition(4).write.parquet(s"$dir/feed")
    val splits = Seq("train" -> 0.8, "val" -> 0.2)
    // distinct seeds: a shared seed correlates the draws and leaves the
    // 'val' branch unreachable (all bernoulli(0.5) survivors sit below
    // the 0.8 cut) — the equality below must compare BOTH branches
    def curate(df: org.apache.spark.sql.DataFrame) =
      Sampling.assignSplits(
        Sampling.bernoulli(df, col("doc_id"), 0.5, "ss"),
        col("doc_id"), splits, "ss2")
        .select(col("doc_id"), col("split"))
    val q = curate(spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/feed"))
      .writeStream.format("memory").queryName("samp_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("samp_out").as[(Long, String)].collect().toMap
    val batch = curate(spark.read.parquet(s"$dir/feed")).as[(Long, String)]
      .collect().toMap
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("VectorOps: normalized vectors have unit norm; zero vector nulls out") {
    import graft.operators.VectorOps
    graft.functions.VectorExprs.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val norms = emb.select(
      VectorOps.l2Norm(VectorOps.l2Normalize(col("embedding"))).as("n"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
    val zero = Seq(Seq(0f, 0f, 0f)).toDF("embedding")
    val z = zero.select(VectorOps.l2Normalize(col("embedding")).as("v"))
      .as[Seq[Option[Double]]].head()
    assert(z.forall(_.isEmpty), "zero vector must normalize to nulls, not NaN")
    // meanPool of a single-group corpus of identical vectors is the vector
    val same = Seq((1, Seq(0.5f, -0.25f)), (1, Seq(0.5f, -0.25f)))
      .toDF("label", "embedding")
    val pooled = VectorOps.meanPool(same, "label")
      .orderBy("pos").select("mean").as[Double].collect()
    assert(pooled.toSeq == Seq(0.5, -0.25))
  }

  test("docFreq: hand-computed on a 3-doc corpus") {
    val tiny = Seq(
      (1L, "a b a"),
      (2L, "a c"),
      (3L, "c c c")).toDF("doc_id", "text")
    val df = TermStats.docFreq(tiny).as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(df == Map("a" -> (2L, 3L), "b" -> (1L, 1L), "c" -> (2L, 4L)))
  }

  test("repetitionRatio: looping text scores near 1, varied text near 0") {
    val tiny = Seq(
      (1L, "ababababababababababababababababababababab"),
      (2L, "the quick brown fox jumps over one lazy dog now")).toDF("doc_id", "text")
    val r = TermStats.repetitionRatio(tiny)
      .select("doc_id", "repetition").as[(Long, Double)].collect().toMap
    assert(r(1L) > 0.9, s"pure loop scored ${r(1L)}")
    assert(r(2L) == 0.0, s"all-distinct shingles scored ${r(2L)}")
  }

  test("redact: emails and URLs scrub to placeholders, clean text untouched") {
    import graft.functions.TextOps
    val rows = Seq(
      (1L, "contact bob.smith+x@example.co.uk today"),
      (2L, "see https://example.com/a?b=1 and http://t.co/x now"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = rows.select($"doc_id", TextOps.redact($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "contact <EMAIL> today")
    assert(out(2L) == "see <URL> and <URL> now")
    assert(out(3L) == "no pii here at all")
    val (em, ur) = TextOps.piiCounts($"text")
    val counts = rows.select($"doc_id", em.as("e"), ur.as("u"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(counts == Map(1L -> (1, 0), 2L -> (0, 2), 3L -> (0, 0)))
  }

  test("topTerms: at most k per doc, rare terms outrank common ones") {
    val tiny = Seq(
      (1L, "common rare common"),
      (2L, "common other"),
      (3L, "common common")).toDF("doc_id", "text")
    val top = TermStats.topTerms(tiny, k = 1)
      .select("doc_id", "word").as[(Long, String)].collect().toMap
    // every doc contains 'common' (df=3); its rarer companion must win
    assert(top == Map(1L -> "rare", 2L -> "other", 3L -> "common"))
    val k2 = TermStats.topTerms(docs.limit(50), k = 2)
    val perDoc = k2.groupBy("doc_id").count().agg(max("count")).head.getLong(0)
    assert(perDoc <= 2)
    // rank column is 1-based and dense within a doc
    assert(k2.filter($"rank" < 1 || $"rank" > 2).count() == 0)
  }

  test("hexThreshold clamps at the 12-hex ceiling (p one ulp below 1.0)") {
    // floor(nextDown(1.0) * 16^12) rounds UP to 16^12 — unclamped it
    // formats as the 13-char "1000000000000", which sorts BELOW most
    // 12-char draws and silently keeps ~1/16 of rows instead of ~all
    val t = Sampling.hexThreshold(math.nextDown(1.0))
    assert(t == "f" * 12, s"got $t")
    assert(Sampling.hexThreshold(1.0) == "g") // keep-all sentinel intact
  }

  test("exactK above the top-k threshold: refine pass sorts ~k rows, identical result") {
    val n = 200000L
    val k = 50000 // > topKSortFallbackThreshold (10 000 default)
    val df = spark.range(n).select(concat(lit("k"), col("id")).as("key"), col("id"))
    val got = Sampling.exactK(df, col("key"), k, "s1")
    // row-for-row identical to the single-pass definition
    val naive = df.withColumn("_r", Sampling.draw("s1", col("key")))
      .orderBy(col("_r"), col("key")).limit(k).drop("_r")
    assert(got.count() == k)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // the sorted set is the thresholded survivor frame (~k rows), not the
    // corpus: the executed plan's sort sits ABOVE the md5 pre-filter
    got.collect()
    // AQE wraps finished stages in leaf QueryStageExec nodes — flatten
    // through them to see the whole physical tree
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val nodes = flatten(got.queryExecution.executedPlan)
    // either ordering operator is fine — what matters is what FEEDS it
    assert(nodes.exists(p =>
      p.isInstanceOf[org.apache.spark.sql.execution.SortExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "expected an ordering operator in the large-k plan")
    // the ordering consumes the CHECKPOINTED survivor frame (~k rows),
    // never the corpus: every leaf the final plan scans is the
    // materialised survivor RDD, bounded by the survivor count
    val p = math.min(1.0, (k + 6.0 * math.sqrt(k.toDouble) + 16.0) / n)
    val c = df.filter(Sampling.draw("s1", col("key")) <
      lit(Sampling.hexThreshold(p))).count()
    assert(c >= k && c < n / 2, s"survivors $c")
    val leaves = nodes.filter(_.children.isEmpty).collect {
      case l: org.apache.spark.sql.execution.RDDScanExec => l
    }
    assert(leaves.nonEmpty,
      "expected the checkpointed survivor scan at the plan leaf")
    assert(leaves.map(_.metrics("numOutputRows").value).max <= c,
      "the ordering consumed more rows than the survivor set")
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.RangeExec]),
      "the final plan still scans the full corpus")
    // k beyond N short-circuits to the whole frame
    assert(Sampling.exactKLarge(df.limit(100), col("key"), k, "s1").count() == 100)
  }
}
