package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, GraphOps, Multimodal, Similarity}
import graft.functions.TextOps

/** Unit specs for the operator library (dedup family, similarity, paths,
  * multimodal plumbing, text ops) — semantics beyond what the DuckDB
  * oracle already pins down.
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
  lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("exact dedup clusters: every doc accounted for, canonical is min id") {
    val clusters = DedupOps.exactClusters(docs, "text", prefixLen = 24)
    assert(clusters.agg(sum("cluster_size")).head.getLong(0) == docs.count())
    // canonical member belongs to its own cluster
    val joined = clusters.join(docs, clusters("canonical_id") === docs("doc_id"))
    assert(joined.count() == clusters.count())
  }

  test("ngram jaccard: identical docs score 1.0, self-pairs excluded") {
    val two = docs.limit(1).select(lit(900L).as("doc_id"), $"text")
      .union(docs.limit(1).select(lit(901L).as("doc_id"), $"text"))
    val sims = DedupOps.ngramJaccard(two, w = 3, maxLen = 40, minJaccard = 0.0).collect()
    assert(sims.length == 1)
    assert(sims(0).getAs[Double]("jaccard") == 1.0)
    assert(sims(0).getAs[Long]("id1") < sims(0).getAs[Long]("id2"))
  }

  test("minhash LSH: exact duplicates are always candidates (band containment)") {
    val dup = docs.limit(5).select(($"doc_id" + 1000).as("doc_id"), $"text")
    val withDups = docs.limit(5).select($"doc_id", $"text").union(dup)
    val cands = DedupOps.minhashLshCandidates(withDups, 3, 40, k = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 5).foreach { i =>
      val id = docs.limit(5).collect()(i).getAs[Long]("doc_id")
      assert(cands.contains((id, id + 1000)), s"dup pair for $id not found")
    }
  }

  test("simhash: identical docs get identical hashes; hash is 16-bit") {
    val sh = DedupOps.simhash16(docs.limit(20), maxLen = 64).collect()
    assert(sh.forall { r =>
      val h = r.getAs[Int]("simhash"); h >= 0 && h < 65536
    })
    val dup = docs.limit(3).select(($"doc_id" + 500).as("doc_id"), $"text")
    // identical text → identical simhash (pure function of content)
    val a = DedupOps.simhash16(docs.limit(3), 64).orderBy("doc_id").collect().map(_.getInt(1))
    val b = DedupOps.simhash16(dup.select($"doc_id", $"text"), 64).orderBy("doc_id").collect().map(_.getInt(1))
    assert(a.sameElements(b))
  }

  test("LSH ANN recall vs brute force is reasonable and buckets partition the corpus") {
    val exact = Similarity.bruteForceTopK(emb, numQueries = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 2 bits = 4 buckets on this 500-vector corpus; Hamming-1 multiprobe
    // (the default) scans 3 of the 4, so the recall floor is strong
    val approx = Similarity.lshTopK(emb, dim = 64, bits = 2, seed = 42L,
      numQueries = 8, k = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH multiprobe recall $recall below floor")
    // single-probe is strictly weaker or equal but must not collapse
    val single = Similarity.lshTopK(emb, dim = 64, bits = 2, seed = 42L,
      numQueries = 8, k = 3, multiprobe = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallSingle = exact.intersect(single).size.toDouble / exact.size
    assert(recallSingle >= 0.2 && recallSingle <= recall)
    // every vector lands in exactly one bucket
    graft.functions.VectorExprs.register(spark)
    val n = emb.count()
    val bucketed = emb.withColumn("b", Similarity.lshBucket(col("embedding"), 64, 4, 42L))
    assert(bucketed.count() == n)
    assert(bucketed.agg(countDistinct("b")).head.getLong(0) <= 16)
  }

  test("simhash64: pure function of content; banding finds exact and near dups") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy cat again and again today"
    val far = "completely unrelated words zebra quantum fourier walrus estimate"
    val d = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("doc_id", "text")
    val sh = DedupOps.simhash64(d, maxLen = 64).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh.values.forall(h => h.length == 16 && h.forall("0123456789abcdef".contains(_))))
    assert(sh(1L) == sh(2L), "identical text must hash identically")
    def bits(h: String): Seq[Int] =
      h.flatMap { c =>
        val v = Integer.parseInt(c.toString, 16)
        Seq(8, 4, 2, 1).map(w => (v / w) % 2)
      }
    def hamming(a: String, b: String): Int =
      bits(a).zip(bits(b)).count { case (x, y) => x != y }
    val dNear = hamming(sh(1L), sh(3L))
    val dFar = hamming(sh(1L), sh(4L))
    assert(dNear < dFar, s"near-dup distance $dNear !< unrelated distance $dFar")
    assert(dNear <= 16, s"one-word edit moved $dNear/64 bits")
    val cands = DedupOps.simhashCandidates(d, maxLen = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)), "exact dup must always be a band candidate")
    assert(cands.contains((1L, 3L)) == (0 until 4).exists(b =>
      sh(1L).substring(b * 4, b * 4 + 4) == sh(3L).substring(b * 4, b * 4 + 4)))
  }

  test("native HammingHex expression == column-tree reference, codegen fires") {
    graft.functions.VectorExprs.register(spark)
    // random 16-hex pairs: native fused loop must equal the 16-term
    // conv/substr column tree (the oracle's twin) on every input
    val pairs = docs.limit(200)
      .select(md5($"text").substr(1, 16).as("a"),
        md5(concat($"text", lit("x"))).substr(1, 16).as("b"))
    val diff = pairs.select(
        graft.functions.VectorExprs.hammingHex(col("a"), col("b")).as("n"),
        graft.operators.DedupOps.hammingHex64(col("a"), col("b")).as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(diff == 0)
    // identical strings → 0; full complement → 64
    val edge = Seq(("0123456789abcdef", "0123456789abcdef"),
      ("0000000000000000", "ffffffffffffffff")).toDF("a", "b")
      .select(graft.functions.VectorExprs.hammingHex(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(edge == Seq(0, 64))
    // whole-stage codegen actually compiles the fused loop
    val df = pairs.select(graft.functions.VectorExprs.hammingHex(col("a"), col("b")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[hamminghex""".r.findFirstIn(plan).isDefined, plan.take(800))
  }

  test("hamming verify: exact distance column; near-dups filtered, randoms dropped") {
    // hammingHex64 against a bit-level Scala reference on fixed values
    val fixtures = Seq(
      ("0000000000000000", "0000000000000000", 0),
      ("0000000000000000", "ffffffffffffffff", 64),
      ("00000000000000ff", "0000000000000000", 8),
      ("123456789abcdef0", "123456789abcdef0", 0),
      ("8000000000000001", "0000000000000000", 2))
    val df = fixtures.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(DedupOps.hammingHex64(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(got.sameElements(fixtures.map(_._3)))
    // end-to-end: identical docs at distance 0 survive; a one-word edit
    // stays within the bound; unrelated text is filtered out even when
    // banding happened to emit it as a candidate
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy cat again and again today"
    val far = "completely unrelated words zebra quantum fourier walrus estimate"
    val d = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("doc_id", "text")
    val verified = DedupOps.simhashNearDups(d, maxLen = 64, maxDist = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(verified((1L, 2L)) == 0, "identical docs must verify at distance 0")
    // every verified pair's distance equals the straight recompute; the
    // maxDist filter is exact over candidates
    val strict = DedupOps.simhashNearDups(d, maxLen = 64, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict.contains((1L, 2L)))
    verified.foreach { case (pair, dist) =>
      assert(strict.contains(pair) == (dist <= 3),
        s"$pair dist $dist vs maxDist-3 filter disagreement")
    }
  }

  test("deep templater: 3-level recursion, chained skolems, round-trip") {
    import graft.operators.Templater
    import graft.operators.Templater._
    val d = docs.limit(10)
    def expand() = Templater.graph(d, col("doc_id"), "g",
      leaves = Seq(Leaf("lang", col("lang"))),
      nodes = Seq(Node("meta", Seq(
        Leaf("n_chars", col("n_chars")),
        Node("head", Seq(
          Leaf("h8", substring(col("text"), 1, 8)),
          Leaf("h4", substring(col("text"), 1, 4))))))))
    val out = expand().cache()
    // 6 statements per row: lang, meta-link, n_chars, head-link, h8, h4
    assert(out.count() == 60)
    // replay determinism at depth (gensym'd bnodes would fail this)
    assert(out.exceptAll(expand()).isEmpty)
    // walk doc --meta--> b1 --head--> b2 --h8--> value and compare with
    // the source rows: the chain must reconstruct exactly
    val l1 = out.filter($"predicate" === "meta").select($"subject".as("doc"), $"object".as("b1"))
    val l2 = out.filter($"predicate" === "head").select($"subject".as("b1"), $"object".as("b2"))
    val l3 = out.filter($"predicate" === "h8").select($"subject".as("b2"), $"object".as("v"))
    val walked = l1.join(l2, "b1").join(l3, "b2").select($"doc", $"v")
    val orig = d.select($"doc_id".cast("string").as("doc"),
      substring($"text", 1, 8).as("v"))
    assert(walked.exceptAll(orig).isEmpty && orig.exceptAll(walked).isEmpty)
    // level-1 and level-2 skolems are disjoint (chained md5, not reused)
    val b1s = l1.select($"b1".as("id")).distinct()
    val b2s = l2.select($"b2".as("id")).distinct()
    assert(b1s.count() == 10 && b2s.count() == 10)
    assert(b1s.intersect(b2s).isEmpty)
  }

  test("ngram gram-frequency cut bounds the join on pathological input") {
    val text = "aaaa bbbb cccc dddd eeee ffff"
    val same = (0 until 10).map(i => (i.toLong, text)).toDF("doc_id", "text")
    // all 10 docs share every gram: ungated = all 45 pairs at jaccard 1.0
    val ungated = DedupOps.ngramJaccard(same, 3, 40, 0.0)
    assert(ungated.count() == 45)
    // cut below the sharing degree drops the universal grams pre-join:
    // the quadratic blowup never happens (0 join rows, not 45×|grams|)
    val gated = DedupOps.ngramJaccard(same, 3, 40, 0.0, maxDocFreq = 5)
    assert(gated.count() == 0)
    // cut above the corpus size is exact — identical to ungated
    val exact = DedupOps.ngramJaccard(same, 3, 40, 0.0, maxDocFreq = 100)
    assert(exact.exceptAll(ungated).isEmpty && ungated.exceptAll(exact).isEmpty)
  }

  test("transitive closure refuses to return a truncated result at the cap") {
    val chain = (0 until 25).map(i => (i, i + 1)).toDF("src", "dst")
    // 25-hop chain needs 24 iterations: the DISTRIBUTED loop's default
    // cap of 20 must THROW, never silently truncate (forced past the
    // small-graph gate — the driver BFS cannot truncate at all)
    val ex = intercept[IllegalStateException] {
      GraphOps.transitiveClosure(chain, maxIters = 20, driverMaxEdges = -1L).count()
    }
    assert(ex.getMessage.contains("did not converge"))
    val full = GraphOps.transitiveClosure(chain, maxIters = 30, driverMaxEdges = -1L)
    assert(full.count() == 25L * 26 / 2) // all (i,j) with i<j over 26 nodes
    // the driver fast path (the small-graph default) needs no iteration
    // cap and lands the identical pair set
    val fast = GraphOps.transitiveClosure(chain, maxIters = 20)
    assert(fast.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      full.collect().map(r => (r.getInt(0), r.getInt(1))).toSet)
  }

  test("IVF ANN: k-means recall floor at nprobe=2; deterministic centroids") {
    val exact = Similarity.bruteForceTopK(emb, numQueries = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, nCells = 4, numQueries = 8, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall below floor at nprobe=2")
    // single-probe is weaker or equal but must not collapse
    val ivf1 = Similarity.ivfTopK(emb, nCells = 4, numQueries = 8, k = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall1 = exact.intersect(ivf1).size.toDouble / exact.size
    assert(recall1 >= 0.2 && recall1 <= recall, s"nprobe=1 recall $recall1")
    // centroid training is replay-deterministic: two runs, bit-identical
    val c1 = Similarity.kmeansCentroids(emb, nCells = 4)
    val c2 = Similarity.kmeansCentroids(emb, nCells = 4)
    assert(c1.exceptAll(c2).isEmpty && c2.exceptAll(c1).isEmpty)
    assert(c1.count() == 4)
    // every vector gets exactly one cell; cells genuinely partition
    val assigned = Similarity.ivfAssign(emb, c1)
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    assert(assigned.select("cell").distinct().count() > 1,
      "k-means collapsed every vector into one cell")

    val nd = Similarity.embedNearDup(emb, maxId = 60, threshold = 0.75).collect()
    nd.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.75)
    }
  }

  test("lshBitsFor holds expected bucket size as N grows; auto near-dup pairs verify exactly") {
    // the bits-vs-N contract: at fixed target, N/2^bits never exceeds the
    // target — per-bucket self-join work stays LINEAR in N
    val target = 1024L
    Seq(1L, 1000L, 100000L, 10000000L, 10000000000L).foreach { n =>
      val bits = Similarity.lshBitsFor(n, target)
      assert(n.toDouble / math.pow(2.0, bits) <= target,
        s"N=$n bits=$bits leaves expected bucket ${n / math.pow(2.0, bits)}")
      assert(bits >= 1)
    }
    // monotone: 2x corpus never needs FEWER planes
    assert(Similarity.lshBitsFor(2048, 16) == Similarity.lshBitsFor(1024, 16) + 1)
    // the auto entry point emits a SUBSET of the exact pairs (precision
    // exact) at the derived bit count
    val n = emb.count()
    val auto = Similarity.lshNearDupPairsAuto(emb, dim = 64, seed = 42L,
      threshold = 0.35, targetBucketSize = n / 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.embedNearDup(emb, maxId = n.toInt, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(exact) && auto.nonEmpty)
  }

  test("sequence packing: exact chunk boundaries, trailing partial, group isolation") {
    import spark.implicits._
    import graft.operators.TokenPack
    // group "a": docs of 3+1 and 4+1 tokens = stream of 9 → seqLen 4 gives
    // chunks [4,4,1]; group "b": one 2+1-token doc → [3]. Sequences never
    // cross groups.
    val docs = Seq(
      ("a", 1L, Seq(10, 11, 12)), ("a", 2L, Seq(20, 21, 22, 23)),
      ("b", 9L, Seq(30, 31))
    ).toDF("source", "doc_id", "tokens")
    val got = TokenPack.packStats(docs, "source", seqLen = 4)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))).toSet
    // stream a: 10 11 12 -1 | 20 21 22 23 | -1 ; stream b: 30 31 -1
    val want = Set(
      ("a", 0L, 4, 10, -1, 10 + 11 + 12 - 1L),
      ("a", 1L, 4, 20, 23, 20 + 21 + 22 + 23L),
      ("a", 2L, 1, -1, -1, -1L),
      ("b", 0L, 3, 30, -1, 30 + 31 - 1L))
    assert(got == want)
    // doc order is doc_id, not input order: permuting input changes nothing
    val got2 = TokenPack.packStats(
      docs.orderBy(col("doc_id").desc), "source", seqLen = 4)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))).toSet
    assert(got2 == want)
  }

  test("contamination: eval copies are flagged, disjoint docs are not") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zzzz entirely different content qqqq xxxx"),
      (3L, "quick brown fox somewhere in the middle here")).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val flagged = DedupOps.contamination(corpus, eval, w = 8, maxLen = 48)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.contains(1L), "doc sharing a long prefix must be flagged")
    assert(!flagged.contains(2L), "disjoint doc must not be flagged")
    // n_shared counts DISTINCT shared shingles
    val n = DedupOps.contamination(corpus, eval, 8, 48)
      .filter($"doc_id" === 1L).select("n_shared").as[Long].head()
    assert(n >= 10, s"prefix overlap should share many shingles, got $n")
  }

  test("connected components: exact clusters on crafted graphs, edge-order invariant") {
    import spark.implicits._
    def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      DedupOps.connectedComponents(pairs.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain 1-2-3-4 (diameter > 1: propagation must iterate), pair 10-11,
    // and 20-21-22 via a hub — three components, min id canonical
    val g = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (21L, 20L), (21L, 22L))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(cc(g) == want)
    // the empty pair graph converges to the empty labelling (a batch with
    // no near-dups must not wedge the admission pipeline)
    assert(cc(Seq.empty) == Map.empty)
    // edge direction/order never matters (undirected closure)
    assert(cc(g.reverse.map(_.swap)) == want)
    // self-pairs and duplicate edges are harmless
    assert(cc(g ++ Seq((1L, 1L), (2L, 3L))) == want)
    // a long chain still converges (diameter 19 < default cap)
    val chain = (0L until 19L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.values.toSet == Set(0L) && got.size == 20)
  }

  test("lake-resident IVF: probes open only probed cells' files, rows equal in-memory IVF") {
    val dir = tmpDir("ivf-lake")
    val table = Similarity.writeIvfLake(emb, s"$dir/t", nCells = 4, numBuckets = 4)
    // every delta file is cell-pure: tight single-value cell stat range
    assert(table.liveFiles().nonEmpty)
    assert(table.liveFiles().forall(f =>
      f.colMin.get("cell").isDefined && f.colMin.get("cell") == f.colMax.get("cell")),
      "writeIvfLake produced a file spanning cells — stats cannot prune")

    // the lake probe returns EXACTLY the in-memory pipeline's rows
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val queries = emb.filter(col("vec_id") < 8)
    val got = Similarity.ivfTopKLake(spark, s"$dir/t", queries, k = 3, nprobe = 2)
    val want = Similarity.ivfTopK(emb, nCells = 4, numQueries = 8, k = 3, nprobe = 2)
    assert(rows(got) == rows(want), "lake probe diverged from in-memory IVF")

    // the probe's corpus scan shape: a literal cell IN (…) over the
    // changelog — the manifest prunes to the probed cells' files only
    val probed = Seq(1, 2)
    val corpus = table.changesBetween(-1L, table.currentSnapshotId)
      .filter(col("cell").isin(probed.map(Integer.valueOf): _*))
    corpus.collect()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case other => Seq(other)
    }
    val scanned = unwrap(corpus.queryExecution.executedPlan).flatMap(_.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }).sum
    val expected = table.liveFiles()
      .count(f => f.colMin.get("cell").exists(c => probed.contains(c.toInt)))
    assert(scanned == expected && expected < table.liveFiles().size,
      s"probe scanned $scanned files, expected only the $expected probed-cell files " +
        s"of ${table.liveFiles().size}")
  }

  test("lake IVF build: Spark job count is independent of nCells (single-pass write)") {
    // the round-4 build committed once per cell, re-scanning the
    // checkpointed assignment nCells times — O(nCells × corpus); the
    // single clustered commit must plan O(1) jobs regardless of nCells
    def jobsFor(nCells: Int): Int = {
      val group = s"ivf-build-$nCells"
      spark.sparkContext.setJobGroup(group, "ivf build job-count probe")
      try Similarity.writeIvfLake(emb, s"${tmpDir(s"ivf-jobs-$nCells")}/t",
        nCells = nCells, numBuckets = 2)
      finally spark.sparkContext.clearJobGroup()
      // the status store is listener-fed (async) — poll until stable
      def count() = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      var prev = -1
      var cur = count()
      var spins = 0
      while (cur != prev && spins < 50) {
        Thread.sleep(100); prev = cur; cur = count(); spins += 1
      }
      cur
    }
    val at2 = jobsFor(2)
    val at8 = jobsFor(8)
    // ±2 jobs of AQE/limit execution variance allowed; the per-cell-commit
    // shape this guards against costs ≥ 1 extra job PER CELL (6+ here)
    assert(at8 <= at2 + 2,
      s"build job count grew with nCells: $at2 jobs at nCells=2 vs $at8 at nCells=8")
  }

  test("lake IVF probe stays correct after post-build upserts and deletes") {
    val root = s"${tmpDir("ivf-lake-mut")}/t"
    val table = Similarity.writeIvfLake(emb, root, nCells = 4, numBuckets = 4)
    val queries = emb.filter(col("vec_id") < 8)
    val before = Similarity.ivfTopKLake(spark, root, queries, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.nonEmpty)
    // pick a returned neighbor and MOVE it: re-upsert under a winning lsn
    // with a fresh embedding assigned to a different cell, and DELETE a
    // second returned neighbor outright
    val moved = before.head._2
    val deleted = (before - before.head).head._2
    val cells = table.read().filter(col("vec_id").isin(moved, deleted))
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val newCell = (0 until 4).find(_ != cells(moved)).get
    val centroids = spark.read.parquet(s"$root/aux/centroids")
    val newEmb = centroids.filter(col("cell") === newCell)
      .select(transform(col("cvec"), v => (v.cast("double") / 10000d).cast("float"))
        .as("embedding")).head.getSeq[Float](0)
    import spark.implicits._
    val lsnBase = emb.agg(max("vec_id")).head.getLong(0) + 10
    table.upsert(Seq((moved, newEmb, newCell)).toDF("vec_id", "embedding", "cell")
      .select(lit("U").as("op"), col("vec_id"), lit(lsnBase).as("lsn"),
        col("embedding"), col("cell")), epochId = 1L)
    table.upsert(Seq(deleted).toDF("vec_id")
      .select(lit("D").as("op"), col("vec_id"), lit(lsnBase + 1).as("lsn"),
        lit(null).cast("array<float>").as("embedding"),
        lit(null).cast("int").as("cell")), epochId = 2L)
    val after = Similarity.ivfTopKLake(spark, root, queries, k = 3, nprobe = 2)
      .collect()
    val ids = after.map(r => (r.getLong(0), r.getLong(1)))
    // the deleted vector is gone, and no (qid, nid) appears twice (the
    // round-4 raw-changelog scan returned both versions of a re-upserted
    // id and resurrected deleted ids)
    assert(!ids.map(_._2).contains(deleted), s"deleted vec $deleted returned")
    assert(ids.distinct.length == ids.length, "duplicate (qid, nid) rows")
    // every returned neighbor's CURRENT winner state is in a probed-able
    // cell and alive; results still rank by the current embeddings
    assert(after.length == before.size || after.nonEmpty)

    // maintenance: a FULL clustered compact restores the pristine probe
    // shape — identical results, winners merged into one live snapshot,
    // every stat-carrying file cell-pure again
    table.compact(clusterBy = Some(col("cell")))
    val compacted = Similarity.ivfTopKLake(spark, root, queries, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(compacted.toSet ==
      after.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet,
      "clustered compaction changed probe results")
    assert(table.liveFiles().filter(_.colMin.contains("cell")).forall(f =>
      f.colMin.get("cell") == f.colMax.get("cell")),
      "clustered compaction produced a cell-spanning stats file")

    // maintained-table lifecycle: roll the log past a checkpoint, expire
    // the pre-checkpoint history (build snapshot included), then upsert
    // once more — the last snapshot is no longer a full compact AND the
    // build snapshot is gone, so the probe must fall back to the
    // conservative winner read (not refuse, not demand expired history)
    val extraId = emb.agg(max("vec_id")).head.getLong(0) + 1000
    val cell0vec = centroids.filter(col("cell") === 0)
      .select(transform(col("cvec"), v => (v.cast("double") / 10000d).cast("float"))
        .as("embedding")).head.getSeq[Float](0)
    var eid = 3L
    def insertOne(): Unit = {
      table.upsert(Seq((extraId + eid, cell0vec, 0)).toDF("vec_id", "embedding", "cell")
        .select(lit("I").as("op"), col("vec_id"), lit(lsnBase + 100 + eid).as("lsn"),
          col("embedding"), col("cell")), epochId = eid)
      eid += 1
    }
    while (table.currentSnapshotId % graft.lake.LakeTable.CheckpointInterval != 0)
      insertOne()
    table.expireSnapshots(table.currentSnapshotId)
    insertOne()
    val postExpiry = Similarity.ivfTopKLake(spark, root, queries, k = 3, nprobe = 2)
      .collect()
    assert(postExpiry.nonEmpty, "probe broke after expiry + upsert")
    assert(!postExpiry.map(_.getLong(1)).contains(deleted),
      "conservative fallback resurrected a deleted vector")
  }

  test("LSH near-dup pairs: exact precision, recall floor vs brute force") {
    val n = emb.count().toInt
    // exact pairs over the whole corpus at a threshold that yields some
    val exact = Similarity.embedNearDup(emb, maxId = n, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture produced no near-dup pairs — spec vacuous")
    val approx = Similarity.lshNearDupPairs(emb, dim = 64, bits = 2, seed = 42L,
      threshold = 0.35).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is EXACT by construction: every emitted pair passes the
    // true cosine test, so approx ⊆ exact
    assert(approx.subsetOf(exact), s"${(approx -- exact).take(5)} not in exact set")
    // recall floor: cosine ≥ 0.35 ⇒ per-plane agreement ≥ 0.61 ⇒ same
    // 2-bit bucket with prob ≥ 0.37; assert a conservative floor
    val recall = approx.size.toDouble / exact.size
    assert(recall >= 0.15, s"LSH near-dup recall $recall collapsed")
  }

  test("native DotProduct expression == higher-order fold, bit-identical") {
    graft.functions.VectorExprs.register(spark)
    val pairs = emb.limit(50).select($"vec_id", $"embedding".as("a"))
      .crossJoin(emb.limit(3).select($"embedding".as("b")))
    val diff = pairs.select(
        graft.functions.VectorExprs.dot(col("a"), col("b")).as("native"),
        Similarity.cosineFold(col("a"), col("b")).as("cf"),
        Similarity.cosine(col("a"), col("b")).as("cn"))
      .filter(col("cn") =!= col("cf")) // exact double equality required
      .count()
    assert(diff == 0)
    // codegen actually fires (expression not in fallback mode) — execute
    // first so AQE finalises the plan
    val df = pairs.select(graft.functions.VectorExprs.dot(col("a"), col("b")))
    df.collect()
    // the `*(n)` prefix marks a WholeStageCodegen span in the AQE rendering
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[dotproduct""".r.findFirstIn(plan).isDefined, plan.take(800))
  }

  test("closure and inference emit no duplicate rows on diamond re-derivation") {
    import graft.operators.Inference
    // diamond WITH the shortcut edge: (1,4) is an edge (so already in the
    // closure) AND re-derived via midpoints 2 and 3 in the same round —
    // multiplicity 2 enters the exceptAll, which subtracts only the one
    // copy the closure holds. The closure must stay a SET.
    val diamond = Seq((1, 2), (1, 3), (2, 4), (3, 4), (1, 4), (4, 5))
      .toDF("src", "dst")
    val want = Set((1,2),(1,3),(1,4),(1,5),(2,4),(2,5),(3,4),(3,5),(4,5))
    val tc = GraphOps.transitiveClosure(diamond)
    assert(tc.count() == tc.distinct().count(),
      "transitive closure returned duplicate (src,dst) rows")
    assert(tc.collect().map(r => (r.getInt(0), r.getInt(1))).toSet == want)
    // distributed loop (forced past the gate) lands the identical set
    val tcDist = GraphOps.transitiveClosure(diamond, driverMaxEdges = -1L)
    assert(tcDist.count() == tcDist.distinct().count())
    assert(tcDist.collect().map(r => (r.getInt(0), r.getInt(1))).toSet == want)
    // same pattern through Path's one-or-more, which returns the closure
    // frame directly (no masking distinct downstream)
    import graft.operators.Path
    import graft.operators.Path._
    val edges = diamond.select(col("src").cast("long").as("src"), lit("e").as("p"),
      col("dst").cast("long").as("dst"))
    val plus = Path.eval(edges, Pred("e").+)
    assert(plus.count() == plus.distinct().count())
    // inference: x memberOf g1,g2 with BOTH g1,g2 subsetOf h re-derives
    // (x memberOf h) twice per round; cyclic subsetOf makes the rule
    // re-derive known facts forever unless candidates dedup before except
    val base = Seq(
      ("x", "memberOf", "g1"), ("x", "memberOf", "g2"),
      ("g1", "subsetOf", "h"), ("g2", "subsetOf", "h"),
      ("h", "subsetOf", "g1") // cycle: never converges without the dedup
    ).toDF("s", "p", "o")
    val rule = (cur: org.apache.spark.sql.DataFrame) => {
      val members = cur.filter($"p" === "memberOf").select($"s".as("x"), $"o".as("g"))
      val subsets = cur.filter($"p" === "subsetOf").select($"s".as("g"), $"o".as("h"))
      members.join(subsets, "g").select($"x".as("s"), lit("memberOf").as("p"), $"h".as("o"))
    }
    val out = Inference.materialize(base, rule)
    assert(out.count() == out.distinct().count(),
      "materialisation carries duplicate statements")
    assert(out.filter($"s" === "x" && $"o" === "h").count() == 1)
  }

  test("transitive closure on a known chain graph") {
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val tc = GraphOps.transitiveClosure(edges).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(tc == Set((1, 2), (2, 3), (3, 4), (1, 3), (2, 4), (1, 4)))
    val rtc = GraphOps.reflexiveTransitiveClosure(edges).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(rtc == tc ++ Set((1, 1), (2, 2), (3, 3), (4, 4)))
  }

  test("Path ADT: 5-hop chain e2e and algebra laws") {
    import graft.operators.Path
    import graft.operators.Path._
    // the reference's e2e: a 5-hop sequence built from the DSL over a
    // 6-node chain graph (path_test.clj:53-58 over path.trig)
    val chain = (1 to 5).map(i => (i.toLong, "next", (i + 1).toLong))
      .toDF("src", "p", "dst")
    val hop = Pred("next")
    val five = hop / hop / hop / hop / hop
    assert(Path.eval(chain, five).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 6L)))
    def rows(p: Path, edges: org.apache.spark.sql.DataFrame =
        chain): Set[(Long, Long)] =
      Path.eval(edges, p).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // laws: alt commutes; seq associates; inverse is an involution
    val mixed = chain.union(Seq((2L, "skip", 5L)).toDF("src", "p", "dst"))
    assert(rows(Pred("next") | Pred("skip"), mixed) == rows(Pred("skip") | Pred("next"), mixed))
    assert(rows((hop / hop) / hop) == rows(hop / (hop / hop)))
    assert(rows(-(-hop)) == rows(hop))
    assert(rows(-hop) == rows(hop).map { case (a, b) => (b, a) })
    // zero-or-one is idempotent; one-or-more == closure; !next on mixed
    assert(rows(hop.?.?) == rows(hop.?))
    assert(rows(hop.+) == Set((1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,6L),
      (1L,3L),(2L,4L),(3L,5L),(4L,6L),(1L,4L),(2L,5L),(3L,6L),(1L,5L),(2L,6L),(1L,6L)))
    assert(rows(!Pred("next"), mixed) == Set((2L, 5L)))
    // composite like the reference grammar: (next | skip) / next+
    assert(rows((Pred("next") | Pred("skip")) / hop.+, mixed).contains((2L, 6L)))
  }

  test("path algebra: inverse is an involution; alt is union; seq composes") {
    val e1 = Seq((1, 2), (3, 4)).toDF("src", "dst")
    val e2 = Seq((2, 5)).toDF("src", "dst")
    assert(GraphOps.inversePath(GraphOps.inversePath(e1)).orderBy("src")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 2), (3, 4)))
    assert(GraphOps.altPath(e1, e2).count() == 3)
    assert(GraphOps.seqPath(e1, e2).collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      == Set((1, 5)))
  }

  test("forward-chaining inference materialises the RDFS-style fixpoint") {
    import graft.operators.Inference
    // the reference's custom-rule example: type propagation through a
    // subclass chain (repository_test.clj:193-215)
    val base = Seq(
      ("alice", "type", "Student"),
      ("Student", "subClassOf", "Person"),
      ("Person", "subClassOf", "Agent"),
      ("bob", "type", "Person")
    ).toDF("s", "p", "o")
    val rule = (cur: org.apache.spark.sql.DataFrame) => {
      val types = cur.filter($"p" === "type").select($"s".as("x"), $"o".as("c1"))
      val subs = cur.filter($"p" === "subClassOf").select($"s".as("c1"), $"o".as("c2"))
      types.join(subs, "c1").select($"x".as("s"), lit("type").as("p"), $"c2".as("o"))
    }
    val out = Inference.materialize(base, rule)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val derived = Set(
      ("alice", "type", "Person"), ("alice", "type", "Agent"),
      ("bob", "type", "Agent"))
    assert(out == base.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet ++ derived)
    // the cap refuses partial materialisations
    val ex = intercept[IllegalStateException] {
      Inference.materialize(base, rule, maxIters = 1).count()
    }
    assert(ex.getMessage.contains("fixpoint"))
  }

  test("semi-naive inference == naive materialisation (delta-driven rounds)") {
    import graft.operators.Inference
    // deep subclass chain: semi-naive derives each new level from the
    // DELTA only, naive re-joins everything — results must be identical
    val base = (Seq(("x", "type", "C0"), ("y", "type", "C2")) ++
      (0 until 8).map(i => (s"C$i", "subClassOf", s"C${i + 1}")))
      .toDF("s", "p", "o")
    val naive = Inference.materialize(base, cur => {
      val types = cur.filter($"p" === "type").select($"s".as("x"), $"o".as("c1"))
      val subs = cur.filter($"p" === "subClassOf").select($"s".as("c1"), $"o".as("c2"))
      types.join(subs, "c1").select($"x".as("s"), lit("type").as("p"), $"c2".as("o"))
    })
    val semi = Inference.materializeIncremental(base, (all, delta) => {
      // only DELTA type-facts join the (stable) subclass hierarchy
      val newTypes = delta.filter($"p" === "type").select($"s".as("x"), $"o".as("c1"))
      val subs = all.filter($"p" === "subClassOf").select($"s".as("c1"), $"o".as("c2"))
      newTypes.join(subs, "c1").select($"x".as("s"), lit("type").as("p"), $"c2".as("o"))
    })
    assert(naive.exceptAll(semi).isEmpty && semi.exceptAll(naive).isEmpty)
    assert(semi.count() == semi.distinct().count())
    // x reaches every class above C0, y every class above C2
    assert(semi.filter($"s" === "x" && $"p" === "type").count() == 9)
    assert(semi.filter($"s" === "y" && $"p" === "type").count() == 7)
  }

  test("add-properties merges a predicate map (replace + append)") {
    import graft.operators.Templater
    val d = Seq((1L, "x")).toDF("doc_id", "v")
    val out = Templater.addProperties(d, Map(
      "v" -> lit("replaced"),
      "extra" -> (col("doc_id") * 2)))
    val row = out.head()
    assert(out.columns.toSeq == Seq("doc_id", "v", "extra"))
    assert(row.getString(1) == "replaced" && row.getLong(2) == 2L)
  }

  test("typed Aggregator LWW == declarative max_by reduce") {
    import graft.feed.{ChangeFeed, FeedConfig}
    val events = ChangeFeed.events(spark, FeedConfig(seed = 9L, numEvents = 4000,
      numDocs = 150, deletePct = 10, maxTokens = 8))
    val typed = graft.cdc.Lww.reduceTyped(events)
      .select($"doc_id", $"lsn").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val decl = graft.cdc.Lww.reduce(events.toDF())
      .select($"doc_id", $"lsn").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(typed == decl)
  }

  test("nested templater: skolem subtree round-trips and replays identically") {
    import graft.operators.Templater
    import graft.operators.Templater._
    val d = docs.limit(10)
    def expand() = Templater.graph(d, col("doc_id"), "g",
      leaves = Seq(Leaf("lang", col("lang"))),
      nodes = Seq(Node("meta", Seq(Leaf("n_chars", col("n_chars")),
        Leaf("head", substring(col("text"), 1, 8))))))
    val out = expand().cache()
    // 1 leaf + 1 subtree link + 2 subtree children per row
    assert(out.count() == 40)
    // replay determinism: a second expansion is bit-identical (gensym'd
    // bnodes — the reference's approach — would fail this)
    assert(out.exceptAll(expand()).isEmpty)
    // round-trip: following subject --meta--> bnode --n_chars--> v
    // reproduces each doc's n_chars exactly
    val link = out.filter($"predicate" === "meta")
      .select($"subject".as("doc"), $"object".as("bnode"))
    val child = out.filter($"predicate" === "n_chars")
      .select($"subject".as("bnode"), $"object".as("v"))
    val back = link.join(child, "bnode").select($"doc", $"v".cast("long").as("v"))
    val orig = d.select($"doc_id".cast("string").as("doc"), $"n_chars".cast("long").as("v"))
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // distinct parents get distinct subtree ids
    assert(link.select("bnode").distinct().count() == 10)
  }

  test("multimodal stub: metadata is a pure function of payload bytes") {
    val out = Multimodal.decodeImageStub(docs.limit(10))
    val rows = out.select("n_bytes", "meta.width", "meta.height").collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(0) % 640)
      assert(r.getInt(2) == (r.getInt(0) * 7) % 480)
    }
    val fs = Multimodal.frameSampleStub(docs.limit(10), k = 4)
    assert(fs.count() == 40)
    assert(fs.filter(col("boff") < 1).isEmpty)
  }

  test("text ops: counts match scala reference on a sample") {
    val sample = docs.limit(20).select("doc_id", "text").collect()
    val got = docs.limit(20).select(col("doc_id"),
      TextOps.wsTokenCount(col("text")).as("nw")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    sample.foreach { r =>
      val expected = r.getString(1).count(_ == ' ') + 1
      assert(got(r.getLong(0)) == expected)
    }
  }
}
