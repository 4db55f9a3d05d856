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
    // 2 bits = 4 buckets on this 500-vector corpus: recall/efficiency
    // trade-off is mild enough to assert a floor deterministically
    val approx = Similarity.lshTopK(emb, dim = 64, bits = 2, seed = 42L,
      numQueries = 8, k = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"LSH recall $recall collapsed — bucketing broken?")
    // every vector lands in exactly one bucket
    val n = emb.count()
    val bucketed = emb.withColumn("b", Similarity.lshBucket(col("embedding"), 64, 4, 42L))
    assert(bucketed.count() == n)
    assert(bucketed.agg(countDistinct("b")).head.getLong(0) <= 16)
  }

  test("IVF ANN: recall floor vs brute force; near-dup pairs are symmetric-free and thresholded") {
    val exact = Similarity.bruteForceTopK(emb, numQueries = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, nCells = 4, numQueries = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall $recall collapsed")
    // every vector gets exactly one cell
    assert(Similarity.ivfAssign(emb, 4).count() == emb.count())

    val nd = Similarity.embedNearDup(emb, maxId = 60, threshold = 0.75).collect()
    nd.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.75)
    }
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

  test("transitive closure on a known chain graph") {
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val tc = GraphOps.transitiveClosure(edges).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(tc == Set((1, 2), (2, 3), (3, 4), (1, 3), (2, 4), (1, 4)))
    val rtc = GraphOps.reflexiveTransitiveClosure(edges).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(rtc == tc ++ Set((1, 1), (2, 2), (3, 3), (4, 4)))
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
