package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k with a bounded query set (broadcast
  * the queries, never cross-join the corpus with itself). Scale path:
  * random-hyperplane LSH bucketing — queries only join candidates in their
  * bucket, turning O(Q×N) into O(Q×N/2^bits) expected.
  *
  * Dot products are `zip_with`/`aggregate` higher-order functions —
  * Catalyst expressions, codegen-friendly, no UDFs.
  */
object Similarity {

  /** Cosine similarity via the native codegen'd [[graft.functions.DotProduct]]
    * expression (register per session; done by the top-k builders). The
    * loop is left-to-right sequential — bit-identical to [[cosineFold]]
    * and to the explicit fold the DuckDB oracle runs.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.functions.VectorExprs.dot _
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Higher-order-function fallback (no registration needed): aggregate
    * over zip_with. Kept as the reference implementation the native
    * expression is property-checked against.
    */
  def cosineFold(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0), (acc, e) => acc + e)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Brute-force top-k cosine neighbors for the query subset
    * `vec_id < numQueries` against the full corpus. The query side is tiny
    * and broadcast; the corpus streams through one pass (one wide scan, no
    * shuffle besides the final per-query top-k).
    */
  def bruteForceTopK(embeddings: DataFrame, numQueries: Int, k: Int): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val queries = broadcast(
      embeddings.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")))
    val scored = embeddings.join(queries, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        graft.functions.TextOps.round4(cosine(col("qvec"), col("embedding"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: all (id1 < id2) pairs in the
    * bounded subset with cosine ≥ threshold. Exact (brute force over the
    * subset); the corpus-scale path is [[ivfTopK]]/[[lshTopK]] bucketing
    * followed by this on candidates.
    */
  def embedNearDup(embeddings: DataFrame, maxId: Int, threshold: Double): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val sub = embeddings.filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"))
    val a = sub.select(col("vec_id").as("id1"), col("embedding").as("va"))
    val b = sub.select(col("vec_id").as("id2"), col("embedding").as("vb"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        graft.functions.TextOps.round4(cosine(col("va"), col("vb"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding near-duplicate pairs AT SCALE: candidates are pairs
    * sharing a random-hyperplane LSH bucket (equi-join on the bucket id —
    * never an all-pairs product), verified with the exact cosine ≥
    * threshold filter. Precision is exact (every emitted pair passes the
    * true test); recall < 1 by construction (cosine-similar vectors
    * collide with probability (1 − θ/π)^bits per the public SimHash/LSH
    * analysis) — floor asserted in OperatorSpec against [[embedNearDup]].
    * At cluster scale the corpus is written bucketed by the LSH id once;
    * the self-join is then bucket-local.
    *
    * COST CONTRACT: the per-bucket self-join is O((N/2^bits)²) — `bits`
    * MUST grow with the corpus (bits ≈ log2(N/targetBucketSize)), or a
    * query copied verbatim at 10⁹ rows is a quadratic scale-killer. Use
    * [[lshNearDupPairsAuto]] to derive `bits` from the corpus size, or
    * [[lshBitsFor]] when N is already known; pass `bits` explicitly only
    * with a deliberate recall/cost trade (fewer bits = higher recall,
    * quadratically more candidate pairs).
    */
  def lshNearDupPairs(embeddings: DataFrame, dim: Int, bits: Int, seed: Long,
                      threshold: Double): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val b = embeddings
      .withColumn("bucket", lshBucket(col("embedding"), dim, bits, seed))
      .select(col("vec_id"), col("embedding"), col("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        graft.functions.TextOps.round4(
          cosine(col("a.embedding"), col("b.embedding"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Plane count that holds the EXPECTED bucket size at `targetBucketSize`
    * as the corpus grows: bits = ⌈log2(N / target)⌉, floor 1 — so the
    * per-bucket self-join work N/2^bits × target stays linear in N
    * instead of quadratic (OperatorSpec pins the invariant
    * N/2^bits ≤ target). Skewed buckets beyond the expectation are the
    * usual salting/AQE story, orthogonal to the plane count.
    */
  def lshBitsFor(corpusSize: Long, targetBucketSize: Long): Int = {
    require(corpusSize > 0 && targetBucketSize > 0,
      s"need positive sizes, got N=$corpusSize target=$targetBucketSize")
    math.max(1, math.ceil(
      math.log(corpusSize.toDouble / targetBucketSize) / math.log(2.0)).toInt)
  }

  /** [[lshNearDupPairs]] with `bits` derived from the corpus size (one
    * count job) — the safe-by-default entry point for unknown N.
    */
  def lshNearDupPairsAuto(embeddings: DataFrame, dim: Int, seed: Long,
                          threshold: Double,
                          targetBucketSize: Long = 1024): DataFrame =
    lshNearDupPairs(embeddings, dim,
      lshBitsFor(embeddings.count(), targetBucketSize), seed, threshold)

  /** Per-dimension round-half-up quantization to 1e-4 as `array<bigint>`.
    * float → double is exact, ×10000 + 0.5 and floor are deterministic
    * IEEE ops, so BOTH engines (Spark and the DuckDB oracle) produce the
    * SAME integers — the trick that makes every downstream k-means step
    * exact-integer arithmetic and therefore oracle-checkable bit-for-bit.
    */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 10000d + 0.5d).cast("long"))

  /** Exact integer dot of two `array<bigint>` columns (no float ever). */
  private def idot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (u, v) => u * v), lit(0L), (acc, e) => acc + e)

  /** Cosine over QUANTIZED vectors: the three dots are exact integers
    * (|q|≤~10⁴ per dim, 64 dims → well inside 2^53), and `a/(√b·√c)` on
    * exact-integer inputs is IEEE-deterministic — identical doubles in
    * Spark and DuckDB, so argmax decisions over these scores can never
    * diverge between engine and oracle. (√(b·c) would overflow Long at
    * b,c ≈ 6.4e9 — hence the sqrt-then-multiply form.)
    */
  def intCosine(a: Column, b: Column): Column =
    idot(a, b).cast("double") /
      (sqrt(idot(a, a).cast("double")) * sqrt(idot(b, b).cast("double")))

  /** Deterministic SAMPLE-TRAINED spherical k-means centroids for IVF.
    *
    * Training runs on a seeded hash-ranked sample (`sampleSize` vectors
    * ranking first by `md5("kseed:"+seed+":"+vec_id)` — replayable, no RNG
    * state), NOT the full corpus: at 100 TB the Lloyd rounds touch only
    * M ≈ 64×nCells rows while the corpus is scanned exactly once, by the
    * final [[ivfAssign]] — the standard IVF build shape. Init: the first
    * `nCells` sample vectors by the same rank. Arithmetic is exact
    * integer end-to-end on [[quantize]]d vectors (centroid[d] =
    * ⌊Σq[d]/n⌋), so every replay — and the DuckDB oracle — produces
    * bit-identical centroids; an empty cell keeps its previous centroid.
    * Returns (cell: int, cvec: array<bigint>).
    *
    * Scale shape per round: assignment is a broadcast score + `max_by`
    * aggregate; the mean is posexplode → (cell, pos) hash aggregate —
    * both map-side partial, no windows, no driver data beyond the
    * nCells×dim centroid frame (checkpointed per round to cut lineage).
    */
  def kmeansCentroids(embeddings: DataFrame, nCells: Int, iters: Int = 1,
                      seed: Long = 42L, sampleSize: Int = 256): DataFrame = {
    val rank = md5(concat(lit(s"kseed:$seed:"), col("vec_id").cast("string")))
    val samp = embeddings
      .select(col("vec_id"), quantize(col("embedding")).as("qv"), rank.as("_r"))
      .orderBy(col("_r"), col("vec_id")).limit(sampleSize)
      .localCheckpoint()
    // the unpartitioned window below triggers Spark's "No Partition
    // Defined for Window" warning — intended: it ranks the ≤ sampleSize
    // (default 256) sample rows, a deliberate single-partition ranking of
    // a bounded frame, never corpus data
    var centroids = samp
      .orderBy(col("_r"), col("vec_id")).limit(nCells)
      .select(
        (row_number().over(Window.orderBy(col("_r"), col("vec_id"))) - 1)
          .cast("int").as("cell"),
        col("qv").as("cvec"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val assigned = samp.crossJoin(broadcast(centroids))
        .select(col("vec_id"), col("qv"), col("cell"),
          intCosine(col("qv"), col("cvec")).as("csim"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("cell"), col("qv")),
          struct(col("csim"), -col("cell"))).as("w"))
        .select(col("w.cell").as("cell"), col("w.qv").as("qv"))
      val means = assigned
        .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        // Σ over ≤ sampleSize ints ≤ 10⁴·sampleSize — exact in double;
        // ⌊·/n⌋ is floor division, identical in both engines
        .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("_new"))
      centroids = centroids
        .join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("_new"), col("cvec")).as("cvec"))
        .localCheckpoint()
      i += 1
    }
    centroids
  }

  /** IVF assignment: nearest centroid per vector, scored against the
    * broadcast centroid set and reduced with a `max_by` AGGREGATE —
    * map-side partial aggregation ships one candidate per (mapper, key),
    * where a `row_number` window would shuffle and sort all N×nCells
    * scored rows (the round-2 shape this replaces). Scoring is the
    * deterministic [[intCosine]] on quantized vectors, so assignments are
    * replay- and oracle-stable. Tie-break: highest cosine, then lowest
    * cell id. Returns (vec_id, embedding, cell).
    */
  def ivfAssign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    embeddings
      .select(col("vec_id"), col("embedding"), quantize(col("embedding")).as("_qv"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cell"),
        intCosine(col("_qv"), col("cvec")).as("csim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cell"), col("embedding")),
        struct(col("csim"), -col("cell"))).as("w"))
      .select(col("vec_id"), col("w.embedding").as("embedding"), col("w.cell").as("cell"))
  }

  /** IVF top-k: sample-trained k-means centroids (deterministic, see
    * [[kmeansCentroids]]), corpus assigned to its nearest cell in ONE
    * pass, queries probe their `nprobe` closest cells. At cluster scale
    * the corpus is written bucketed by cell once and a probe reads nprobe
    * buckets (see [[graft.lake.LakeTable]] integration); the probe
    * fan-out lives on the tiny broadcast query side. Cell routing is
    * approximate by construction, but every stage is deterministic, so
    * the full query IS oracle-checkable (qd40's DuckDB twin mirrors the
    * quantize → train → assign → probe → score pipeline exactly).
    */
  def ivfTopK(embeddings: DataFrame, nCells: Int, numQueries: Int, k: Int,
              nprobe: Int = 2, kmeansIters: Int = 1, seed: Long = 42L,
              sampleSize: Int = 256): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val centroids = kmeansCentroids(embeddings, nCells, kmeansIters, seed, sampleSize)
    val qw = Window.partitionBy(col("qid")).orderBy(col("qsim").desc, col("cell").asc)
    val qprobes = embeddings.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        quantize(col("embedding")).as("_qq"))
      .crossJoin(broadcast(centroids))
      .select(col("qid"), col("qvec"), col("cell"),
        intCosine(col("_qq"), col("cvec")).as("qsim"))
      .withColumn("r", row_number().over(qw)) // query side: bounded rows
      .filter(col("r") <= nprobe)
      .select(col("qid"), col("qvec"), col("cell").as("qcell"))
    val scored = ivfAssign(embeddings, centroids)
      .join(broadcast(qprobes),
        col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        graft.functions.TextOps.round4(cosine(col("qvec"), col("embedding"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** Build a LAKE-RESIDENT IVF index: the corpus is written into a
    * [[graft.lake.LakeTable]] keyed by `vec_id` in ONE clustered commit —
    * a single repartition-by-key write whose files are split by IVF cell
    * (`LakeTable.upsert(clusterBy = cell)`), so every delta file is
    * cell-pure and carries a tight `cell` stat range in the manifest. A
    * probe then opens ONLY the probed cells' files
    * ([[graft.lake.ManifestFileIndex]] data skipping) — the "corpus
    * written bucketed once, probes read nprobe buckets" scale story as
    * tested behavior. Total build cost is O(corpus): one assignment pass
    * feeding one write job, INDEPENDENT of nCells (the round-4 per-cell
    * commit loop re-scanned the assignment nCells times — an
    * O(nCells × corpus) build killer at real cell counts; OperatorSpec
    * pins the job count flat in nCells). Centroids (tiny: nCells×dim
    * ints) are persisted next to the table for probes.
    *
    * The table stays a full CDC citizen: vectors can be upserted/deleted
    * by `vec_id` later. [[ivfTopKLake]] detects post-build commits and
    * switches to a max-lsn winner merge over (pruned build files ∪ ALL
    * post-build files) — still never wrong, and still pruning the
    * cell-pure build set (see its scaladoc for the soundness argument).
    */
  def writeIvfLake(embeddings: DataFrame, root: String, nCells: Int,
                   numBuckets: Int = 8, iters: Int = 1, seed: Long = 42L,
                   sampleSize: Int = 256): graft.lake.LakeTable = {
    import org.apache.spark.sql.types._
    val spark = embeddings.sparkSession
    val centroids = kmeansCentroids(embeddings, nCells, iters, seed, sampleSize)
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$root/aux/centroids")
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true),
      StructField("cell", IntegerType, nullable = true)))
    val table = graft.lake.LakeTable.create(spark, root, schema,
      keyCol = "vec_id", numBuckets = numBuckets)
    // the assignment plans INSIDE the upsert's pinned-placement write (no
    // checkpoint needed: it is consumed exactly once, and the pins keep
    // AQE from coalescing the elided-repartition case). reduce = false is
    // safe even for inputs that re-emit a vec_id: ivfAssign ends in a
    // groupBy(vec_id) aggregate, so the delta carries exactly one row per
    // key by construction
    val batch = ivfAssign(embeddings, centroids).select(
      lit("I").as("op"), col("vec_id"), col("vec_id").as("lsn"),
      col("embedding"), col("cell"))
    table.upsert(batch, epochId = 0L, reduce = false,
      clusterBy = Some(col("cell")),
      summary = Map(IvfBuildKey -> "true"))
    table
  }

  /** Commit-summary marker [[writeIvfLake]] stamps on its single build
    * commit; [[ivfTopKLake]] keys its pristine-vs-modified fast path off
    * it.
    */
  private[graft] val IvfBuildKey = "ivfBuild"

  /** IVF top-k over a lake-resident index built by [[writeIvfLake]]:
    * probe cells are chosen against the persisted centroids (same
    * deterministic [[intCosine]] scoring as the build), the bounded probe
    * set is collected driver-side (≤ queries×nprobe ints — the broadcast
    * side by construction), and the corpus scan carries a LITERAL
    * `cell IN (…)` predicate so the manifest prunes to the probed cells'
    * files before any file opens. Results are identical to [[ivfTopK]]
    * with the same build parameters.
    *
    * Tables MODIFIED after the build (vectors re-upserted or deleted by
    * `vec_id`) stay correct: the scan becomes a max-lsn winner merge over
    * the cell-pruned BUILD files plus ALL post-build change files, with
    * tombstone winners dropped and the cell filter re-applied to the
    * winner row. Pruning only the build set is sound because build rows
    * are each key's FIRST version: a key whose true winner is a
    * post-build row always has that winner in the (unpruned) tail, and a
    * key whose true winner is its build row has no other version at all —
    * so no stale or deleted version can ever win the merge. (Round-4
    * shipped the raw changelog here, which returned duplicate and deleted
    * vectors on modified tables.)
    */
  def ivfTopKLake(spark: org.apache.spark.sql.SparkSession, root: String,
                  queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    val table = graft.lake.LakeTable.load(spark, root)
    val centroids = spark.read.parquet(s"$root/aux/centroids")
    val qw = Window.partitionBy(col("qid")).orderBy(col("qsim").desc, col("cell").asc)
    val qprobes = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        quantize(col("embedding")).as("_qq"))
      .crossJoin(broadcast(centroids))
      .select(col("qid"), col("qvec"), col("cell"),
        intCosine(col("_qq"), col("cvec")).as("qsim"))
      .withColumn("r", row_number().over(qw))
      .filter(col("r") <= nprobe)
      .select(col("qid"), col("qvec"), col("cell").as("qcell"))
      .localCheckpoint() // bounded frame, reused for the cell list AND the join
    val probedCells = qprobes.select("qcell").distinct()
      .collect().map(_.getInt(0)).sorted
    val corpus = ivfLakeCorpus(table, probedCells)
    val scored = corpus
      .join(broadcast(qprobes),
        col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        graft.functions.TextOps.round4(cosine(col("qvec"), col("embedding"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** The probe's corpus frame: cell-pruned build rows, merged with the
    * post-build change tail when the table was modified after the build
    * (soundness argument in [[ivfTopKLake]]'s scaladoc). Returns
    * (vec_id, embedding, cell) current-winner rows with
    * `cell ∈ probedCells`, tombstoned ids excluded.
    */
  private def ivfLakeCorpus(table: graft.lake.LakeTable,
                            probedCells: Seq[Int]): DataFrame = {
    val snaps = table.snapshots
    val cellFilter = col("cell").isin(probedCells.map(Integer.valueOf): _*)
    // a FULL compaction (all-bucket rewrite) leaves the winners merged
    // into one live snapshot: read() then plans as the no-aggregate
    // bucketed fast path, the cell filter pushes to the scan, and — when
    // the compact ran clusterBy(cell) — the manifest prunes to the
    // probed cells' files again. This is the maintenance path that
    // restores pristine probe economics on a modified index (and the
    // only path that survives snapshot-history expiry, since it never
    // touches the changelog).
    val fullyCompacted = snaps.lastOption.exists(s =>
      s.summary.get("operation").contains("compact") &&
        !s.summary.contains("buckets"))
    if (fullyCompacted)
      return table.read().filter(cellFilter)
        .select(col("vec_id"), col("embedding"), col("cell"))
    val upserts = snaps.filter(_.summary.get("operation").contains("upsert"))
    // the changelog-pruned path needs the BUILD snapshot. Its marker on
    // the surviving FIRST upsert is the whole test: expiry deletes a
    // contiguous 0..horizon prefix ([[graft.lake.LakeTable.expireSnapshots]])
    // and ids are dense, so a surviving marked build snapshot implies the
    // entire (build-1, head] changelog range is readable. A maintained
    // table can legitimately lose it — full compact + expireSnapshots +
    // a later upsert leaves post-build upserts as the only surviving
    // history — so the fallback is the always-correct conservative
    // winner read (no file pruning; a periodic compact(clusterBy=cell)
    // restores the fast path above), never a refusal on a healthy table.
    val build = upserts.headOption
      .filter(_.summary.get(IvfBuildKey).contains("true"))
    if (build.isEmpty)
      return table.read().filter(cellFilter)
        .select(col("vec_id"), col("embedding"), col("cell"))
    val buildSnap = build.get
    // build files are cell-pure, so this literal IN prunes at the manifest
    val base = table.changesBetween(buildSnap.snapshotId - 1, buildSnap.snapshotId)
      .filter(cellFilter)
    if (upserts.size == 1) // pristine index: the pruned scan IS the state
      base.select(col("vec_id"), col("embedding"), col("cell"))
    else {
      // modified index: winner merge over pruned build ∪ unpruned tail.
      // The tail is all post-build upsert deltas — small at a maintained
      // index, and a full compact(clusterBy = cell) collapses the probe
      // back to the pruned no-aggregate shape above.
      val tail = table.changesBetween(buildSnap.snapshotId, table.currentSnapshotId)
      val all = base.unionByName(tail)
      all.groupBy(col("vec_id"))
        .agg(max_by(struct(col("embedding"), col("cell"), col("_tomb")),
          col("_lsn")).as("_w"))
        .select(col("vec_id"), col("_w.embedding").as("embedding"),
          col("_w.cell").as("cell"), col("_w._tomb").as("_tomb"))
        .filter(!col("_tomb") && cellFilter)
        .drop("_tomb")
    }
  }

  /** Random-hyperplane LSH bucket id: `bits` pseudo-hyperplanes, plane j's
    * component for dimension d is ±1 from a deterministic splitmix64 bit
    * (no RNG state → replayable). bucket = sum_j sign_j(v) * 2^j.
    *
    * Each plane is materialised as ONE ±1 array literal fed to the native
    * codegen'd DotProduct — O(bits) expression nodes instead of the
    * O(bits×dim) per-element term tree (a 64-dim/4-bit bucket used to be a
    * 256-term column that broadcast >1 MiB task binaries). Requires
    * [[graft.functions.VectorExprs.register]]. Sum order inside the dot is
    * left-to-right over dimensions — identical to the old reduce, so
    * bucket ids are bit-for-bit unchanged.
    *
    * At cluster scale the corpus is written bucketed by this id; queries
    * probe their own bucket plus Hamming-1 neighbors (see [[lshTopK]]).
    */
  def lshBucket(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    val bitCols = (0 until bits).map { j =>
      val plane = Array.tabulate(dim) { d =>
        // deterministic ±1 from splitmix64 — mirrors feed.EventGen.mix64
        val h = graft.feed.EventGen.mix64(seed ^ (j.toLong << 32) ^ d.toLong)
        if ((h & 1L) == 0L) 1.0f else -1.0f
      }
      when(graft.functions.VectorExprs.dot(vec, typedLit(plane)) > 0, lit(1 << j))
        .otherwise(lit(0))
    }
    bitCols.reduce(_ + _).cast("int")
  }

  /** Approximate top-k: same scoring as brute force but only within the
    * query's probe set. With `multiprobe = true` (default) each query
    * probes its own bucket plus every bucket at Hamming distance 1 —
    * (bits+1)× the candidate volume for a large recall gain; the probe
    * fan-out lives on the tiny broadcast query side, never the corpus.
    * Probe buckets of one query are distinct, and a corpus vector lives in
    * exactly one bucket, so no (qid, nid) pair is scored twice. Recall < 1
    * by construction — verified rows-only (no SQL oracle), with a recall
    * assertion in OperatorSpec.
    */
  def lshTopK(embeddings: DataFrame, dim: Int, bits: Int, seed: Long,
              numQueries: Int, k: Int, multiprobe: Boolean = true): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val bucketed = embeddings.withColumn("bucket",
      lshBucket(col("embedding"), dim, bits, seed))
    val base = bucketed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("bucket").as("qbucket"))
    val probes =
      if (!multiprobe) base
      else base
        .select(col("qid"), col("qvec"),
          explode(array((lit(0) +: (0 until bits).map(j => lit(1 << j))): _*)).as("_flip"),
          col("qbucket"))
        .select(col("qid"), col("qvec"),
          col("qbucket").bitwiseXOR(col("_flip")).as("qbucket"))
    val queries = broadcast(probes)
    val scored = bucketed
      .join(queries, col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        graft.functions.TextOps.round4(cosine(col("qvec"), col("embedding"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }
}
