package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.Lww
import graft.functions.TextOps
import graft.operators._

/** Driver contract (see SURVEY.md §2 for the operator inventory each query
  * evidences). Every query has a DuckDB-oracle twin in [[oracleSql]] unless
  * it is inherently approximate (noted per entry).
  *
  * Portability conventions shared by query + oracle:
  *  - double aggregations go through DECIMAL casts (float addition order
  *    differs between engines; decimal doesn't) but the FINAL output column
  *    is always cast back to DOUBLE: a decimal output column is
  *    representation-fragile across readers (pyarrow keeps Decimal("5.00"),
  *    DuckDB's pandas bridge gives float 5.0 — same value, different
  *    canonical string, broken hash); the exact decimal → nearest-double
  *    conversion is deterministic and identical in both engines;
  *  - double→int conversions use floor() (Spark casts truncate, DuckDB
  *    casts round);
  *  - content hashing is md5 (identical everywhere);
  *  - every ranked/limited query has a total deterministic ORDER BY.
  */
object SparkEntry {

  private def t(dir: String, name: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship: the full CDC replay (dedup → LWW → merge-on-read snapshot
    * table → merged read) driven from the shared events table.
    */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.replayToTable(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans / filters / aggregation (S1, F*, A*; SURVEY §2.1/2.3/2.5) ---
    "q01_agg_filter" -> ((s, dir) => { implicit val sp = s
      t(dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1997-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
             sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
             count(lit(1)).as("cnt"))
    }),
    "q02_join_broadcast" -> ((s, dir) => { implicit val sp = s
      t(dir, "orders").join(broadcast(t(dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
             sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    }),
    "q03_chain_join" -> ((s, dir) => { implicit val sp = s
      // sequence-path shape J1: supplier/nation/region hop chain
      t(dir, "supplier")
        .join(broadcast(t(dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("s_name"), col("n_name"), col("r_name"))
    }),
    "q04_topk" -> ((s, dir) => { implicit val sp = s
      t(dir, "orders").join(t(dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(10)
    }),
    "q05_window_latest" -> ((s, dir) => { implicit val sp = s
      // per-key latest = the windowed LWW pattern (SURVEY §2.6)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(dir, "orders").withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    }),
    "q06_window_running" -> ((s, dir) => { implicit val sp = s
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(dir, "lineitem").select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").as("running_qty"))
    }),
    "q07_intersect" -> ((s, dir) => { implicit val sp = s
      t(dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
        .intersect(t(dir, "orders").filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey")))
    }),
    "q08_except" -> ((s, dir) => { implicit val sp = s
      t(dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
        .except(t(dir, "orders").filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey")))
    }),
    "q09_semi_join" -> ((s, dir) => { implicit val sp = s
      t(dir, "customer").join(t(dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q10_anti_join" -> ((s, dir) => { implicit val sp = s
      t(dir, "customer").join(t(dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q11_values_in" -> ((s, dir) => { implicit val sp = s
      // VALUES-inlining / isin filter (F2)
      t(dir, "lineitem").filter(col("l_returnflag").isin("A", "R"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
             sum(col("l_discount").cast("decimal(18,4)")).cast("double").as("sum_disc"))
    }),
    "q12_limit_offset" -> ((s, dir) => { implicit val sp = s
      t(dir, "orders").orderBy(col("o_orderkey"))
        .select(col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").cast("double").as("total"))
        .offset(10).limit(20)
    }),
    "q13_distinct" -> ((s, dir) => { implicit val sp = s
      t(dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
    }),
    "q14_union_all" -> ((s, dir) => { implicit val sp = s
      val ev = t(dir, "events")
      ev.filter(col("event_type") === "click")
        .select(col("event_id"), lit("click").as("kind"), col("user_id"))
        .unionAll(ev.filter(col("event_type") === "view")
          .select(col("event_id"), lit("view").as("kind"), col("user_id")))
    }),
    "q15_coercions" -> ((s, dir) => { implicit val sp = s
      // the coercion-matrix operator (P4): numeric/string/temporal casts
      t(dir, "events").select(
        col("event_id"),
        col("value").cast("decimal(18,2)").cast("double").as("v_dec"),
        floor(col("value")).cast("bigint").as("v_floor"),
        col("value").cast("decimal(18,2)").cast("string").as("v_str"),
        (col("value") > 100).as("is_big"),
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"), hour(col("ts")).as("h"))
    }),
    "q16_json" -> ((s, dir) => { implicit val sp = s
      t(dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
    }),
    "q17_templater" -> ((s, dir) => { implicit val sp = s
      // templater 1→N expansion (P1/P2): row → property quads
      t(dir, "documents").select(col("doc_id"),
          explode(array(
            struct(lit("lang").as("predicate"), col("lang").as("object")),
            struct(lit("n_chars").as("predicate"), col("n_chars").cast("string").as("object")),
            struct(lit("text_head").as("predicate"), substring(col("text"), 1, 16).as("object"))))
            .as("kv"),
          col("source"))
        .select(col("doc_id"), col("kv.predicate").as("predicate"),
          col("kv.object").as("object"), col("source"))
    }),
    "q18_closure" -> ((s, dir) => { implicit val sp = s
      // ZeroOrMore/OneOrMore path (J4/J5): iterative transitive closure
      val nations = t(dir, "nation").select(col("n_nationkey").cast("int").as("src"),
        (col("n_regionkey") + 100).cast("int").as("dst"))
      val regions = t(dir, "region").select((col("r_regionkey") + 100).cast("int").as("src"),
        lit(999).cast("int").as("dst"))
      GraphOps.transitiveClosure(nations.unionAll(regions))
    }),
    "q19_rollup" -> ((s, dir) => { implicit val sp = s
      t(dir, "lineitem").rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))
    }),
    "q20_stats" -> ((s, dir) => { implicit val sp = s
      t(dir, "events").groupBy(col("event_type"))
        .agg(TextOps.round4(stddev_samp(col("value"))).as("sd"),
             TextOps.round4(avg(col("value"))).as("mean"),
             TextOps.round4(min(col("value"))).as("mn"),
             TextOps.round4(max(col("value"))).as("mx"))
    }),

    // --- CDC engine operators on shared data (SURVEY §2.5 A2/A3, §7) ---
    "q21_lww" -> ((s, dir) => { implicit val sp = s
      Lww.reduce(CdcQueries.eventsAsFeed(s, dir))
        .select(col("doc_id"), col("lsn"), col("source"))
    }),
    "q22_lww_salted" -> ((s, dir) => { implicit val sp = s
      // same semantics through the two-phase salted reduce — same oracle
      Lww.reduceSalted(CdcQueries.eventsAsFeed(s, dir), saltBuckets = 8)
        .select(col("doc_id"), col("lsn"), col("source"))
    }),
    "q23_cdc_e2e" -> ((s, dir) => CdcQueries.replayToTable(s, dir)),

    // --- text analysis (training-data ops) ---
    "qt24_tokenstats" -> ((s, dir) => { implicit val sp = s
      t(dir, "documents").select(col("doc_id"),
        TextOps.wsTokenCount(col("text")).cast("bigint").as("n_words"),
        TextOps.alphaRunCount(col("text")).cast("bigint").as("n_runs"))
    }),
    "qt25_langid" -> ((s, dir) => { implicit val sp = s
      t(dir, "documents").select(col("doc_id"), col("lang").as("labeled"),
        TextOps.langId(col("text")).as("lang_pred"))
    }),
    "qt26_quality" -> ((s, dir) => { implicit val sp = s
      t(dir, "documents").select(col("doc_id"),
        length(col("text")).cast("bigint").as("len"),
        TextOps.meanWordLen(col("text")).as("mean_word_len"),
        TextOps.stopRatio(col("text")).as("stop_ratio"),
        TextOps.qualityScore(col("text")).as("quality"))
    }),
    "qt27_fingerprint" -> ((s, dir) => { implicit val sp = s
      // min-shingle md5 rolling fingerprint over the first 64 chars
      t(dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 64).as("tx"))
        .select(col("doc_id"),
          explode(sequence(lit(1), greatest(lit(1), length(col("tx")) - 7))).as("i"),
          col("tx"))
        .groupBy(col("doc_id"))
        .agg(min(md5(col("tx").substr(col("i"), lit(8)))).as("fp"))
    }),

    // --- dedup family (training-data ops) ---
    "qd28_dedup_exact" -> ((s, dir) => { implicit val sp = s
      DedupOps.exactClusters(t(dir, "documents"), "text", prefixLen = 24)
    }),
    "qd29_ngram_jaccard" -> ((s, dir) => { implicit val sp = s
      // maxDocFreq cut engaged but parameterized above the subset size
      // (40 docs) — exercises the gated join path with exact semantics
      DedupOps.ngramJaccard(t(dir, "documents").filter(col("doc_id") < 40),
        w = 3, maxLen = 40, minJaccard = 0.04, maxDocFreq = 64)
    }),
    "qd30_minhash_lsh" -> ((s, dir) => { implicit val sp = s
      DedupOps.minhashLshCandidates(t(dir, "documents").filter(col("doc_id") < 60),
        w = 3, maxLen = 40, k = 8, bands = 4)
    }),
    "qd31_simhash" -> ((s, dir) => { implicit val sp = s
      DedupOps.simhash16(t(dir, "documents"), maxLen = 64)
    }),
    "qd42_simhash64" -> ((s, dir) => { implicit val sp = s
      DedupOps.simhash64(t(dir, "documents"), maxLen = 64)
    }),
    "qd45_simhash_band" -> ((s, dir) => { implicit val sp = s
      DedupOps.simhashCandidates(t(dir, "documents"), maxLen = 64)
    }),
    "qd53_simhash_verified" -> ((s, dir) => { implicit val sp = s
      // banded candidates + exact Hamming verify: the precision step the
      // pigeonhole banding alone lacks (recall stays exact for dist ≤ 3)
      DedupOps.simhashNearDups(t(dir, "documents"), maxLen = 64, maxDist = 3)
    }),

    // --- similarity search (training-data ops) ---
    "qd32_embed_topk" -> ((s, dir) => { implicit val sp = s
      Similarity.bruteForceTopK(t(dir, "embeddings"), numQueries = 8, k = 3)
    }),
    // approximate by construction but fully deterministic: the ±1 plane
    // literals are SQL-expressible, so the oracle mirrors the whole
    // bucket→multiprobe→score pipeline; recall floor also in OperatorSpec
    "qd33_ann_lsh" -> ((s, dir) => { implicit val sp = s
      Similarity.lshTopK(t(dir, "embeddings"), dim = 64, bits = 4, seed = 42L,
        numQueries = 8, k = 3)
    }),

    // --- multimodal plumbing (stubbed decode, real Spark contract) ---
    "qm34_multimodal" -> ((s, dir) => { implicit val sp = s
      Multimodal.decodeImageStub(t(dir, "documents")).select(
        col("doc_id"), col("n_bytes").cast("bigint").as("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"),
        element_at(col("feature"), 1).as("f0"),
        element_at(col("feature"), 2).as("f1"),
        element_at(col("feature"), 3).as("f2"))
    }),
    "qm35_framesample" -> ((s, dir) => { implicit val sp = s
      Multimodal.frameSampleStub(t(dir, "documents"), k = 4)
    }),
    "q36_source_restrict" -> ((s, dir) => { implicit val sp = s
      // graph-restriction analog (F1): scope to a source/partition set
      t(dir, "documents").filter(col("source").isin("src0", "src1"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
    }),
    "q37_zero_or_one_path" -> ((s, dir) => { implicit val sp = s
      // ZeroOrOnePath `?` (J6): identity ∪ single hop
      GraphOps.zeroOrOnePath(t(dir, "nation").select(
        col("n_nationkey").cast("int").as("src"),
        (col("n_regionkey") + 100).cast("int").as("dst")))
    }),
    "q38_negated_path" -> ((s, dir) => { implicit val sp = s
      // NegatedPropertySet `!` (J7): hop via any predicate NOT in the set
      GraphOps.negatedPath(
        t(dir, "events").select(col("user_id").as("src"),
          col("event_type").as("p"), col("event_id").as("dst")),
        "p", Seq("error", "signup"))
    }),
    "qd39_embed_neardup" -> ((s, dir) => { implicit val sp = s
      // embedding-cosine near-duplicate pairs (exact over bounded subset)
      Similarity.embedNearDup(t(dir, "embeddings"), maxId = 60, threshold = 0.75)
    }),
    // IVF-bucketed ANN: sample-trained exact-integer k-means, nprobe=2 —
    // approximate routing, yet every stage is deterministic, so the DuckDB
    // oracle mirrors the full pipeline; recall floor ≥0.6 in OperatorSpec
    "qd40_ann_ivf" -> ((s, dir) => { implicit val sp = s
      Similarity.ivfTopK(t(dir, "embeddings"), nCells = 4, numQueries = 8, k = 3,
        nprobe = 2)
    }),
    // LSH-bucketed near-dup pairs: approximate candidates (bucket
    // equi-join) + exact cosine verify — precision exact, recall floor
    // asserted in OperatorSpec; oracle mirrors buckets via plane literals
    // sequence PACKING (north-rule input shape): docs tokenized
    // deterministically (word lengths), concatenated with EOS=-1 per
    // source group in doc_id order, cut into 512-token sequences; scalar
    // per-sequence stats keep the oracle hash exact
    "qd61_seqpack" -> ((s, dir) => { implicit val sp = s
      val docs = t(dir, "documents").select(col("doc_id"), col("source"),
        transform(split(col("text"), " "), w => length(w).cast("int")).as("tokens"))
      graft.operators.TokenPack.packStats(docs, "source", seqLen = 512)
        .select(col("source"), col("seq_id"), col("n_tok"),
          col("first_tok"), col("last_tok"), col("tok_sum"))
    }),
    // --- deterministic seeded sampling (corpus curation; Sampling.scala) ---
    // Bernoulli keep-25%: md5-threshold filter — replay-deterministic,
    // narrow (no shuffle), exact oracle via the same md5 prefix compare
    "qs62_sample_bernoulli" -> ((s, dir) => { implicit val sp = s
      Sampling.bernoulli(t(dir, "documents"), col("doc_id"), p = 0.25, seed = "s62")
        .select(col("doc_id"), col("source"))
    }),
    // LARGE exact draw (k > DirectTopKMax): the two-pass threshold-refine
    // path — count, md5-threshold pre-filter, top-k over ~k survivors —
    // hash-matched against the oracle's plain ORDER BY + LIMIT (the two
    // shapes are row-identical by construction; the survivor-count check
    // inside exactKLarge proves containment per run)
    "qs77_sample_large" -> ((s, dir) => { implicit val sp = s
      Sampling.exactK(t(dir, "events"), col("event_id"), k = 50000, seed = "s77")
        .select(col("event_id"), col("user_id"))
    }),
    // per-stratum rates: the corpus-mixing knob (up/down-weight sources)
    "qs63_sample_stratified" -> ((s, dir) => { implicit val sp = s
      Sampling.stratified(t(dir, "documents"), col("doc_id"), col("source"),
        rates = Map("src0" -> 0.9, "src1" -> 0.3), defaultRate = 0.1, seed = "s63")
        .select(col("doc_id"), col("lang"), col("source"))
    }),
    // stable train/val/test assignment, aggregated per (split, source)
    "qs64_splits" -> ((s, dir) => { implicit val sp = s
      Sampling.assignSplits(t(dir, "documents"), col("doc_id"),
        splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "s64")
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
    }),
    // exact-size uniform draw: global top-k by the hash (per-partition
    // heaps + driver merge of k — never a full sort)
    "qs67_sample_exactk" -> ((s, dir) => { implicit val sp = s
      Sampling.exactK(t(dir, "documents"), col("doc_id"), k = 100, seed = "s67")
        .select(col("doc_id"), col("source"))
    }),

    // balanced draw: exactly 20 docs per source (window top-k per stratum)
    "qs68_sample_per_stratum" -> ((s, dir) => { implicit val sp = s
      Sampling.exactKPerStratum(t(dir, "documents"), col("doc_id"),
          col("source"), k = 20, seed = "s68")
        .select(col("doc_id"), col("source"))
    }),

    // the composed CURATION pipeline: quality gate → predicted-language
    // gate → seeded 50% sample → split assignment — the end-to-end
    // pretraining-curation chain, every stage individually oracled
    // (qt25/qt26/qs62/qs64) and the composition oracled here
    "qc69_curate" -> ((s, dir) => { implicit val sp = s
      val scored = t(dir, "documents")
        .withColumn("quality", TextOps.qualityScore(col("text")))
        .withColumn("lang_pred", TextOps.langId(col("text")))
        .filter(col("quality") >= 0.5 && col("lang_pred") === "en")
      // DISTINCT seeds for the two stages: a shared seed correlates the
      // draws perfectly — every bernoulli(0.5) survivor has u < 0x8000…,
      // which is below any train cut ≥ 0.5, so 'val' would be provably
      // empty. Independent seeds make every split branch reachable.
      Sampling.assignSplits(
          Sampling.bernoulli(scored, col("doc_id"), p = 0.5, seed = "c69"),
          col("doc_id"), Seq("train" -> 0.9, "val" -> 0.1), seed = "c69split")
        .select(col("doc_id"), col("source"), col("quality"), col("split"))
    }),

    // budget-bounded draw: ≤3000 chars of docs per source, hash-ordered
    "qs72_sample_token_budget" -> ((s, dir) => { implicit val sp = s
      Sampling.weightBudgetPerStratum(t(dir, "documents"), col("doc_id"),
          col("source"), col("n_chars"), budget = 3000L, seed = "s72")
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // --- corpus term statistics (TermStats.scala) ---
    "qt65_docfreq" -> ((s, dir) => { implicit val sp = s
      TermStats.docFreq(t(dir, "documents"))
    }),
    // top-3 rarity-weighted terms per doc (rational idf = n_docs/df:
    // correctly-rounded IEEE ops only, so the oracle hash is exact)
    "qt66_topterms" -> ((s, dir) => { implicit val sp = s
      TermStats.topTerms(t(dir, "documents"), k = 3)
    }),

    // near-dup CLUSTERING: the pairs are closed into connected
    // components (min-label propagation) and the min id of each component
    // is the canonical keep — near-duplicate is not transitive, the
    // keep-list must be. Oracle: DuckDB recursive CTE (min reachable id).
    "qd60_neardup_components" -> ((s, dir) => { implicit val sp = s
      val pairs = Similarity.lshNearDupPairs(t(dir, "embeddings"), dim = 64,
        bits = 2, seed = 42L, threshold = 0.35)
      DedupOps.connectedComponents(pairs, "id1", "id2")
        .select(col("v").as("vec_id"), col("comp"),
          (col("v") === col("comp")).as("keep"))
    }),
    "qd57_neardup_lsh" -> ((s, dir) => { implicit val sp = s
      Similarity.lshNearDupPairs(t(dir, "embeddings"), dim = 64, bits = 2,
        seed = 42L, threshold = 0.35)
    }),
    // LAKE-RESIDENT IVF: corpus written in ONE cell-clustered commit into
    // a LakeTable (cell-pure files + manifest stats → probes open only
    // probed cells' files; OperatorSpec pins the skip AND the O(1)-jobs
    // build), same deterministic pipeline as qd40 — so the same DuckDB
    // oracle checks it end-to-end
    "qd59_ann_ivf_lake" -> ((s, dir) => { implicit val sp = s
      val root = s"${sys.props("java.io.tmpdir")}/graft-q-ivflake-" +
        s"${s.sparkContext.applicationId}-" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val emb = t(dir, "embeddings")
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/meta")))
        Similarity.writeIvfLake(emb, root, nCells = 4)
      Similarity.ivfTopKLake(s, root, emb.filter(col("vec_id") < 8), k = 3, nprobe = 2)
    }),
    // PII scrubbing: email/URL redaction + per-doc match counts (the
    // synthetic corpus is clean — the spec pins behavior on crafted rows;
    // this query pins cross-engine regex portability on real data)
    "qt75_redact" -> ((s, dir) => { implicit val sp = s
      val (em, ur) = TextOps.piiCounts(col("text"))
      t(dir, "documents").select(col("doc_id"),
        em.cast("bigint").as("n_emails"), ur.cast("bigint").as("n_urls"),
        substring(TextOps.redact(col("text")), 1, 40).as("head"))
    }),

    // repetition quality gate: 1 - distinct/total 8-char shingles
    "qt74_repetition" -> ((s, dir) => { implicit val sp = s
      TermStats.repetitionRatio(t(dir, "documents"), w = 8, maxLen = 64)
    }),

    // eval-set decontamination: corpus docs sharing any 8-char shingle
    // with the (deterministic) held-out eval slice; hashed-shingle
    // equi-join, eval side broadcast — never all-pairs
    "qd73_contamination" -> ((s, dir) => { implicit val sp = s
      val docs = t(dir, "documents")
      val eval = docs.filter(col("doc_id") % 97 === 0)
      DedupOps.contamination(docs.filter(col("doc_id") % 97 =!= 0), eval,
        w = 8, maxLen = 48)
    }),

    // --- embedding vector utilities (VectorOps.scala) ---
    // norms + first normalized element per vector (native dot fold)
    "qv70_vecnorm" -> ((s, dir) => { implicit val sp = s
      graft.functions.VectorExprs.register(s)
      // two-step normalize: the norm is a materialized column, so the
      // transform lambda divides by an O(1) attribute, not an O(d) fold
      t(dir, "embeddings")
        .withColumn("_n", VectorOps.l2Norm(col("embedding")))
        .select(col("vec_id"),
          TextOps.round4(col("_n")).as("norm"),
          TextOps.round4(element_at(
            VectorOps.l2NormalizeBy(col("embedding"), col("_n")), 1)).as("n0"))
    }),
    // per-label mean pooling (decimal-summed — deterministic under any
    // partitioning, exact vs the oracle)
    "qv71_meanpool" -> ((s, dir) => { implicit val sp = s
      VectorOps.meanPool(t(dir, "embeddings"), "label")
    }),
    "qm41_resize" -> ((s, dir) => { implicit val sp = s
      // resize stub: binary-in/binary-out; SQL-verifiable metadata
      Multimodal.resizeStub(t(dir, "documents"), factor = 4)
        .select(col("doc_id"), col("n_bytes_resized"), col("first_sample"))
    }),
    "q44_templater_nested" -> ((s, dir) => { implicit val sp = s
      // nested bnode subtree with deterministic skolem ids
      // (templater.clj:40-51; SURVEY §1.4 skolemisation)
      import graft.operators.Templater._
      graph(t(dir, "documents"), col("doc_id"), "g",
        leaves = Seq(Leaf("lang", col("lang"))),
        nodes = Seq(Node("meta", Seq(
          Leaf("n_chars", col("n_chars")),
          Leaf("head", substring(col("text"), 1, 8))))))
    }),
    "q54_templater_deep" -> ((s, dir) => { implicit val sp = s
      // arbitrary-depth template recursion (templater.clj:40-51): a
      // 3-level tree, skolem ids chained md5(parent ∥ 0x01 ∥ predicate)
      import graft.operators.Templater._
      graph(t(dir, "documents"), col("doc_id"), "g",
        leaves = Seq(Leaf("lang", col("lang"))),
        nodes = Seq(Node("meta", Seq(
          Leaf("n_chars", col("n_chars")),
          Node("head", Seq(
            Leaf("h8", substring(col("text"), 1, 8)),
            Leaf("h4", substring(col("text"), 1, 4))))))))
    }),
    "q55_ntriples" -> ((s, dir) => { implicit val sp = s
      // N-Triples mode: a 3-column statement frame (triple = quad with
      // nil context, protocols.cljc:396-406) serialises without <source>
      graft.sources.NQuads.serialize(
        t(dir, "documents").select(
          col("doc_id").cast("string").as("subject"),
          lit("lang").as("predicate"),
          col("lang").as("object")))
    }),
    "q56_prefix_expand" -> ((s, dir) => { implicit val sp = s
      // CURIE prefix expansion/compaction (C3, repository.clj:670-673) as
      // pure Column rewrites; compact ∘ expand round-trips the lang CURIE
      import graft.sources.Prefixes
      val m = Map(
        "doc" -> "http://example.org/doc/",
        "lang" -> "http://purl.org/dc/terms/language/")
      t(dir, "documents").select(col("doc_id"),
        Prefixes.expand(concat(lit("doc:"), col("doc_id")), m).as("iri"),
        Prefixes.compact(
          Prefixes.expand(concat(lit("lang:"), col("lang")), m), m).as("curie"))
    }),
    "q43_path_algebra" -> ((s, dir) => { implicit val sp = s
      // composable path DSL (reference path.clj grammar, e2e like
      // path_test.clj:53-58): (s_in | c_in) / in_region / to_hub?
      // over a typed-edge graph spanning four tables
      import graft.operators.Path._
      val edges = t(dir, "supplier").select(
          (col("s_suppkey") + 10000).cast("long").as("src"),
          lit("s_in").as("p"), col("s_nationkey").cast("long").as("dst"))
        .unionAll(t(dir, "customer").select(
          (col("c_custkey") + 20000).cast("long").as("src"),
          lit("c_in").as("p"), col("c_nationkey").cast("long").as("dst")))
        .unionAll(t(dir, "nation").select(
          col("n_nationkey").cast("long").as("src"),
          lit("in_region").as("p"), (col("n_regionkey") + 100).cast("long").as("dst")))
        .unionAll(t(dir, "region").select(
          (col("r_regionkey") + 100).cast("long").as("src"),
          lit("to_hub").as("p"), lit(999L).as("dst")))
      val path = (Pred("s_in") | Pred("c_in")) / Pred("in_region") / Pred("to_hub").?
      graft.operators.Path.eval(edges, path).distinct()
    }),
    "q46_part_stats" -> ((s, dir) => { implicit val sp = s
      t(dir, "part").groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"),
             sum(col("p_retailprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
             max(col("p_size")).as("max_size"))
    }),
    "q47_changelog" -> ((s, dir) => CdcQueries.changelogSecondChunk(s, dir)),
    // source-restricted changelog over the LAKE table: the filter pushes
    // to the manifest-driven scan, and per-file column stats skip
    // non-matching delta files driver-side (PlanSpec pins the skip); the
    // oracle recomputes the per-chunk winners from raw events
    "q58_lake_source_restrict" -> ((s, dir) => {
      val table = CdcQueries.replayTable(s, dir, chunks = 4, slot = "skip")
      table.changesBetween(-1L, table.currentSnapshotId)
        .filter(col("source") === "click")
        .select(col("doc_id"),
          col(graft.lake.LakeTable.LsnCol).as("win_lsn"), col("source"))
    }),
    "q48_zero_or_more" -> ((s, dir) => { implicit val sp = s
      // ZeroOrMorePath `*` (J4): reflexive-transitive closure
      val nations = t(dir, "nation").select(col("n_nationkey").cast("int").as("src"),
        (col("n_regionkey") + 100).cast("int").as("dst"))
      val regions = t(dir, "region").select((col("r_regionkey") + 100).cast("int").as("src"),
        lit(999).cast("int").as("dst"))
      GraphOps.reflexiveTransitiveClosure(nations.unionAll(regions))
    }),
    "q49_inverse_path" -> ((s, dir) => { implicit val sp = s
      // InversePath `^` (J3): projection swap, no shuffle
      GraphOps.inversePath(t(dir, "nation").select(
        col("n_nationkey").cast("int").as("src"),
        (col("n_regionkey") + 100).cast("int").as("dst")))
    }),
    "q51_nquads" -> ((s, dir) => { implicit val sp = s
      // literal serialisation (C1): statement frame → N-Quads lines with
      // N-Triples escaping, as pure Column transforms
      import graft.operators.Templater._
      graft.sources.NQuads.serialize(
        graph(t(dir, "documents"), col("doc_id"), "g",
          leaves = Seq(Leaf("head", substring(col("text"), 1, 12)),
            Leaf("lang", col("lang")))))
    }),
    "q76_turtle" -> ((s, dir) => { implicit val sp = s
      // Turtle serialisation (C1/C3 composed; reference formats.clj:8-19,
      // writer + prefix header io.clj:500-582): CURIE compaction, the `a`
      // keyword for rdf:type, <iri> fallback for unmapped namespaces —
      // the DuckDB twin mirrors the compaction case-for-case
      import graft.sources.Turtle
      val m = Map("doc" -> "http://example.org/doc/",
        "dct" -> "http://purl.org/dc/terms/")
      val d = t(dir, "documents")
      def subj = concat(lit("http://example.org/doc/"), col("doc_id"))
      val stmts = d.select(subj.as("subject"),
          lit("http://purl.org/dc/terms/language").as("predicate"),
          col("lang").as("object"))
        .unionAll(d.select(subj.as("subject"),
          lit(Turtle.RdfType).as("predicate"),
          col("source").as("object")))
        .unionAll(d.select(subj.as("subject"),
          lit("http://example.org/meta#n_chars").as("predicate"),
          col("n_chars").cast("string").as("object")))
      Turtle.serialize(stmts, m)
    }),
    "q78_trig" -> ((s, dir) => { implicit val sp = s
      // TriG — Turtle's quad extension (formats.clj:8-19 :trig): one
      // single-statement graph block per quad, provenance as the graph
      import graft.sources.Turtle
      val m = Map("doc" -> "http://example.org/doc/",
        "src" -> "http://example.org/source/")
      val stmts = t(dir, "documents").select(
        concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
        lit("http://example.org/meta#lang").as("predicate"),
        col("lang").as("object"),
        concat(lit("http://example.org/source/"), col("source")).as("source"))
      Turtle.serializeTrig(stmts, m)
    }),
    "q88_typed_rdf" -> ((s, dir) => { implicit val sp = s
      // TYPED statement model end-to-end (the constructs of the
      // reference's rdf-types.ttl / 1.nt fixtures over real table data;
      // Rio term model io.clj:649-678): documents → typed statements
      // (IRI objects, xsd:integer-typed literals, language-tagged
      // literals) → N-Triples serialisation → parse — the full
      // parse ∘ serialise loop, gate-verified against the oracle's
      // direct reconstruction of the typed columns
      val d = t(dir, "documents")
      def subj = concat(lit("http://example.org/doc/"), col("doc_id"))
      val xsd = graft.sources.RdfTerms.XsdNs
      def nul = lit(null).cast("string")
      val stmts = d.select(subj.as("subject"),
          lit("http://purl.org/dc/terms/language").as("predicate"),
          concat(lit("http://lexvo.org/id/iso639-1/"), col("lang")).as("object"),
          lit("iri").as("okind"), nul.as("lang"), nul.as("datatype"))
        .unionAll(d.select(subj.as("subject"),
          lit("http://example.org/meta#n_chars").as("predicate"),
          col("n_chars").cast("string").as("object"),
          lit("literal").as("okind"), nul.as("lang"),
          lit(xsd + "integer").as("datatype")))
        .unionAll(d.select(subj.as("subject"),
          lit("http://purl.org/dc/terms/title").as("predicate"),
          substring(col("text"), 1, 8).as("object"),
          lit("literal").as("okind"), col("lang").as("lang"),
          nul.as("datatype")))
      val root = s"${sys.props("java.io.tmpdir")}/graft-q88-" +
        s"${s.sparkContext.applicationId}-" + dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.NQuads.write(stmts, s"$root/out.nt")
      graft.sources.NQuads.read(s, s"$root/out.nt")
        .select("subject", "predicate", "object", "okind", "lang", "datatype")
    }),
    "q89_typed_native" -> ((s, dir) => { implicit val sp = s
      // typed-literal → NATIVE value bridge (Coerce.typedValue over the
      // typed statement model; reference io.clj:60-100 backend→grafter
      // type mapping): the q88 typed frame routed back into relational
      // aggregation — xsd:integer literals summed as numbers, language
      // tags counted — proving the okind/datatype columns carry usable
      // semantics, not just lexical round-trip fidelity
      val d = t(dir, "documents")
      def subj = concat(lit("http://example.org/doc/"), col("doc_id"))
      val xsd = graft.sources.RdfTerms.XsdNs
      def nul = lit(null).cast("string")
      val stmts = d.select(subj.as("subject"),
          lit("http://purl.org/dc/terms/language").as("predicate"),
          concat(lit("http://lexvo.org/id/iso639-1/"), col("lang")).as("object"),
          lit("iri").as("okind"), nul.as("lang"), nul.as("datatype"))
        .unionAll(d.select(subj.as("subject"),
          lit("http://example.org/meta#n_chars").as("predicate"),
          col("n_chars").cast("string").as("object"),
          lit("literal").as("okind"), nul.as("lang"),
          lit(xsd + "integer").as("datatype")))
        .unionAll(d.select(subj.as("subject"),
          lit("http://purl.org/dc/terms/title").as("predicate"),
          substring(col("text"), 1, 8).as("object"),
          lit("literal").as("okind"), col("lang").as("lang"),
          nul.as("datatype")))
      stmts.groupBy(col("predicate")).agg(
        count(lit(1)).as("cnt"),
        sum(graft.coerce.Coerce.typedValue(col("object"), col("datatype"),
          xsd + "integer")).cast("long").as("sum_int"),
        count(col("lang")).as("n_lang"))
    }),
    "q90_ttl_document" -> ((s, dir) => { implicit val sp = s
      // DOCUMENT-oriented Turtle loop: statements serialise with CURIE
      // compaction + @prefix header (Turtle.write), then parse back
      // through the third-party document reader (statement-terminator
      // splitting + list state machine, Turtle.readDocument) — the gate
      // proves write ∘ readDocument = id including CURIE resolution,
      // against the oracle's direct reconstruction
      val d = t(dir, "documents")
      val m = Map("doc" -> "http://example.org/doc/",
        "dct" -> "http://purl.org/dc/terms/")
      val stmts = d.select(
          concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
          lit("http://purl.org/dc/terms/language").as("predicate"),
          col("lang").as("object"))
        .unionAll(d.select(
          concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
          lit(graft.sources.Turtle.RdfType).as("predicate"),
          col("source").as("object")))
      val root = s"${sys.props("java.io.tmpdir")}/graft-q90-" +
        s"${s.sparkContext.applicationId}-" + dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Turtle.write(stmts, s"$root/out.ttl", m)
      graft.sources.Turtle.readDocument(s, s"$root/out.ttl")
        .select("subject", "predicate", "object")
    }),
    "q80_jsonld" -> ((s, dir) => { implicit val sp = s
      // JSON-LD flat line serialisation (formats.clj:8-19 :jsonld):
      // triple nodes + @graph-wrapped quad nodes, escaping shared with
      // the N-family (the DuckDB twin replays the same replace chain)
      val d = t(dir, "documents")
      val triples = d.select(
        concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
        lit("http://purl.org/dc/terms/language").as("predicate"),
        col("lang").as("object"),
        lit(null).cast("string").as("source"))
      val quads = d.select(
        concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
        lit("http://example.org/meta#head").as("predicate"),
        substring(col("text"), 1, 12).as("object"),
        concat(lit("http://example.org/source/"), col("source")).as("source"))
      graft.sources.JsonLd.serialize(triples.unionAll(quads))
    }),
    "q81_rdfxml" -> ((s, dir) => { implicit val sp = s
      // RDF/XML serialisation (formats.clj:8-19 :rdf): QName split at
      // the longest XML-name suffix, per-element default xmlns, XML
      // entity + character-reference escaping mirrored in the oracle
      val d = t(dir, "documents")
      val stmts = d.select(
          concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
          lit("http://purl.org/dc/terms/language").as("predicate"),
          col("lang").as("object"))
        .unionAll(d.select(
          concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
          lit("http://example.org/meta#head").as("predicate"),
          substring(col("text"), 1, 12).as("object")))
      graft.sources.RdfXml.serialize(stmts)
    }),
    "q82_trix" -> ((s, dir) => { implicit val sp = s
      // TriX serialisation (formats.clj:8-19 :trix): one single-statement
      // graph block per quad, XML escaping shared with RDF/XML
      val d = t(dir, "documents")
      val stmts = d.select(
        concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
        lit("http://example.org/meta#head").as("predicate"),
        substring(col("text"), 1, 12).as("object"),
        concat(lit("http://example.org/source/"), col("source")).as("source"))
      graft.sources.Trix.serialize(stmts)
    }),
    "q83_rdfjson" -> ((s, dir) => { implicit val sp = s
      // RDF/JSON serialisation (formats.clj:138-159 :rj): one W3C
      // subject-keyed object per line, escaping shared with JSON-LD
      val d = t(dir, "documents")
      val stmts = d.select(
        concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
        lit("http://purl.org/dc/terms/language").as("predicate"),
        col("lang").as("object"))
      graft.sources.RdfJson.serialize(stmts)
    }),
    "q84_brf" -> ((s, dir) => { implicit val sp = s
      // binary statement records (formats.clj:138-152 :brf): length-
      // delimited UTF-8 terms, base64-armored one record per line —
      // the oracle rebuilds the exact bytes with DuckDB's blob algebra,
      // so flag/length/encoding layout is pinned cross-engine
      val d = t(dir, "documents")
      val stmts = d.select(
        concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
        lit("http://example.org/meta#head").as("predicate"),
        substring(col("text"), 1, 12).as("object"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("http://example.org/source/"), col("source")))
          .otherwise(lit(null).cast("string")).as("source"))
      graft.sources.BinaryRdf.serialize(stmts)
    }),
    "q79_http_negotiated" -> ((s, dir) => { implicit val sp = s
      // SPARQL-over-HTTP transport recast (S9) + mime negotiation over
      // the open format registry (E3) + comment-stripping parsers (C2)
      // in ONE loop: statements served over loop-back HTTP with a `#`
      // banner line, fetched with Accept: text/turtle, parsed back
      // through the body's own @prefix header. The oracle recomputes the
      // statements directly — the transport must be an exact identity.
      val d = t(dir, "documents")
      val stmts = d.select(
          concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
          lit("http://purl.org/dc/terms/language").as("predicate"),
          col("lang").as("object"))
        .unionAll(d.select(
          concat(lit("http://example.org/doc/"), col("doc_id")).as("subject"),
          lit(graft.sources.Turtle.RdfType).as("predicate"),
          col("source").as("object")))
      val srv = graft.sources.Http.serve(stmts,
        Map("doc" -> "http://example.org/doc/",
          "dct" -> "http://purl.org/dc/terms/"))
      try
        graft.sources.Http.read(s, srv.url, accept = Seq("text/turtle"))
          // plain-literal feed: project the legacy statement columns (the
          // typed okind/lang/datatype model is oracled by q88)
          .select("subject", "predicate", "object")
          .localCheckpoint() // materialise before the server stops
      finally srv.stop()
    }),
    "q52_temporal_offsets" -> ((s, dir) => { implicit val sp = s
      // OffsetTime/OffsetDate structs (C5): zone-preserving temporal
      // coercion; lexical forms synthesised deterministically per row
      import graft.coerce.Coerce
      val zone = when(pmod(col("event_id"), lit(3)) === 0, "Z")
        .when(pmod(col("event_id"), lit(3)) === 1, "+05:30")
        .otherwise("")
      val lex = concat(date_format(col("ts"), "HH:mm:ss"), zone)
      val ot = Coerce.offsetTime(lex)
      val od = Coerce.offsetDate(concat(date_format(col("ts"), "yyyy-MM-dd"), zone))
      t(dir, "events").select(col("event_id"),
        ot.getField("nanos").as("t_nanos"),
        ot.getField("offsetSeconds").as("t_off"),
        od.getField("date").cast("string").as("d_date"),
        od.getField("offsetSeconds").as("d_off"))
    }),
    "q50_inference" -> ((s, dir) => { implicit val sp = s
      // forward-chaining materialised view (E5): membership propagates
      // through subset containment to fixpoint
      val base = t(dir, "nation").select(
          concat(lit("n"), col("n_nationkey")).as("s"),
          lit("memberOf").as("p"),
          concat(lit("r"), col("n_regionkey")).as("o"))
        .unionAll(t(dir, "region").select(
          concat(lit("r"), col("r_regionkey")).as("s"),
          lit("subsetOf").as("p"), lit("world").as("o")))
      val rule = (cur: DataFrame) => {
        val members = cur.filter(col("p") === "memberOf")
          .select(col("s").as("x"), col("o").as("g"))
        val subsets = cur.filter(col("p") === "subsetOf")
          .select(col("s").as("g"), col("o").as("h"))
        members.join(subsets, "g")
          .select(col("x").as("s"), lit("memberOf").as("p"), col("h").as("o"))
      }
      graft.operators.Inference.materialize(base, rule)
    }),
    // incrementally maintained aggregate view over the CDC log: bootstrap
    // on chunk 0, then per-chunk changelog folds (before-image retraction,
    // group migration, tombstones) — never a recompute. The oracle IS the
    // recompute: groupBy over the LWW winners of the whole feed.
    "q85_matview" -> ((s, dir) => CdcQueries.matviewBySource(s, dir)),
    // non-decomposable twin: min/max/count-distinct via affected-group
    // recompute (deletes can RAISE a min — retraction arithmetic can't)
    "q86_matview_minmax" -> ((s, dir) => CdcQueries.matviewMinMax(s, dir)),
    // keyed enrichment view: two independently-replayed CDC tables
    // assembled by incremental JoinView folds; oracle = the fresh join
    "q87_joinview" -> ((s, dir) => CdcQueries.joinViewEnrich(s, dir))
  )

  /** DuckDB twin of [[graft.operators.DedupOps.hammingHex64]]: 16 fixed
    * nibble-XOR popcount-lookup terms (same lookup table both engines).
    */
  private def duckHamming(a: String, b: String): String =
    (0 until 16).map { i =>
      s"CAST(substr('0112122312232334', xor(" +
        s"strpos('0123456789abcdef', substr($a, ${i + 1}, 1)) - 1, " +
        s"strpos('0123456789abcdef', substr($b, ${i + 1}, 1)) - 1) + 1, 1) AS INT)"
    }.mkString(" + ")

  /** DuckDB twin of the float-cosine dot subqueries (dab/daa/dbb select
    * fragment) the qd32 oracle established as hash-exact against the
    * native [[graft.functions.DotProduct]] fold.
    */
  private def duckCosDots(a: String, b: String): String =
    s"""(SELECT sum(CAST(x.a AS DOUBLE) * CAST(x.b AS DOUBLE))
        FROM (SELECT unnest($a) AS a, unnest($b) AS b) x) AS dab,
       (SELECT sum(CAST(x.a AS DOUBLE) * CAST(x.a AS DOUBLE))
        FROM (SELECT unnest($a) AS a) x) AS daa,
       (SELECT sum(CAST(x.b AS DOUBLE) * CAST(x.b AS DOUBLE))
        FROM (SELECT unnest($b) AS b) x) AS dbb"""

  /** DuckDB twin of [[graft.operators.Similarity.intCosine]]: exact
    * integer dots (sum(BIGINT) is exact in both engines) pushed through
    * the same IEEE double ops — bit-identical scores, so argmax/rank
    * decisions can never diverge between engine and oracle.
    */
  private def duckIntCosine(a: String, b: String): String =
    s"""(CAST((SELECT sum(x.a*x.b) FROM (SELECT unnest($a) AS a, unnest($b) AS b) x) AS DOUBLE)
        / (sqrt(CAST((SELECT sum(x.a*x.a) FROM (SELECT unnest($a) AS a) x) AS DOUBLE))
         * sqrt(CAST((SELECT sum(x.b*x.b) FROM (SELECT unnest($b) AS b) x) AS DOUBLE))))"""

  /** DuckDB twin of [[graft.operators.Similarity.quantize]]. */
  private val duckQuantize =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT))"

  /** The ±1 hyperplane literal for LSH plane `j` — generated from the SAME
    * `mix64` constants [[graft.operators.Similarity.lshBucket]] uses, so
    * the oracle's bucket assignment is the engine's by construction.
    */
  private def duckPlaneLit(dim: Int, j: Int, seed: Long): String =
    (0 until dim).map { d =>
      val h = graft.feed.EventGen.mix64(seed ^ (j.toLong << 32) ^ d.toLong)
      if ((h & 1L) == 0L) "1.0" else "-1.0"
    }.mkString("[", ", ", "]")

  /** DuckDB twin of [[graft.operators.Similarity.lshBucket]]: per plane,
    * a float×(±1) dot in double (sequential sum both engines) signed into
    * bit 2^j. Plane vectors are inlined literals — data-independent, so
    * the SQL is still a pure function of the parquet tables.
    */
  private def duckLshBucket(vec: String, dim: Int, bits: Int, seed: Long): String =
    (0 until bits).map { j =>
      val dot = s"(SELECT sum(CAST(x.u AS DOUBLE) * x.p) FROM (SELECT unnest($vec) AS u, " +
        s"unnest(CAST(${duckPlaneLit(dim, j, seed)} AS DOUBLE[])) AS p) x)"
      s"(CASE WHEN $dot > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** The IVF oracle: quantize → md5-ranked sample → one exact-integer
    * Lloyd round → full assignment → nprobe=2 probe → exact score.
    * Shared by qd40 (in-memory) and qd59 (lake-resident) — both run
    * the same deterministic pipeline.
    */
  private lazy val ivfOracle: String =
    s"""WITH emb AS (SELECT vec_id, embedding, $duckQuantize AS qv FROM embeddings),
         samp AS (SELECT vec_id, qv, md5('kseed:42:' || CAST(vec_id AS VARCHAR)) AS r
           FROM emb ORDER BY r, vec_id LIMIT 256),
         c0 AS (SELECT CAST(row_number() OVER (ORDER BY r, vec_id) - 1 AS INT) AS cell,
             qv AS cvec
           FROM (SELECT * FROM samp ORDER BY r, vec_id LIMIT 4)),
         a1 AS (SELECT s.vec_id, s.qv, c.cell, ${duckIntCosine("s.qv", "c.cvec")} AS csim
           FROM samp s, c0 c),
         w1 AS (SELECT cell, qv FROM (SELECT cell, qv,
             row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn
           FROM a1) WHERE rn = 1),
         m1 AS (SELECT cell, p.p AS pos,
             CAST(floor(CAST(sum(qv[p.p]) AS DOUBLE)/count(*)) AS BIGINT) AS m
           FROM w1, (SELECT unnest(generate_series(1, 64)) AS p) p
           GROUP BY cell, p.p),
         c1v AS (SELECT cell, list(m ORDER BY pos) AS nvec FROM m1 GROUP BY cell),
         c1 AS (SELECT c0.cell, COALESCE(c1v.nvec, c0.cvec) AS cvec
           FROM c0 LEFT JOIN c1v USING (cell)),
         af AS (SELECT e.vec_id, e.embedding, c.cell,
             ${duckIntCosine("e.qv", "c.cvec")} AS csim
           FROM emb e, c1 c),
         wf AS (SELECT vec_id, embedding, cell FROM (SELECT vec_id, embedding, cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn
           FROM af) WHERE rn = 1),
         qs AS (SELECT e.vec_id AS qid, e.embedding AS qvec, c.cell,
             ${duckIntCosine("e.qv", "c.cvec")} AS csim
           FROM emb e, c1 c WHERE e.vec_id < 8),
         probes AS (SELECT qid, qvec, cell AS qcell FROM (SELECT qid, qvec, cell,
             row_number() OVER (PARTITION BY qid ORDER BY csim DESC, cell ASC) AS pr
           FROM qs) WHERE pr <= 2),
         pairs AS (SELECT p.qid, w.vec_id AS nid, ${duckCosDots("p.qvec", "w.embedding")}
           FROM wf w JOIN probes p ON w.cell = p.qcell AND w.vec_id <> p.qid),
         sims AS (SELECT qid, nid, floor((dab / sqrt(daa * dbb))*10000 + 0.5)/10000 AS sim FROM pairs),
         ranked AS (SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
           FROM sims)
         SELECT qid, nid, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 3"""

  def oracleSql: Map[String, String] = Map(
    "q01_agg_filter" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         count(*) AS cnt
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS cnt,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q03_chain_join" ->
      """SELECT s_name, n_name, r_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey""",
    "q04_topk" ->
      """SELECT c_custkey, c_name,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name
         ORDER BY revenue DESC, c_custkey ASC LIMIT 10""",
    "q05_window_latest" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1""",
    "q06_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
         FROM lineitem""",
    "q07_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'""",
    "q08_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'""",
    "q09_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q10_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q11_values_in" ->
      """SELECT l_returnflag, count(*) AS cnt,
         CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
         FROM lineitem WHERE l_returnflag IN ('A','R') GROUP BY l_returnflag""",
    "q12_limit_offset" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
         FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 10""",
    "q13_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q14_union_all" ->
      """SELECT event_id, 'click' AS kind, user_id FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT event_id, 'view' AS kind, user_id FROM events WHERE event_type = 'view'""",
    "q15_coercions" ->
      """SELECT event_id,
         CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v_dec,
         CAST(floor(value) AS BIGINT) AS v_floor,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v_str,
         value > 100 AS is_big,
         CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m, CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h
         FROM events""",
    "q16_json" ->
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
         count(*) AS cnt FROM events GROUP BY event_type""",
    "q17_templater" ->
      """SELECT doc_id, 'lang' AS predicate, lang AS object, source FROM documents
         UNION ALL
         SELECT doc_id, 'n_chars' AS predicate, CAST(n_chars AS VARCHAR) AS object, source FROM documents
         UNION ALL
         SELECT doc_id, 'text_head' AS predicate, substr(text, 1, 16) AS object, source FROM documents""",
    "q18_closure" ->
      """WITH RECURSIVE e(src, dst) AS (
           SELECT CAST(n_nationkey AS INT), CAST(n_regionkey + 100 AS INT) FROM nation
           UNION ALL
           SELECT CAST(r_regionkey + 100 AS INT), 999 FROM region
         ), tc(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT tc.src, e.dst FROM tc JOIN e ON tc.dst = e.src
         ) SELECT src, dst FROM tc""",
    "q19_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
         GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q20_stats" ->
      """SELECT event_type, floor((stddev_samp(value))*10000 + 0.5)/10000 AS sd,
         floor((avg(value))*10000 + 0.5)/10000 AS mean, floor((min(value))*10000 + 0.5)/10000 AS mn,
         floor((max(value))*10000 + 0.5)/10000 AS mx
         FROM events GROUP BY event_type""",
    "q21_lww" ->
      """SELECT CAST(user_id AS VARCHAR) AS doc_id, event_id AS lsn,
         event_type AS source FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
           FROM events) WHERE rn = 1""",
    "q22_lww_salted" ->
      """SELECT CAST(user_id AS VARCHAR) AS doc_id, event_id AS lsn,
         event_type AS source FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
           FROM events) WHERE rn = 1""",
    "q23_cdc_e2e" ->
      """SELECT CAST(user_id AS VARCHAR) AS doc_id,
         CAST(floor(value * 100) AS INT) AS tok0, 1 AS n_tok,
         event_type AS source FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
           FROM events) WHERE rn = 1 AND event_type <> 'error'""",
    "qt24_tokenstats" ->
      """SELECT doc_id,
         (length(text) - length(replace(text, ' ', ''))) + 1 AS n_words,
         len(regexp_extract_all(text, '[a-z]+')) + len(regexp_extract_all(text, '[0-9]+')) AS n_runs
         FROM documents""",
    "qt25_langid" ->
      """SELECT doc_id, lang AS labeled,
         CASE WHEN en >= es AND en >= de AND en > 0 THEN 'en'
              WHEN es >= de AND es > 0 THEN 'es'
              WHEN de > 0 THEN 'de' ELSE 'unk' END AS lang_pred
         FROM (SELECT doc_id, lang,
           CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS INT)
             + CAST((length(text) - length(replace(text, ' and ', ''))) / 5 AS INT) AS en,
           CAST((length(text) - length(replace(text, ' el ', ''))) / 4 AS INT)
             + CAST((length(text) - length(replace(text, ' de ', ''))) / 4 AS INT) AS es,
           CAST((length(text) - length(replace(text, ' der ', ''))) / 5 AS INT)
             + CAST((length(text) - length(replace(text, ' und ', ''))) / 5 AS INT) AS de
           FROM documents)""",
    "qt26_quality" ->
      """WITH f AS (SELECT doc_id, length(text) AS len,
           (length(text) - length(replace(text, ' ', ''))) + 1 AS nw,
           CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS INT)
             + CAST((length(text) - length(replace(text, ' a ', ''))) / 3 AS INT)
             + CAST((length(text) - length(replace(text, ' of ', ''))) / 4 AS INT)
             + CAST((length(text) - length(replace(text, ' and ', ''))) / 5 AS INT) AS stops
           FROM documents)
         SELECT doc_id, len,
           floor((CAST(len - (nw - 1) AS DOUBLE) / CAST(nw AS DOUBLE))*10000 + 0.5)/10000 AS mean_word_len,
           floor((CAST(stops AS DOUBLE) / CAST(nw AS DOUBLE))*10000 + 0.5)/10000 AS stop_ratio,
           floor((least(1.0, CAST(len AS DOUBLE) / 400.0) * 0.5
             + least(1.0, round(CAST(stops AS DOUBLE) / CAST(nw AS DOUBLE), 4) * 10.0) * 0.3
             + CASE WHEN round(CAST(len - (nw - 1) AS DOUBLE) / CAST(nw AS DOUBLE), 4)
                 BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END)*10000 + 0.5)/10000 AS quality
         FROM f""",
    "qt27_fingerprint" ->
      """SELECT d.doc_id, min(md5(substr(d.tx, gs.i, 8))) AS fp
         FROM (SELECT doc_id, substr(text, 1, 64) AS tx FROM documents) d,
              (SELECT unnest(generate_series(1, 64)) AS i) gs
         WHERE gs.i <= greatest(1, length(d.tx) - 7)
         GROUP BY d.doc_id""",
    "qd28_dedup_exact" ->
      """SELECT md5(substr(text, 1, 24)) AS h, min(doc_id) AS canonical_id,
         count(*) AS cluster_size FROM documents GROUP BY md5(substr(text, 1, 24))""",
    "qd29_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 40) AS tx FROM documents WHERE doc_id < 40),
         g AS (SELECT DISTINCT d.doc_id, substr(d.tx, gs.i, 3) AS gram
               FROM d, (SELECT unnest(generate_series(1, 40)) AS i) gs
               WHERE gs.i <= greatest(1, length(d.tx) - 2)),
         sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
         p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
               FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
               GROUP BY a.doc_id, b.doc_id)
         SELECT id1, id2,
           floor((CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE))*10000 + 0.5)/10000 AS jaccard
         FROM p JOIN sz s1 ON p.id1 = s1.doc_id JOIN sz s2 ON p.id2 = s2.doc_id
         WHERE floor((CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE))*10000 + 0.5)/10000 >= 0.04""",
    "qd30_minhash_lsh" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 40) AS tx FROM documents WHERE doc_id < 60),
         g AS (SELECT DISTINCT d.doc_id, substr(d.tx, gs.i, 3) AS gram
               FROM d, (SELECT unnest(generate_series(1, 40)) AS i) gs
               WHERE gs.i <= greatest(1, length(d.tx) - 2)),
         mh AS (SELECT g.doc_id, sd.seed,
                  min(md5(CAST(sd.seed AS VARCHAR) || g.gram)) AS mh
                FROM g, (SELECT unnest(generate_series(0, 7)) AS seed) sd
                GROUP BY g.doc_id, sd.seed),
         banded AS (SELECT doc_id, CAST(floor(seed / 2.0) AS INT) AS band,
                  md5(array_to_string(array_agg(
                    lpad(CAST(seed AS VARCHAR), 4, '0') || ':' || mh
                    ORDER BY lpad(CAST(seed AS VARCHAR), 4, '0') || ':' || mh), ',')) AS bkey
                FROM mh GROUP BY doc_id, CAST(floor(seed / 2.0) AS INT))
         SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id""",
    "qd31_simhash" ->
      """WITH w AS (SELECT doc_id, md5(word) AS h FROM (
             SELECT doc_id, unnest(string_split(substr(text, 1, 64), ' ')) AS word
             FROM documents) WHERE length(word) > 0),
         bits AS (SELECT doc_id, j.j, sum(CASE WHEN substr(h, j.j + 1, 1) IN
             ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v
           FROM w, (SELECT unnest(generate_series(0, 15)) AS j) j
           GROUP BY doc_id, j.j)
         SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN pow(2.0, j) ELSE 0.0 END) AS INT) AS simhash
         FROM bits GROUP BY doc_id""",
    "qd42_simhash64" ->
      """WITH w AS (SELECT doc_id, substr(md5(word), 1, 16) AS h FROM (
             SELECT doc_id, unnest(string_split(substr(text, 1, 64), ' ')) AS word
             FROM documents) WHERE length(word) > 0),
         bits AS (SELECT doc_id, j.j,
             sum(CASE WHEN CAST(floor(CAST(strpos('0123456789abcdef',
                   substr(h, CAST(floor(j.j/4.0) AS INT)+1, 1)) - 1 AS DOUBLE)
                 / (CASE WHEN j.j%4=0 THEN 8 WHEN j.j%4=1 THEN 4
                         WHEN j.j%4=2 THEN 2 ELSE 1 END)) AS INT) % 2 = 1
               THEN 1 ELSE -1 END) AS v
           FROM w, (SELECT unnest(generate_series(0, 63)) AS j) j
           GROUP BY doc_id, j.j),
         nibs AS (SELECT doc_id, CAST(floor(j/4.0) AS INT) AS i,
             sum(CASE WHEN v > 0 THEN (CASE WHEN j%4=0 THEN 8 WHEN j%4=1 THEN 4
                 WHEN j%4=2 THEN 2 ELSE 1 END) ELSE 0 END) AS nv
           FROM bits GROUP BY doc_id, CAST(floor(j/4.0) AS INT))
         SELECT doc_id,
           string_agg(substr('0123456789abcdef', CAST(nv AS INT)+1, 1), '' ORDER BY i) AS simhash
         FROM nibs GROUP BY doc_id""",
    "qd45_simhash_band" ->
      """WITH w AS (SELECT doc_id, substr(md5(word), 1, 16) AS h FROM (
             SELECT doc_id, unnest(string_split(substr(text, 1, 64), ' ')) AS word
             FROM documents) WHERE length(word) > 0),
         bits AS (SELECT doc_id, j.j,
             sum(CASE WHEN CAST(floor(CAST(strpos('0123456789abcdef',
                   substr(h, CAST(floor(j.j/4.0) AS INT)+1, 1)) - 1 AS DOUBLE)
                 / (CASE WHEN j.j%4=0 THEN 8 WHEN j.j%4=1 THEN 4
                         WHEN j.j%4=2 THEN 2 ELSE 1 END)) AS INT) % 2 = 1
               THEN 1 ELSE -1 END) AS v
           FROM w, (SELECT unnest(generate_series(0, 63)) AS j) j
           GROUP BY doc_id, j.j),
         nibs AS (SELECT doc_id, CAST(floor(j/4.0) AS INT) AS i,
             sum(CASE WHEN v > 0 THEN (CASE WHEN j%4=0 THEN 8 WHEN j%4=1 THEN 4
                 WHEN j%4=2 THEN 2 ELSE 1 END) ELSE 0 END) AS nv
           FROM bits GROUP BY doc_id, CAST(floor(j/4.0) AS INT)),
         sh AS (SELECT doc_id,
             string_agg(substr('0123456789abcdef', CAST(nv AS INT)+1, 1), '' ORDER BY i) AS simhash
           FROM nibs GROUP BY doc_id),
         blocks AS (SELECT doc_id, b.b AS blk, substr(simhash, b.b*4 + 1, 4) AS bval
           FROM sh, (SELECT unnest(generate_series(0, 3)) AS b) b)
         SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2
         FROM blocks a JOIN blocks b2
           ON a.blk = b2.blk AND a.bval = b2.bval AND a.doc_id < b2.doc_id""",
    "qd53_simhash_verified" ->
      s"""WITH w AS (SELECT doc_id, substr(md5(word), 1, 16) AS h FROM (
             SELECT doc_id, unnest(string_split(substr(text, 1, 64), ' ')) AS word
             FROM documents) WHERE length(word) > 0),
         bits AS (SELECT doc_id, j.j,
             sum(CASE WHEN CAST(floor(CAST(strpos('0123456789abcdef',
                   substr(h, CAST(floor(j.j/4.0) AS INT)+1, 1)) - 1 AS DOUBLE)
                 / (CASE WHEN j.j%4=0 THEN 8 WHEN j.j%4=1 THEN 4
                         WHEN j.j%4=2 THEN 2 ELSE 1 END)) AS INT) % 2 = 1
               THEN 1 ELSE -1 END) AS v
           FROM w, (SELECT unnest(generate_series(0, 63)) AS j) j
           GROUP BY doc_id, j.j),
         nibs AS (SELECT doc_id, CAST(floor(j/4.0) AS INT) AS i,
             sum(CASE WHEN v > 0 THEN (CASE WHEN j%4=0 THEN 8 WHEN j%4=1 THEN 4
                 WHEN j%4=2 THEN 2 ELSE 1 END) ELSE 0 END) AS nv
           FROM bits GROUP BY doc_id, CAST(floor(j/4.0) AS INT)),
         sh AS (SELECT doc_id,
             string_agg(substr('0123456789abcdef', CAST(nv AS INT)+1, 1), '' ORDER BY i) AS simhash
           FROM nibs GROUP BY doc_id),
         blocks AS (SELECT doc_id, b.b AS blk, substr(simhash, b.b*4 + 1, 4) AS bval, simhash
           FROM sh, (SELECT unnest(generate_series(0, 3)) AS b) b),
         cand AS (SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2,
             a.simhash AS sh1, b2.simhash AS sh2
           FROM blocks a JOIN blocks b2
             ON a.blk = b2.blk AND a.bval = b2.bval AND a.doc_id < b2.doc_id)
         SELECT id1, id2, dist FROM (
           SELECT id1, id2, ${duckHamming("sh1", "sh2")} AS dist FROM cand)
         WHERE dist <= 3""",
    "qd32_embed_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 8),
         pairs AS (SELECT q.qid, e.vec_id AS nid,
             (SELECT sum(CAST(x.a AS DOUBLE) * CAST(x.b AS DOUBLE))
              FROM (SELECT unnest(q.qvec) AS a, unnest(e.embedding) AS b) x) AS dab,
             (SELECT sum(CAST(x.a AS DOUBLE) * CAST(x.a AS DOUBLE))
              FROM (SELECT unnest(q.qvec) AS a) x) AS daa,
             (SELECT sum(CAST(x.b AS DOUBLE) * CAST(x.b AS DOUBLE))
              FROM (SELECT unnest(e.embedding) AS b) x) AS dbb
           FROM embeddings e, q WHERE e.vec_id <> q.qid),
         sims AS (SELECT qid, nid, floor((dab / sqrt(daa * dbb))*10000 + 0.5)/10000 AS sim FROM pairs),
         ranked AS (SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
           FROM sims)
         SELECT qid, nid, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 3""",
    // qd33: the LSH planes are deterministic ±1 literals, so the bucket
    // assignment is SQL-expressible and the WHOLE approximate pipeline
    // (bucket → multiprobe → score → rank) is exactly checkable
    "qd33_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding,
             ${duckLshBucket("embedding", 64, 4, 42L)} AS bucket FROM embeddings),
         q AS (SELECT vec_id AS qid, embedding AS qvec, bucket AS qbucket
           FROM b WHERE vec_id < 8),
         probes AS (SELECT qid, qvec, xor(qbucket, f.f) AS qbucket
           FROM q, (SELECT unnest([0, 1, 2, 4, 8]) AS f) f),
         pairs AS (SELECT p.qid, e.vec_id AS nid, ${duckCosDots("p.qvec", "e.embedding")}
           FROM b e JOIN probes p ON e.bucket = p.qbucket AND e.vec_id <> p.qid),
         sims AS (SELECT qid, nid, floor((dab / sqrt(daa * dbb))*10000 + 0.5)/10000 AS sim FROM pairs),
         ranked AS (SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
           FROM sims)
         SELECT qid, nid, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 3""",
    // qd57: LSH-bucket candidates + exact cosine verify, same plane trick
    "qd57_neardup_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding,
             ${duckLshBucket("embedding", 64, 2, 42L)} AS bucket FROM embeddings),
         pairs AS (SELECT a.vec_id AS id1, b2.vec_id AS id2,
             ${duckCosDots("a.embedding", "b2.embedding")}
           FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
         sims AS (SELECT id1, id2, floor((dab / sqrt(daa * dbb))*10000 + 0.5)/10000 AS sim FROM pairs)
         SELECT id1, id2, sim FROM sims WHERE sim >= 0.35""",
    "qd61_seqpack" ->
      """WITH d AS (SELECT doc_id, source,
             list_transform(string_split(text, ' '), w -> CAST(length(w) AS INT)) AS toks
           FROM documents),
         offs AS (SELECT source, doc_id, toks,
             COALESCE(SUM(len(toks) + 1) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM d),
         tk AS (SELECT source, off + g.p - 1 AS gpos,
             CASE WHEN g.p <= len(toks) THEN toks[g.p] ELSE -1 END AS tok
           FROM offs, LATERAL (SELECT unnest(generate_series(1, len(toks) + 1)) AS p) g)
         SELECT source, CAST(floor(gpos / 512.0) AS BIGINT) AS seq_id,
           CAST(count(*) AS INT) AS n_tok,
           arg_min(tok, gpos) AS first_tok, arg_max(tok, gpos) AS last_tok,
           CAST(sum(tok) AS BIGINT) AS tok_sum
         FROM tk GROUP BY source, seq_id""",
    "qs62_sample_bernoulli" ->
      s"""SELECT doc_id, source FROM documents
         WHERE substr(md5('s62:' || CAST(doc_id AS VARCHAR)), 1, 12)
           < '${operators.Sampling.hexThreshold(0.25)}'""",
    "qs77_sample_large" ->
      """SELECT event_id, user_id FROM events
         ORDER BY substr(md5('s77:' || CAST(event_id AS VARCHAR)), 1, 12),
           event_id
         LIMIT 50000""",
    "qs63_sample_stratified" ->
      s"""SELECT doc_id, lang, source FROM documents
         WHERE substr(md5('s63:' || CAST(doc_id AS VARCHAR)), 1, 12) <
           CASE source WHEN 'src0' THEN '${operators.Sampling.hexThreshold(0.9)}'
                       WHEN 'src1' THEN '${operators.Sampling.hexThreshold(0.3)}'
                       ELSE '${operators.Sampling.hexThreshold(0.1)}' END""",
    "qs64_splits" -> {
      val cuts = operators.Sampling.splitThresholds(
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      s"""WITH a AS (SELECT source, n_chars,
           CASE WHEN substr(md5('s64:' || CAST(doc_id AS VARCHAR)), 1, 12)
                  < '${cuts(0)}' THEN 'train'
                WHEN substr(md5('s64:' || CAST(doc_id AS VARCHAR)), 1, 12)
                  < '${cuts(1)}' THEN 'val'
                ELSE 'test' END AS split
           FROM documents)
         SELECT split, source, count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS chars
         FROM a GROUP BY split, source"""
    },
    "qs67_sample_exactk" ->
      """SELECT doc_id, source FROM documents
         ORDER BY substr(md5('s67:' || CAST(doc_id AS VARCHAR)), 1, 12), doc_id
         LIMIT 100""",
    "qc69_curate" -> {
      val cut = operators.Sampling.splitThresholds(
        Seq("train" -> 0.9, "val" -> 0.1)).head
      s"""WITH f AS (SELECT doc_id, source, text, length(text) AS len,
           (length(text) - length(replace(text, ' ', ''))) + 1 AS nw,
           CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS INT)
             + CAST((length(text) - length(replace(text, ' a ', ''))) / 3 AS INT)
             + CAST((length(text) - length(replace(text, ' of ', ''))) / 4 AS INT)
             + CAST((length(text) - length(replace(text, ' and ', ''))) / 5 AS INT) AS stops
           FROM documents),
         q AS (SELECT doc_id, source, text,
           floor((least(1.0, CAST(len AS DOUBLE) / 400.0) * 0.5
             + least(1.0, round(CAST(stops AS DOUBLE) / CAST(nw AS DOUBLE), 4) * 10.0) * 0.3
             + CASE WHEN round(CAST(len - (nw - 1) AS DOUBLE) / CAST(nw AS DOUBLE), 4)
                 BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END)*10000 + 0.5)/10000 AS quality
           FROM f),
         l AS (SELECT doc_id, source, quality,
           CASE WHEN en >= es AND en >= de AND en > 0 THEN 'en'
                WHEN es >= de AND es > 0 THEN 'es'
                WHEN de > 0 THEN 'de' ELSE 'unk' END AS lang_pred
           FROM (SELECT doc_id, source, quality,
             CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS INT)
               + CAST((length(text) - length(replace(text, ' and ', ''))) / 5 AS INT) AS en,
             CAST((length(text) - length(replace(text, ' el ', ''))) / 4 AS INT)
               + CAST((length(text) - length(replace(text, ' de ', ''))) / 4 AS INT) AS es,
             CAST((length(text) - length(replace(text, ' der ', ''))) / 5 AS INT)
               + CAST((length(text) - length(replace(text, ' und ', ''))) / 5 AS INT) AS de
             FROM q))
         SELECT doc_id, source, quality,
           CASE WHEN substr(md5('c69split:' || CAST(doc_id AS VARCHAR)), 1, 12)
             < '$cut' THEN 'train' ELSE 'val' END AS split
         FROM l
         WHERE quality >= 0.5 AND lang_pred = 'en'
           AND substr(md5('c69:' || CAST(doc_id AS VARCHAR)), 1, 12)
             < '${operators.Sampling.hexThreshold(0.5)}'"""
    },
    "qs68_sample_per_stratum" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source, row_number() OVER (PARTITION BY source
             ORDER BY substr(md5('s68:' || CAST(doc_id AS VARCHAR)), 1, 12),
                      doc_id) AS rn
           FROM documents) WHERE rn <= 20""",
    "qs72_sample_token_budget" ->
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (PARTITION BY source
               ORDER BY substr(md5('s72:' || CAST(doc_id AS VARCHAR)), 1, 12), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM documents) WHERE cum <= 3000""",
    "qt65_docfreq" ->
      """WITH w AS (SELECT doc_id, word FROM (
             SELECT doc_id, unnest(string_split(substr(text, 1, 64), ' ')) AS word
             FROM documents) WHERE length(word) > 0)
         SELECT word, count(DISTINCT doc_id) AS n_docs, count(*) AS n_total
         FROM w GROUP BY word""",
    "qt66_topterms" ->
      """WITH w AS (SELECT doc_id, word FROM (
             SELECT doc_id, unnest(string_split(substr(text, 1, 64), ' ')) AS word
             FROM documents) WHERE length(word) > 0),
         tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
         dfq AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
         n AS (SELECT count(*) AS n_corpus FROM documents),
         s AS (SELECT tf.doc_id, tf.word,
             floor((CAST(tf.tf AS DOUBLE) * CAST(n.n_corpus AS DOUBLE)
               / CAST(dfq.df AS DOUBLE))*10000 + 0.5)/10000 AS score
           FROM tf JOIN dfq ON tf.word = dfq.word CROSS JOIN n),
         r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, word) AS rank FROM s)
         SELECT doc_id, word, score, rank FROM r WHERE rank <= 3""",
    // same deterministic pair graph closed into components: min reachable
    // id via a recursive CTE == the engine's min-label fixpoint
    "qd60_neardup_components" ->
      s"""WITH RECURSIVE b AS (SELECT vec_id, embedding,
             ${duckLshBucket("embedding", 64, 2, 42L)} AS bucket FROM embeddings),
         cand AS (SELECT a.vec_id AS id1, b2.vec_id AS id2,
             ${duckCosDots("a.embedding", "b2.embedding")}
           FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
         sims AS (SELECT id1, id2, floor((dab / sqrt(daa * dbb))*10000 + 0.5)/10000 AS sim FROM cand),
         e0 AS (SELECT id1, id2 FROM sims WHERE sim >= 0.35),
         verts AS (SELECT id1 AS v FROM e0 UNION SELECT id2 FROM e0),
         edges AS (SELECT id1 AS a, id2 AS b FROM e0 UNION ALL SELECT id2, id1 FROM e0),
         r(v, m) AS (
           SELECT v, v FROM verts
           UNION
           SELECT e.b, r.m FROM edges e JOIN r ON e.a = r.v
         )
         SELECT v AS vec_id, min(m) AS comp, (v = min(m)) AS keep
         FROM r GROUP BY v""",
    // qd40: the full IVF pipeline — quantize → md5-ranked sample → one
    // exact-integer Lloyd round → full assignment → nprobe=2 probe →
    // exact score. Every stage deterministic (integer or IEEE-on-integer
    // arithmetic), so the approximate index is oracle-checkable too.
    "qd40_ann_ivf" -> ivfOracle,
    // identical deterministic pipeline over the lake-resident index
    "qd59_ann_ivf_lake" -> ivfOracle,
    "qt75_redact" ->
      """SELECT doc_id,
         len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+')) AS n_emails,
         len(regexp_extract_all(text, 'https?://[^ ]+')) AS n_urls,
         substr(regexp_replace(regexp_replace(text,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+', '<EMAIL>', 'g'),
           'https?://[^ ]+', '<URL>', 'g'), 1, 40) AS head
         FROM documents""",
    "qt74_repetition" ->
      """WITH g AS (SELECT doc_id, substr(tx, gs.i, 8) AS g
           FROM (SELECT doc_id, substr(text, 1, 64) AS tx FROM documents) d,
                (SELECT unnest(generate_series(1, 64)) AS i) gs
           WHERE gs.i <= greatest(1, length(d.tx) - 7))
         SELECT doc_id, count(*) AS n_shingles,
           floor((1.0 - CAST(count(DISTINCT g) AS DOUBLE) / CAST(count(*) AS DOUBLE))*10000 + 0.5)/10000 AS repetition
         FROM g GROUP BY doc_id""",
    "qd73_contamination" ->
      """WITH c AS (SELECT doc_id, substr(text, 1, 48) AS tx FROM documents
             WHERE doc_id % 97 <> 0),
         e AS (SELECT doc_id AS eval_id, substr(text, 1, 48) AS tx FROM documents
             WHERE doc_id % 97 = 0),
         cg AS (SELECT DISTINCT c.doc_id, md5(substr(c.tx, gs.i, 8)) AS g
             FROM c, (SELECT unnest(generate_series(1, 48)) AS i) gs
             WHERE gs.i <= greatest(1, length(c.tx) - 7)),
         eg AS (SELECT DISTINCT e.eval_id, md5(substr(e.tx, gs.i, 8)) AS g
             FROM e, (SELECT unnest(generate_series(1, 48)) AS i) gs
             WHERE gs.i <= greatest(1, length(e.tx) - 7))
         SELECT cg.doc_id, eg.eval_id, count(*) AS n_shared
         FROM cg JOIN eg ON cg.g = eg.g
         GROUP BY cg.doc_id, eg.eval_id""",
    "qv70_vecnorm" ->
      """SELECT vec_id,
         floor(sqrt(daa)*10000 + 0.5)/10000 AS norm,
         floor((CASE WHEN sqrt(daa) > 0
           THEN CAST(embedding[1] AS DOUBLE)/sqrt(daa) ELSE NULL END)*10000 + 0.5)/10000 AS n0
         FROM (SELECT vec_id, embedding,
           (SELECT sum(CAST(x.a AS DOUBLE)*CAST(x.a AS DOUBLE))
            FROM (SELECT unnest(embedding) AS a) x) AS daa
           FROM embeddings)""",
    "qv71_meanpool" ->
      """WITH e AS (SELECT label, embedding, len(embedding) AS n FROM embeddings),
         x AS (SELECT label, CAST(gs.i - 1 AS INT) AS pos,
             CAST(floor(CAST(embedding[gs.i] AS DOUBLE)*1000000 + 0.5) AS BIGINT) AS v
           FROM e, (SELECT unnest(generate_series(1,
             (SELECT max(len(embedding)) FROM embeddings))) AS i) gs
           WHERE gs.i <= n)
         SELECT label, pos,
           floor((CAST(sum(v) AS DOUBLE) / (1000000.0 * CAST(count(*) AS DOUBLE)))*10000 + 0.5)/10000 AS mean
         FROM x GROUP BY label, pos""",
    "qm34_multimodal" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         CAST(octet_length(encode(text)) % 640 AS INT) AS width,
         CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
         3 AS channels,
         floor((CAST(octet_length(encode(text)) AS DOUBLE) / 100.0)*10000 + 0.5)/10000 AS f0,
         floor((CAST(octet_length(encode(text)) % 97 AS DOUBLE) / 97.0)*10000 + 0.5)/10000 AS f1,
         floor((CAST(octet_length(encode(text)) % 31 AS DOUBLE) / 31.0)*10000 + 0.5)/10000 AS f2
         FROM documents""",
    "qm35_framesample" ->
      """SELECT doc_id, CAST(f.frame AS INT) AS frame,
         CAST(floor(f.frame * octet_length(encode(text)) / 4.0) AS INT) + 1 AS boff,
         ascii(substr(text,
           CAST(floor(f.frame * octet_length(encode(text)) / 4.0) AS INT) + 1, 1)) AS sample
         FROM documents, (SELECT unnest(generate_series(0, 3)) AS frame) f""",
    "q36_source_restrict" ->
      """SELECT source, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE source IN ('src0','src1') GROUP BY source""",
    "q37_zero_or_one_path" ->
      """SELECT DISTINCT src, dst FROM (
           SELECT CAST(n_nationkey AS INT) AS src, CAST(n_nationkey AS INT) AS dst FROM nation
           UNION ALL
           SELECT CAST(n_nationkey AS INT), CAST(n_regionkey + 100 AS INT) FROM nation)""",
    "q38_negated_path" ->
      """SELECT DISTINCT user_id AS src, event_id AS dst FROM events
         WHERE event_type NOT IN ('error','signup')""",
    "qm41_resize" ->
      """SELECT doc_id,
         CAST(floor((octet_length(encode(text)) - 1) / 4.0) + 1 AS INT) AS n_bytes_resized,
         ascii(substr(text, 1, 1)) AS first_sample
         FROM documents""",
    "q44_templater_nested" ->
      """SELECT CAST(doc_id AS VARCHAR) AS subject, 'lang' AS predicate,
                lang AS object, 'g' AS source FROM documents
         UNION ALL
         SELECT CAST(doc_id AS VARCHAR), 'meta',
                md5(CAST(doc_id AS VARCHAR) || chr(1) || 'meta'), 'g' FROM documents
         UNION ALL
         SELECT md5(CAST(doc_id AS VARCHAR) || chr(1) || 'meta'), 'n_chars',
                CAST(n_chars AS VARCHAR), 'g' FROM documents
         UNION ALL
         SELECT md5(CAST(doc_id AS VARCHAR) || chr(1) || 'meta'), 'head',
                substr(text, 1, 8), 'g' FROM documents""",
    "q54_templater_deep" ->
      """WITH sk1 AS (SELECT *, md5(CAST(doc_id AS VARCHAR) || chr(1) || 'meta') AS s1
           FROM documents),
         sk2 AS (SELECT *, md5(s1 || chr(1) || 'head') AS s2 FROM sk1)
         SELECT CAST(doc_id AS VARCHAR) AS subject, 'lang' AS predicate,
                lang AS object, 'g' AS source FROM sk2
         UNION ALL
         SELECT CAST(doc_id AS VARCHAR), 'meta', s1, 'g' FROM sk2
         UNION ALL
         SELECT s1, 'n_chars', CAST(n_chars AS VARCHAR), 'g' FROM sk2
         UNION ALL
         SELECT s1, 'head', s2, 'g' FROM sk2
         UNION ALL
         SELECT s2, 'h8', substr(text, 1, 8), 'g' FROM sk2
         UNION ALL
         SELECT s2, 'h4', substr(text, 1, 4), 'g' FROM sk2""",
    "q55_ntriples" ->
      """SELECT '<' || CAST(doc_id AS VARCHAR) || '> <lang> "' ||
           replace(replace(replace(replace(replace(lang,
             '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
           || '" .' AS value FROM documents""",
    "q56_prefix_expand" ->
      """SELECT doc_id,
         'http://example.org/doc/' || CAST(doc_id AS VARCHAR) AS iri,
         'lang:' || lang AS curie
         FROM documents""",
    "q43_path_algebra" ->
      """WITH hop1 AS (
           SELECT CAST(s_suppkey + 10000 AS BIGINT) AS src,
                  CAST(s_nationkey AS BIGINT) AS dst FROM supplier
           UNION ALL
           SELECT CAST(c_custkey + 20000 AS BIGINT), CAST(c_nationkey AS BIGINT) FROM customer),
         hop2 AS (SELECT h.src, CAST(n.n_regionkey + 100 AS BIGINT) AS dst
                  FROM hop1 h JOIN nation n ON h.dst = n.n_nationkey)
         SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM hop2
           UNION ALL
           SELECT src, CAST(999 AS BIGINT) FROM hop2)""",
    "q46_part_stats" ->
      """SELECT p_brand, count(*) AS cnt,
         CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         max(p_size) AS max_size
         FROM part GROUP BY p_brand""",
    "q47_changelog" ->
      """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
         r AS (SELECT lo, hi, CAST(floor((hi - lo + 4) / 4.0) AS BIGINT) AS per FROM b),
         sel AS (SELECT e.* FROM events e, r
                 WHERE e.event_id BETWEEN r.lo + r.per
                   AND least(r.hi, r.lo + 2 * r.per - 1)),
         win AS (SELECT user_id, event_id, event_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                 FROM sel)
         SELECT CAST(user_id AS VARCHAR) AS doc_id, event_id AS win_lsn,
                event_type = 'error' AS tomb, event_type AS source
         FROM win WHERE rn = 1""",
    "q58_lake_source_restrict" ->
      """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
         r AS (SELECT lo, hi, CAST(floor((hi - lo + 4) / 4.0) AS BIGINT) AS per FROM b),
         ch AS (SELECT e.*, CAST(floor((e.event_id - r.lo) / r.per) AS INT) AS chunk
                FROM events e, r),
         win AS (SELECT user_id, event_id, event_type, chunk,
                   row_number() OVER (PARTITION BY user_id, chunk
                                      ORDER BY event_id DESC) AS rn
                 FROM ch)
         SELECT CAST(user_id AS VARCHAR) AS doc_id, event_id AS win_lsn,
                event_type AS source
         FROM win WHERE rn = 1 AND event_type = 'click'""",
    "q48_zero_or_more" ->
      """WITH RECURSIVE e(src, dst) AS (
           SELECT CAST(n_nationkey AS INT), CAST(n_regionkey + 100 AS INT) FROM nation
           UNION ALL
           SELECT CAST(r_regionkey + 100 AS INT), 999 FROM region
         ), tc(src, dst) AS (
           SELECT src, dst FROM e
           UNION
           SELECT tc.src, e.dst FROM tc JOIN e ON tc.dst = e.src
         ), nodes(n) AS (
           SELECT src FROM e UNION SELECT dst FROM e
         ) SELECT src, dst FROM tc
           UNION SELECT n, n FROM nodes""",
    "q49_inverse_path" ->
      """SELECT CAST(n_regionkey + 100 AS INT) AS src, CAST(n_nationkey AS INT) AS dst
         FROM nation""",
    "q51_nquads" ->
      """SELECT '<' || CAST(doc_id AS VARCHAR) || '> <head> "' ||
           replace(replace(replace(replace(replace(substr(text, 1, 12),
             '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
           || '" <g> .' AS value FROM documents
         UNION ALL
         SELECT '<' || CAST(doc_id AS VARCHAR) || '> <lang> "' ||
           replace(replace(replace(replace(replace(lang,
             '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
           || '" <g> .' FROM documents""",
    "q76_turtle" ->
      """SELECT 'doc:' || CAST(doc_id AS VARCHAR) || ' dct:language "' ||
           replace(replace(replace(replace(replace(lang,
             '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
           || '" .' AS value FROM documents
         UNION ALL
         SELECT 'doc:' || CAST(doc_id AS VARCHAR) || ' a "' ||
           replace(replace(replace(replace(replace(source,
             '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
           || '" .' FROM documents
         UNION ALL
         SELECT 'doc:' || CAST(doc_id AS VARCHAR) ||
           ' <http://example.org/meta#n_chars> "' || CAST(n_chars AS VARCHAR)
           || '" .' FROM documents""",
    "q78_trig" ->
      """SELECT 'src:' || source || ' { doc:' || CAST(doc_id AS VARCHAR) ||
           ' <http://example.org/meta#lang> "' ||
           replace(replace(replace(replace(replace(lang,
             '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
           || '" . }' AS value FROM documents""",
    "q88_typed_rdf" ->
      """SELECT 'http://example.org/doc/' || CAST(doc_id AS VARCHAR) AS subject,
           'http://purl.org/dc/terms/language' AS predicate,
           'http://lexvo.org/id/iso639-1/' || lang AS object,
           'iri' AS okind, CAST(NULL AS VARCHAR) AS lang,
           CAST(NULL AS VARCHAR) AS datatype
         FROM documents
         UNION ALL
         SELECT 'http://example.org/doc/' || CAST(doc_id AS VARCHAR),
           'http://example.org/meta#n_chars', CAST(n_chars AS VARCHAR),
           'literal', CAST(NULL AS VARCHAR),
           'http://www.w3.org/2001/XMLSchema#integer'
         FROM documents
         UNION ALL
         SELECT 'http://example.org/doc/' || CAST(doc_id AS VARCHAR),
           'http://purl.org/dc/terms/title', substr(text, 1, 8),
           'literal', lang, CAST(NULL AS VARCHAR)
         FROM documents""",
    "q90_ttl_document" ->
      """SELECT 'http://example.org/doc/' || CAST(doc_id AS VARCHAR) AS subject,
           'http://purl.org/dc/terms/language' AS predicate,
           lang AS object FROM documents
         UNION ALL
         SELECT 'http://example.org/doc/' || CAST(doc_id AS VARCHAR),
           'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
           source FROM documents""",
    "q89_typed_native" ->
      """SELECT 'http://purl.org/dc/terms/language' AS predicate,
           count(*) AS cnt, CAST(NULL AS BIGINT) AS sum_int,
           CAST(0 AS BIGINT) AS n_lang FROM documents
         UNION ALL
         SELECT 'http://example.org/meta#n_chars', count(*),
           CAST(sum(n_chars) AS BIGINT), CAST(0 AS BIGINT) FROM documents
         UNION ALL
         SELECT 'http://purl.org/dc/terms/title', count(*),
           CAST(NULL AS BIGINT), CAST(count(*) AS BIGINT) FROM documents""",
    "q80_jsonld" ->
      """SELECT '{"@id":"http://example.org/doc/' || CAST(doc_id AS VARCHAR) ||
           '","http://purl.org/dc/terms/language":[{"@value":"' ||
           replace(replace(replace(replace(replace(lang,
             '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
           || '"}]}' AS value FROM documents
         UNION ALL
         SELECT '{"@id":"http://example.org/source/' || source ||
           '","@graph":[{"@id":"http://example.org/doc/' || CAST(doc_id AS VARCHAR) ||
           '","http://example.org/meta#head":[{"@value":"' ||
           replace(replace(replace(replace(replace(substr(text, 1, 12),
             '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
           || '"}]}]}' FROM documents""",
    "q81_rdfxml" ->
      """SELECT '<rdf:Description rdf:about="http://example.org/doc/' ||
           CAST(doc_id AS VARCHAR) ||
           '"><language xmlns="http://purl.org/dc/terms/">' ||
           replace(replace(replace(replace(replace(replace(replace(lang,
             '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'),
             chr(10), '&#10;'), chr(13), '&#13;'), chr(9), '&#9;')
           || '</language></rdf:Description>' AS value FROM documents
         UNION ALL
         SELECT '<rdf:Description rdf:about="http://example.org/doc/' ||
           CAST(doc_id AS VARCHAR) ||
           '"><head xmlns="http://example.org/meta#">' ||
           replace(replace(replace(replace(replace(replace(replace(substr(text, 1, 12),
             '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'),
             chr(10), '&#10;'), chr(13), '&#13;'), chr(9), '&#9;')
           || '</head></rdf:Description>' FROM documents""",
    "q82_trix" ->
      """SELECT '<graph><uri>http://example.org/source/' || source ||
           '</uri><triple><uri>http://example.org/doc/' || CAST(doc_id AS VARCHAR) ||
           '</uri><uri>http://example.org/meta#head</uri><plainLiteral>' ||
           replace(replace(replace(replace(replace(replace(replace(substr(text, 1, 12),
             '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'),
             chr(10), '&#10;'), chr(13), '&#13;'), chr(9), '&#9;')
           || '</plainLiteral></triple></graph>' AS value FROM documents""",
    "q83_rdfjson" ->
      """SELECT '{"http://example.org/doc/' || CAST(doc_id AS VARCHAR) ||
           '":{"http://purl.org/dc/terms/language":[{"value":"' ||
           replace(replace(replace(replace(replace(lang,
             '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t')
           || '","type":"literal"}]}}' AS value FROM documents""",
    "q84_brf" ->
      """WITH stmts AS (
           SELECT encode('http://example.org/doc/' || CAST(doc_id AS VARCHAR)) AS s,
                  encode('http://example.org/meta#head') AS p,
                  encode(substr(text, 1, 12)) AS o,
                  CASE WHEN doc_id % 3 = 0
                       THEN encode('http://example.org/source/' || source) END AS g
           FROM documents),
         terms AS (
           SELECT unhex(lpad(to_hex(octet_length(s)), 8, '0')) || s AS ts,
                  unhex(lpad(to_hex(octet_length(p)), 8, '0')) || p AS tp,
                  unhex(lpad(to_hex(octet_length(o)), 8, '0')) || o AS t_o,
                  CASE WHEN g IS NOT NULL
                       THEN unhex(lpad(to_hex(octet_length(g)), 8, '0')) || g END AS tg
           FROM stmts)
         SELECT CASE WHEN tg IS NULL
                     THEN to_base64(unhex('00') || ts || tp || t_o)
                     ELSE to_base64(unhex('01') || ts || tp || t_o || tg)
                END AS value FROM terms""",
    "q79_http_negotiated" ->
      """SELECT 'http://example.org/doc/' || CAST(doc_id AS VARCHAR) AS subject,
           'http://purl.org/dc/terms/language' AS predicate,
           lang AS object FROM documents
         UNION ALL
         SELECT 'http://example.org/doc/' || CAST(doc_id AS VARCHAR),
           'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
           source FROM documents""",
    "q52_temporal_offsets" ->
      """SELECT event_id,
           (CAST(strftime(ts, '%H') AS BIGINT) * 3600
            + CAST(strftime(ts, '%M') AS BIGINT) * 60
            + CAST(strftime(ts, '%S') AS BIGINT)) * 1000000000 AS t_nanos,
           CAST(CASE WHEN event_id % 3 = 0 THEN 0
                WHEN event_id % 3 = 1 THEN 19800 END AS INT) AS t_off,
           strftime(ts, '%Y-%m-%d') AS d_date,
           CAST(CASE WHEN event_id % 3 = 0 THEN 0
                WHEN event_id % 3 = 1 THEN 19800 END AS INT) AS d_off
         FROM events""",
    "q50_inference" ->
      """SELECT CAST('n' || CAST(n_nationkey AS VARCHAR) AS VARCHAR) AS s,
                'memberOf' AS p, 'r' || CAST(n_regionkey AS VARCHAR) AS o FROM nation
         UNION
         SELECT 'r' || CAST(r_regionkey AS VARCHAR), 'subsetOf', 'world' FROM region
         UNION
         SELECT 'n' || CAST(n_nationkey AS VARCHAR), 'memberOf', 'world' FROM nation""",
    "qd39_embed_neardup" ->
      """WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 60),
         pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
             (SELECT sum(CAST(x.u AS DOUBLE) * CAST(x.v AS DOUBLE))
              FROM (SELECT unnest(a.embedding) AS u, unnest(b.embedding) AS v) x) AS dab,
             (SELECT sum(CAST(x.u AS DOUBLE) * CAST(x.u AS DOUBLE))
              FROM (SELECT unnest(a.embedding) AS u) x) AS daa,
             (SELECT sum(CAST(x.v AS DOUBLE) * CAST(x.v AS DOUBLE))
              FROM (SELECT unnest(b.embedding) AS v) x) AS dbb
           FROM sub a JOIN sub b ON a.vec_id < b.vec_id)
         SELECT id1, id2, floor((dab / sqrt(daa * dbb))*10000 + 0.5)/10000 AS sim
         FROM pairs WHERE floor((dab / sqrt(daa * dbb))*10000 + 0.5)/10000 >= 0.75""",
    "q85_matview" ->
      """SELECT event_type AS source, count(*) AS cnt,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_tok0
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY event_id DESC) AS rn FROM events)
         WHERE rn = 1 AND event_type <> 'error'
         GROUP BY 1""",
    "q86_matview_minmax" ->
      """SELECT event_type AS source, count(*) AS cnt,
           min(CAST(floor(value * 100) AS INT)) AS min_tok0,
           max(CAST(floor(value * 100) AS INT)) AS max_tok0,
           count(DISTINCT user_id) AS n_docs
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY event_id DESC) AS rn FROM events)
         WHERE rn = 1 AND event_type <> 'error'
         GROUP BY 1""",
    "q87_joinview" ->
      """WITH d AS (SELECT * FROM
           (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY event_id DESC) AS rn FROM events WHERE event_id % 2 = 0)
           WHERE rn = 1 AND event_type <> 'error'),
         s AS (SELECT * FROM
           (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY event_id DESC) AS rn FROM events WHERE event_id % 2 = 1)
           WHERE rn = 1 AND event_type <> 'error')
         SELECT CAST(d.user_id AS VARCHAR) AS doc_id,
           CAST(floor(d.value * 100) AS INT) AS tok0,
           d.event_type AS source,
           CAST(floor(s.value * 100) AS INT) AS quality,
           s.event_type AS judge
         FROM d LEFT JOIN s ON d.user_id = s.user_id"""
  )
}
