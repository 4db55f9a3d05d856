package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic seeded sampling for corpus curation — the selection ops a
  * training-data pipeline runs before anything else touches 100 TB:
  * Bernoulli subsampling, per-stratum rates, exact-size uniform draws, and
  * stable train/val/test splits.
  *
  * Everything keys off `u(seed, key)`: the first 12 hex chars of
  * `md5(seed ∥ ':' ∥ key)`, a uniform draw in [0, 16^12) that is a pure
  * function of (seed, key). That buys, by construction:
  *  - replay determinism — the same row is kept on every run, every
  *    engine, every partitioning (the reference pins the same property for
  *    its skolem ids, make-graph md5 templating, SURVEY.md §1.4);
  *  - exact oracle twins — DuckDB computes the identical md5 prefix, so
  *    sampling queries hash-match instead of "row count roughly right";
  *  - consistent companion tables — sampling two tables by the same key
  *    and seed keeps them aligned (both sides of a join survive or
  *    neither), which fraction-of-partition sampling cannot do.
  *
  * Scale shape: every op except [[exactK]] is a narrow per-row filter (no
  * shuffle, no state, survives any partitioning); [[exactK]] is a global
  * top-k (TakeOrderedAndProject — per-partition heaps + driver merge of
  * k) for k up to `spark.sql.execution.topKSortFallbackThreshold`
  * (default 10 000), and routes through the two-pass threshold-refine
  * [[exactKLarge]] above it — the sorted set is always ~k rows, never
  * the corpus.
  */
object Sampling {

  private val Digits = 12 // 48 bits of the md5 — ample for rate precision

  /** Lexicographic hex threshold for rate `p`: u < threshold keeps a
    * fraction p of keys. p ≥ 1 returns "g" (sorts above every hex string —
    * keep all); p ≤ 0 returns all-zeros (keep none).
    */
  def hexThreshold(p: Double): String = {
    require(!p.isNaN, "sampling rate must be a number")
    if (p >= 1.0) "g"
    else if (p <= 0.0) "0" * Digits
    else {
      // clamp below 16^12: for p one ulp under 1.0 the product rounds UP
      // to exactly 16^12, which would format as a 13-char "1000000000000"
      // — lexicographically BELOW most 12-char draws, silently keeping
      // ~1/16 of rows instead of ~all
      val buckets = math.min(
        math.floor(p * math.pow(16.0, Digits.toDouble)).toLong,
        (1L << (4 * Digits)) - 1)
      ("%0" + Digits + "x").format(buckets)
    }
  }

  /** The uniform draw: first 12 hex chars of md5(seed ∥ ':' ∥ key). A NULL
    * key draws as a NUL-prefixed sentinel class (the prefix keeps it
    * disjoint from real keys — the engine rejects U+0000 in content
    * anyway, see NQuads): without the coalesce, null-key rows would
    * silently fall out of every sample — violating the p ≥ 1 "keep all"
    * contract — and diverge from an oracle's NULLS LAST ordering in
    * [[exactK]].
    */
  def draw(seed: String, key: Column): Column =
    substring(md5(concat(lit(seed + ":"),
      coalesce(key.cast("string"), lit("\u0000null")))), 1, Digits)

  /** Keep each row independently with probability `p` (deterministic in
    * (seed, key) — a key kept once is kept always).
    */
  def bernoulli(df: DataFrame, key: Column, p: Double, seed: String): DataFrame =
    df.filter(draw(seed, key) < lit(hexThreshold(p)))

  /** Per-stratum Bernoulli rates (the corpus-mixing knob: up-/down-weight
    * sources into a target mixture). Strata absent from `rates` fall back
    * to `defaultRate`. One chained-when threshold column — still a narrow
    * filter, no join.
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 rates: Map[String, Double], defaultRate: Double,
                 seed: String): DataFrame = {
    val thr = rates.foldLeft(null: Column) { case (acc, (s, p)) =>
      if (acc == null) when(stratum === lit(s), lit(hexThreshold(p)))
      else acc.when(stratum === lit(s), lit(hexThreshold(p)))
    }
    val thrCol = if (thr == null) lit(hexThreshold(defaultRate))
                 else thr.otherwise(lit(hexThreshold(defaultRate)))
    df.filter(draw(seed, key) < thrCol)
  }

  /** Exactly min(k, N) rows drawn uniformly without replacement: global
    * top-k by the draw (ties — md5 collisions — broken by the key itself,
    * so the result set is total-order deterministic). The ranking column
    * is not kept.
    *
    * Scale shape: for small k the plan is TakeOrderedAndProject —
    * per-partition k-heaps merged on the driver. That shape has TWO
    * large-k failure modes: (a) the driver merge materialises up to
    * partitions × k rows (a 5M-row draw over 1000 partitions is a 5e9-row
    * driver OOM — Spark 4's `topKSortFallbackThreshold` defaults to
    * ~Int.MaxValue, so nothing stops it); (b) a deployment that LOWERS
    * the threshold gets a full-corpus global sort instead. Both are
    * k-over-the-corpus problems, so k above [[DirectTopKMax]] (or the
    * session's fallback threshold, whichever is smaller) routes through
    * [[exactKLarge]]'s two-pass threshold-refine: the ordered set is ~k
    * rows, never N, and the driver merge is bounded by ~k regardless of
    * partition count. Both paths return the IDENTICAL row set
    * (spec-pinned).
    */
  def exactK(df: DataFrame, key: Column, k: Int, seed: String): DataFrame = {
    require(k >= 0, "sample size must be non-negative")
    val r = "_samp_rank"
    require(!df.columns.contains(r), s"input already has a column named $r")
    val fallback = df.sparkSession.conf
      .get("spark.sql.execution.topKSortFallbackThreshold", "10000").toInt
    if (k > math.min(fallback, DirectTopKMax)) return exactKLarge(df, key, k, seed)
    df.withColumn(r, draw(seed, key))
      .orderBy(col(r), key)
      .limit(k)
      .drop(r)
  }

  /** Largest k the direct top-k path serves: 32 partitions × 10k heap
    * entries on the driver is single-digit MBs; past it the two-pass
    * refine is the safe shape at any partition count.
    */
  val DirectTopKMax = 10000

  /** Two-pass threshold-refine draw for LARGE k (beyond the top-k
    * operator's threshold): (1) count N; (2) Bernoulli pre-filter at an
    * oversampled rate p' = (k + 6√k + 16)/N — the k-th smallest draw is
    * below the p'-threshold unless the binomial undershoots by ≥6σ — then
    * exact top-k over the ~k surviving rows. The survivor count is
    * CHECKED: ≥ k survivors proves the true top-k is inside the survivor
    * set (survivors = ALL rows with draw < cut), so the result equals the
    * one-pass draw row-for-row; an undershoot falls back to the full
    * sort (deterministic given the data — no retry loop, no seed bump,
    * so replays take the same branch). Cost at 10^10 rows: two narrow
    * full scans + a sort of ~k rows, vs a full-corpus range shuffle.
    */
  def exactKLarge(df: DataFrame, key: Column, k: Int, seed: String): DataFrame = {
    require(k >= 0, "sample size must be non-negative")
    val r = "_samp_rank"
    require(!df.columns.contains(r), s"input already has a column named $r")
    val n = df.count()
    if (n <= k) return df // the whole frame survives; no ordering needed
    val p = math.min(1.0, (k + 6.0 * math.sqrt(k.toDouble) + 16.0) / n)
    // localCheckpoint materialises the ~k survivors once: the count and
    // the final top-k then share that pass instead of each re-running
    // the md5 filter over the full corpus (count + filter = the two
    // documented scans; without the checkpoint the sort re-scans)
    val survivors = df.filter(draw(seed, key) < lit(hexThreshold(p)))
      .localCheckpoint()
    val ranked =
      if (survivors.count() >= k) survivors
      else df // ≥6σ undershoot: correctness over the fast path
    ranked.withColumn(r, draw(seed, key))
      .orderBy(col(r), key)
      .limit(k)
      .drop(r)
  }

  /** Exactly min(k, stratum size) rows per stratum — the balanced-corpus
    * draw ("k docs from every source"). One hash aggregate worth of
    * shuffle (window partitioned by the stratum), no global sort.
    */
  def exactKPerStratum(df: DataFrame, key: Column, stratum: Column, k: Int,
                       seed: String): DataFrame = {
    require(k >= 0, "sample size must be non-negative")
    val r = "_samp_rank"
    require(!df.columns.contains(r), s"input already has a column named $r")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(draw(seed, key), key)
    df.withColumn(r, row_number().over(w))
      .filter(col(r) <= k)
      .drop(r)
  }

  /** Budget-bounded per-stratum draw: walk each stratum's rows in hash
    * order accumulating `weight` (token count, bytes, …) and keep rows
    * while the running total stays ≤ `budget` — "take one billion tokens
    * per source, uniformly at random, deterministically". Same shuffle
    * shape as [[exactKPerStratum]] (one window over the stratum); the
    * kept set is nested in the budget (raising it only adds rows) because
    * the walk order is budget-independent.
    */
  def weightBudgetPerStratum(df: DataFrame, key: Column, stratum: Column,
                             weight: Column, budget: Long,
                             seed: String): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val c = "_samp_cum"
    require(!df.columns.contains(c), s"input already has a column named $c")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(draw(seed, key), key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn(c, sum(weight).over(w))
      .filter(col(c) <= budget)
      .drop(c)
  }

  /** Stable split assignment: adds `splitCol` labelling each row by hash
    * range — `splits` are (name, weight) in declared order, weights
    * normalised to 1, the last split absorbing the remainder (so the
    * labels partition the input exactly). A doc's split never changes as
    * the corpus grows — the property that keeps eval sets uncontaminated
    * across corpus versions.
    */
  def assignSplits(df: DataFrame, key: Column, splits: Seq[(String, Double)],
                   seed: String, splitCol: String = "split"): DataFrame = {
    val u = draw(seed, key)
    // thresholds for all but the last split; the last is the otherwise-arm
    val labelled = splits.init.zip(splitThresholds(splits)).foldLeft(null: Column) {
      case (acc, ((name, _), cut)) =>
        if (acc == null) when(u < lit(cut), lit(name))
        else acc.when(u < lit(cut), lit(name))
    }
    val splitExpr = if (labelled == null) lit(splits.last._1)
                    else labelled.otherwise(lit(splits.last._1))
    df.withColumn(splitCol, splitExpr)
  }

  /** The hex cut points [[assignSplits]] compares against — one per split
    * except the last (the otherwise-arm). Public so an oracle can inline
    * the IDENTICAL literals: the cumulative weights accumulate in IEEE
    * order here, and re-deriving them elsewhere (0.8 + 0.1 ≠ 0.9 exactly)
    * would land a different 48-bit threshold.
    */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[String] = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0) && splits.map(_._2).sum > 0,
      "split weights must be non-negative with a positive sum")
    val total = splits.map(_._2).sum
    splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail.init.map(hexThreshold)
  }
}
