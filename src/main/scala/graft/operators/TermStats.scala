package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Corpus-level term statistics: document frequency and rarity-weighted
  * top-k terms per document — the vocabulary/keyword layer of a
  * training-data pipeline (stopword discovery, dedup keys, topic
  * sketches). The reference's tabular `derive`/`melt` steps compute
  * per-row derived columns; these are their corpus-global counterparts.
  *
  * Tokenization matches the SimHash family (`DedupOps.simhash`):
  * whitespace split of the first `maxLen` chars — portable because
  * Spark's `split` and DuckDB's `string_split` agree given the empty-token
  * filter.
  *
  * Scale shape: one explode (narrow), one hash aggregate per level —
  * map-side partial aggregation does the heavy lifting; the doc-count
  * scalar joins back via broadcast, never a shuffle of the corpus. The
  * rarity weight is `n_docs / df` (a rational idf): every arithmetic step
  * is a correctly-rounded IEEE op, so scores are bit-identical across
  * engines — `ln`-based idf differs in the last ulp between libm
  * implementations and poisons exact oracles at rounding boundaries.
  */
object TermStats {

  /** (doc, word) pairs: whitespace tokens of the first `maxLen` chars,
    * empties dropped, duplicates within a doc kept (term frequency).
    */
  def words(docs: DataFrame, maxLen: Int = 64): DataFrame =
    docs.select(col("doc_id"),
        explode(split(substring(col("text"), 1, maxLen), " ")).as("word"))
      .filter(length(col("word")) > 0)

  /** Per-word corpus stats: document frequency (docs containing the word)
    * and total occurrence count. One aggregate pass.
    */
  def docFreq(docs: DataFrame, maxLen: Int = 64): DataFrame =
    words(docs, maxLen)
      .groupBy(col("word"))
      .agg(count_distinct(col("doc_id")).as("n_docs"),
           count(lit(1)).as("n_total"))

  /** Per-doc repetition ratio: 1 − distinct/total over `w`-char shingles
    * of the first `maxLen` chars — high values flag boilerplate and
    * degenerate looping text (the standard repetition quality gate). One
    * explode + one aggregate; output (doc_id, n_shingles, repetition).
    */
  def repetitionRatio(docs: DataFrame, w: Int = 8, maxLen: Int = 64): DataFrame =
    docs.select(col("doc_id"), substring(col("text"), 1, maxLen).as("tx"))
      .select(col("doc_id"), explode(sequence(lit(1),
        greatest(lit(1), length(col("tx")) - (w - 1)))).as("i"), col("tx"))
      .select(col("doc_id"), col("tx").substr(col("i"), lit(w)).as("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        TextOps.repetitionRatioFrom(count_distinct(col("g")), count(lit(1)))
          .as("repetition"))

  /** Top-`k` terms per document by rarity-weighted frequency
    * `score = tf · n_corpus_docs / df`, rounded to 4 decimals; ties broken
    * by word. Returns (doc_id, word, score, rank).
    */
  def topTerms(docs: DataFrame, k: Int, maxLen: Int = 64): DataFrame = {
    val w = words(docs, maxLen)
    val tf = w.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    // tf holds exactly one row per (doc, word), so a count window over
    // `word` IS the document frequency — one corpus scan and one window
    // exchange instead of the old second scan + distinct + groupBy +
    // re-shuffled join (plan: 2 scans / 5 Exchanges → 1 scan / 3)
    val n = docs.agg(count(lit(1)).as("n_corpus")) // 1 row — broadcast side
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("word"))))
      .crossJoin(broadcast(n))
      .withColumn("score", TextOps.round4(
        col("tf").cast("double") * col("n_corpus").cast("double")
          / col("df").cast("double")))
    val byScore = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    scored
      .withColumn("rank", row_number().over(byScore))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("word"), col("score"),
              col("rank").cast("bigint").as("rank"))
  }
}
