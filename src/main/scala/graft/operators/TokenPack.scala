package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches: concatenate pre-tokenized
  * documents (each terminated by an EOS token) into a contiguous token
  * stream and cut it into fixed-length training sequences — the step
  * between a curated corpus and a dataloader, over exactly the
  * `(doc_id, tokens, n_tok, source)` shape of BASELINE.json's input_hint.
  *
  * Determinism contract: the stream order is (`partCol`, `doc_id`) — a
  * total order both engines can reproduce, so the packing is
  * oracle-checkable (qd61 verifies per-sequence token checksums against
  * DuckDB recomputing the same stream).
  *
  * Scale shape: ONE shuffle on `partCol` (the cumulative-offset window
  * and the regroup both hash on it — AQE reuses the exchange), then
  * per-group linear work. Parallelism = `partCol` cardinality: pick a
  * column with enough distinct values (a shard/source column, or a
  * derived `hash(doc_id) % P`); packing is embarrassingly parallel
  * across groups because sequences never cross a group boundary. A
  * GLOBAL single-stream packing would be a one-task window — the
  * deliberate non-feature here.
  */
object TokenPack {

  /** Pack `docs` into sequences of exactly `seqLen` tokens per `partCol`
    * group (the final partial sequence of each group rides along with
    * `n_tok < seqLen`). Output: one row per sequence —
    * `(partCol, seq_id, n_tok, first_tok, last_tok, tok_sum)`; the
    * token arrays themselves are cheap to materialise the same way, but
    * the scalar projection is what the oracle hashes.
    */
  def packStats(docs: DataFrame, partCol: String, seqLen: Int,
                eos: Int = -1): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val w = Window.partitionBy(col(partCol)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // cumulative token offset of each doc within its group's stream
    // (every doc contributes n_tok + 1 for its EOS terminator)
    val offs = docs
      .select(col(partCol), col("doc_id"), col("tokens"))
      .withColumn("_len", size(col("tokens")) + 1)
      .withColumn("_off", coalesce(sum(col("_len")).over(w), lit(0L)))
    // global position of every token (EOS included) in the group stream
    val toks = offs
      .select(col(partCol), col("_off"),
        posexplode(concat(col("tokens"), array(lit(eos)))).as(Seq("_pos", "tok")))
      .select(col(partCol), (col("_off") + col("_pos")).as("gpos"), col("tok"))
    toks
      .withColumn("seq_id", floor(col("gpos") / seqLen).cast("long"))
      .groupBy(col(partCol), col("seq_id"))
      .agg(count(lit(1)).cast("int").as("n_tok"),
        min_by(col("tok"), col("gpos")).as("first_tok"),
        max_by(col("tok"), col("gpos")).as("last_tok"),
        sum(col("tok").cast("long")).as("tok_sum"))
  }
}
