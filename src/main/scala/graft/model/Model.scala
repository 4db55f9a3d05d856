package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core row types of the engine.
  *
  * The data model recasts the reference's quad stream (grafter
  * `Quad(s,p,o,c)`, /root/reference/grafter.core/src/grafter_2/rdf/
  * protocols.cljc:372-394) as typed Datasets: the graph/context position `c`
  * becomes the `source` column, and payload equality ignores it — mirroring
  * grafter's graph-insensitive `triple=` (protocols.cljc:457-469).
  */
/** Target-table row (the `input_hint` shape).
  *
  * Invariant: `n_tok == tokens.length` (checked by [[graft.verify.FoldOracle]]).
  */
final case class DocRow(
    doc_id: String,
    tokens: Array[Int],
    n_tok: Int,
    source: String)

/** One WAL/binlog change event. `op` is "I"|"U"|"D"; `tokens`/`n_tok` are
  * null for deletes. `lsn` totally orders events per `doc_id` (max-LSN wins).
  */
final case class ChangeEvent(
    op: String,
    doc_id: String,
    lsn: Long,
    ts: Timestamp,
    tokens: Array[Int],
    n_tok: Integer,
    source: String)

/** Per-micro-batch, per-partition lineage record (north_rule requirement). */
final case class Lineage(
    epoch_id: Long,
    partition_id: Int,
    offset_start: Long,
    offset_end: Long,
    rows_applied: Long,
    snapshot_id: Long,
    committed_at: Timestamp)

object Schemas {
  /** Change-feed schema, fixed so streaming reads never infer. */
  val changeEvent: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("doc_id", StringType, nullable = false),
    StructField("lsn", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("n_tok", IntegerType, nullable = true),
    StructField("source", StringType, nullable = false)))

  /** v2 change-feed schema (schema-evolution fixture, FIXTURES.md §2):
    * adds `lang` and widens `n_tok` int32→int64.
    */
  val changeEventV2: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("doc_id", StringType, nullable = false),
    StructField("lsn", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("n_tok", LongType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = false)))

  val docRow: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("n_tok", IntegerType, nullable = true),
    StructField("source", StringType, nullable = false)))
}
