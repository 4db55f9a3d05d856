package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-Quads statement serialisation — the line-oriented RDF sink/source the
  * reference writes through RDF4j Rio (`rdf-writer`, /root/reference/
  * grafter.io/src/grafter_2/rdf4j/io.clj:500-582; N-Triples literal
  * escaping io.clj:253-263) re-expressed as pure Column transforms over
  * statement frames `(subject, predicate, object, source)`:
  *
  * {{{ <subject> <predicate> "object" <source> . }}}
  *
  * Objects are literals with N-Triples string escaping (\\ \" \n \r \t);
  * subject/predicate/graph render as IRIs. `parse ∘ serialise = id` is
  * pinned by the round-trip spec, mirroring the reference's own
  * round-trip tests (io_test.clj:187-223). Distributed text write/read —
  * one line per statement, no driver materialisation.
  *
  * Known limitation (documented): a NUL character in a literal is used as
  * the unescape sentinel and cannot round-trip.
  */
object NQuads {

  private def esc(c: Column): Column =
    replace(replace(replace(replace(replace(c,
      lit("\\"), lit("\\\\")),
      lit("\""), lit("\\\"")),
      lit("\n"), lit("\\n")),
      lit("\r"), lit("\\r")),
      lit("\t"), lit("\\t"))

  private def unesc(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("\\\\"), lit("\u0000")),
      lit("\\\""), lit("\"")),
      lit("\\n"), lit("\n")),
      lit("\\r"), lit("\r")),
      lit("\\t"), lit("\t")),
      lit("\u0000"), lit("\\"))

  /** One N-Quads line per statement row. */
  def serialize(statements: DataFrame): DataFrame =
    statements.select(concat(
      lit("<"), col("subject"), lit("> <"), col("predicate"),
      lit("> \""), esc(col("object")), lit("\" <"), col("source"),
      lit("> .")).as("value"))

  /** Distributed text write of the statement frame. */
  def write(statements: DataFrame, path: String): Unit =
    serialize(statements).write.mode("overwrite").text(path)

  private val Line = "^<([^>]*)> <([^>]*)> \"(.*)\" <([^>]*)> \\.$"

  /** Parse an N-Quads file back into a statement frame. Malformed lines
    * surface as all-null rows — distinguishable from data, since
    * regexp_extract alone would return empty strings (route them through
    * [[graft.cdc.Quarantine]]-style handling upstream if the input is
    * untrusted).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val wellFormed = col("value").rlike(Line)
    def grp(i: Int): Column =
      when(wellFormed, regexp_extract(col("value"), Line, i))
        .otherwise(lit(null).cast("string"))
    spark.read.text(path).select(
      grp(1).as("subject"),
      grp(2).as("predicate"),
      unesc(grp(3)).as("object"),
      grp(4).as("source"))
  }
}
