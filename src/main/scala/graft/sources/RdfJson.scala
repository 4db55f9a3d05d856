package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RDF/JSON statement serialisation — the reference registry's `:rj`
  * entry (/root/reference/grafter.io/src/grafter_2/rdf4j/formats.clj:
  * 138-159 registers `RDFFormat/RDFJSON` → `RDFJSONParserFactory`,
  * mime `application/rdf+json`), the W3C RDF/JSON note's
  * subject-keyed object shape re-expressed as the line-delimited
  * profile — one self-contained subject object per line:
  *
  * {{{
  *   {"s":{"p":[{"value":"o","type":"literal"}]}}
  * }}}
  *
  * RDF/JSON is a TRIPLE format (no named-graph syntax, like RDF/XML) —
  * the registry entry drops `source` on the way out, the same contract
  * as the `rdf` key. Multiple lines sharing a subject merge under
  * RDF/JSON object semantics exactly as repeated TriX graph blocks
  * merge, so the per-line profile is semantics-preserving.
  *
  * Escaping is [[NQuads.esc]], SHARED with the N-family and JSON-LD:
  * the five C-style escapes mean the same thing inside a JSON string,
  * and the U+0000 rejection carries over. Like every statement parser
  * (C2 contract, [[StatementFormats]]): full-line `#` comments,
  * grammar-guarded trailing comments and `@prefix` metadata lines are
  * stripped; malformed lines parse as all-null rows.
  */
object RdfJson {

  /** A JSON string body — disjoint alternatives, linear match (shared
    * shape with [[JsonLd]]).
    */
  private val Str = "((?:[^\"\\\\]|\\\\.)*)"

  private val TripleLine =
    s"^\\{\"$Str\":\\{\"$Str\":\\[\\{\"value\":\"$Str\"," +
      "\"type\":\"literal\"\\}\\]\\}\\}$$"

  /** One RDF/JSON subject-object line per statement row (triples only —
    * callers route quads through a quad-capable format; the registry's
    * `rj` entry drops `source` like `rdf` does).
    */
  def serialize(statements: DataFrame): DataFrame = {
    def e(c: org.apache.spark.sql.Column) = NQuads.esc(c)
    statements.select(concat(
      lit("{\""), e(col("subject")), lit("\":{\""), e(col("predicate")),
      lit("\":[{\"value\":\""), e(col("object")),
      lit("\",\"type\":\"literal\"}]}}")).as("value"))
  }

  /** Distributed text write of the line profile. */
  def write(statements: DataFrame, path: String): Unit =
    serialize(statements).write.mode("overwrite").text(path)

  /** Parse back into the 3-column statement frame (`source` is always
    * null — triple format). Malformed lines → all-null rows, the shared
    * parser contract.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val isTriple = col("value").rlike(TripleLine)
    def grp(i: Int) =
      when(isTriple, NQuads.unesc(regexp_extract(col("value"), TripleLine, i)))
        .otherwise(lit(null).cast("string"))
    spark.read.text(path)
      .filter(!col("value").rlike(NQuads.FullLineComment))
      .select(NQuads.stripTrailingComment(col("value"), Seq(TripleLine))
        .as("value"))
      .filter(!col("value").rlike(NQuads.PrefixLine))
      .select(
        grp(1).as("subject"),
        grp(2).as("predicate"),
        grp(3).as("object"),
        lit(null).cast("string").as("source"))
  }
}
