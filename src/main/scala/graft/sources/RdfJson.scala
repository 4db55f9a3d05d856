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

  /** The W3C RDF/JSON object term (typed model, round 6):
    * `"type":"literal"|"uri"|"bnode"` with optional `"lang"` /
    * `"datatype"` members — the note's own vocabulary, so typed frames
    * serialise to REAL RDF/JSON rather than a private literal-only
    * subset. Captured whole by the line grammar (non-capturing inside),
    * classified by the `J*` patterns.
    */
  private val StrNc = "(?:[^\"\\\\]|\\\\.)*"
  private val ObjTok =
    s"(\\{\"value\":\"$StrNc\",\"type\":\"(?:literal|uri|bnode)\"" +
      s"(?:,\"(?:lang|datatype)\":\"$StrNc\")?\\})"

  private val TripleLine =
    s"^\\{\"$Str\":\\{\"$Str\":\\[$ObjTok\\]\\}\\}$$"

  private val JPlain = s"^\\{\"value\":\"$Str\",\"type\":\"literal\"\\}$$"
  private val JLang = s"^\\{\"value\":\"$Str\",\"type\":\"literal\"," +
    "\"lang\":\"([A-Za-z][A-Za-z0-9-]*)\"\\}$$"
  private val JDt = s"^\\{\"value\":\"$Str\",\"type\":\"literal\"," +
    s"\"datatype\":\"$Str\"\\}$$"
  private val JUri = s"^\\{\"value\":\"$Str\",\"type\":\"uri\"\\}$$"
  private val JBnode = s"^\\{\"value\":\"$Str\",\"type\":\"bnode\"\\}$$"

  /** One RDF/JSON subject-object line per statement row (triples only —
    * callers route quads through a quad-capable format; the registry's
    * `rj` entry drops `source` like `rdf` does).
    */
  def serialize(statements: DataFrame): DataFrame = {
    def e(c: org.apache.spark.sql.Column) = NQuads.esc(c)
    val plainObj = concat(lit("{\"value\":\""), e(col("object")),
      lit("\",\"type\":\"literal\"}"))
    val obj =
      if (!statements.columns.contains("okind")) plainObj
      else {
        val hasLang = statements.columns.contains("lang")
        val hasDt = statements.columns.contains("datatype")
        val lit0 = concat(lit("{\"value\":\""), e(col("object")),
          lit("\",\"type\":\"literal\""),
          when(lit(hasLang) && col("lang").isNotNull,
            concat(lit(",\"lang\":\""), col("lang"), lit("\"")))
            .when(lit(hasDt) && col("datatype").isNotNull,
              concat(lit(",\"datatype\":\""), e(col("datatype")), lit("\"")))
            .otherwise(lit("")),
          lit("}"))
        when(col("okind") === "iri", concat(lit("{\"value\":\""),
          e(col("object")), lit("\",\"type\":\"uri\"}")))
          .when(col("okind") === "bnode", concat(lit("{\"value\":\""),
            e(col("object")), lit("\",\"type\":\"bnode\"}")))
          .otherwise(lit0)
      }
    statements.select(concat(
      lit("{\""), e(col("subject")), lit("\":{\""), e(col("predicate")),
      lit("\":["), obj, lit("]}}")).as("value"))
  }

  /** Distributed text write of the line profile. */
  def write(statements: DataFrame, path: String): Unit =
    serialize(statements).write.mode("overwrite").text(path)

  /** Parse back into the 3-column statement frame (`source` is always
    * null — triple format). Malformed lines → all-null rows, the shared
    * parser contract.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path))

  /** The parse transform alone (streaming composes). */
  def parseLines(lines: DataFrame): DataFrame = {
    val isTriple = col("value").rlike(TripleLine)
    def grp(i: Int) =
      when(isTriple, NQuads.unesc(regexp_extract(col("value"), TripleLine, i)))
        .otherwise(lit(null).cast("string"))
    val tok = when(isTriple, regexp_extract(col("value"), TripleLine, 3))
      .otherwise(lit(null).cast("string"))
    def t(p: String, i: Int) = NQuads.unesc(regexp_extract(tok, p, i))
    val objectC =
      when(tok.rlike(JUri), t(JUri, 1))
        .when(tok.rlike(JBnode), t(JBnode, 1))
        .when(tok.rlike(JLang), t(JLang, 1))
        .when(tok.rlike(JDt), t(JDt, 1))
        .when(tok.rlike(JPlain), t(JPlain, 1))
    val okindC =
      when(tok.rlike(JUri), lit("iri"))
        .when(tok.rlike(JBnode), lit("bnode"))
        .when(tok.rlike(JLang) || tok.rlike(JDt) || tok.rlike(JPlain),
          lit("literal"))
    lines
      .filter(!col("value").rlike(NQuads.FullLineComment))
      .select(NQuads.stripTrailingComment(col("value"), Seq(TripleLine))
        .as("value"))
      .filter(!col("value").rlike(NQuads.PrefixLine))
      .select(
        grp(1).as("subject"),
        grp(2).as("predicate"),
        objectC.as("object"),
        okindC.as("okind"),
        when(tok.rlike(JLang), regexp_extract(tok, JLang, 2)).as("lang"),
        when(tok.rlike(JDt), t(JDt, 2)).as("datatype"),
        lit(null).cast("string").as("source"))
  }
}
