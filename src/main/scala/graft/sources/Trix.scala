package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TriX statement serialisation — the reference registry's `:trix` entry
  * (/root/reference/grafter.io/src/grafter_2/rdf4j/formats.clj:8-19,
  * `application/trix`), the XML quad format: one self-contained
  * single-statement `<graph>` block per line,
  *
  * {{{
  *   quad    <graph><uri>g</uri><triple><uri>s</uri><uri>p</uri><plainLiteral>o</plainLiteral></triple></graph>
  *   triple  <graph><triple>…</triple></graph>          (unnamed graph)
  * }}}
  *
  * (repeated blocks of one graph name merge under TriX semantics, the
  * same per-line shape as [[Turtle.serializeTrig]]). A null `source`
  * emits the unnamed-graph block — triple = quad with nil context, the
  * shared statement-model contract. Escaping is [[RdfXml.xmlEsc]],
  * shared with RDF/XML so the two XML dialects cannot drift; [[write]]
  * frames the parts with the `<TriX>` document element via
  * [[RdfXml.writeDocFrame]].
  */
object Trix {

  private[sources] val TrixNs = "http://www.w3.org/2004/03/trix/trix-1/"

  private def tripleBody: Column = concat(
    lit("<triple><uri>"), RdfXml.xmlEsc(col("subject")),
    lit("</uri><uri>"), RdfXml.xmlEsc(col("predicate")),
    lit("</uri><plainLiteral>"), RdfXml.xmlEsc(col("object")),
    lit("</plainLiteral></triple>"))

  /** One TriX graph block per statement row. */
  def serialize(statements: DataFrame): DataFrame = {
    val bare = concat(lit("<graph>"), tripleBody, lit("</graph>"))
    val line =
      if (!statements.columns.contains("source")) bare
      else when(col("source").isNull, bare)
        .otherwise(concat(lit("<graph><uri>"), RdfXml.xmlEsc(col("source")),
          lit("</uri>"), tripleBody, lit("</graph>")))
    statements.select(line.as("value"))
  }

  /** Distributed write framed as a complete TriX document. */
  def write(statements: DataFrame, path: String): Unit = {
    serialize(statements).write.mode("overwrite").text(path)
    RdfXml.writeDocFrame(path,
      Seq("<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
        s"""<TriX xmlns="$TrixNs">"""),
      Seq("</TriX>"))
  }

  private val Body =
    "<triple><uri>([^<]*)</uri><uri>([^<]*)</uri>" +
      "<plainLiteral>([^<]*)</plainLiteral></triple>"
  private val QuadLine = s"^<graph><uri>([^<]*)</uri>$Body</graph>$$"
  private val TripleLine = s"^<graph>$Body</graph>$$"
  private val Framing = "^(<\\?xml|<TriX|</TriX>)"

  /** Parse back into the 4-column statement frame: named-graph blocks
    * surface with their `source`, unnamed blocks with `source = null`.
    * Framing, `@prefix` and `#` comment lines are metadata; malformed
    * lines → all-null rows, the shared contract.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val isQuad = col("value").rlike(QuadLine)
    val isTriple = col("value").rlike(TripleLine)
    def grp(p: String, i: Int): Column = regexp_extract(col("value"), p, i)
    def pick(quadIdx: Int, tripleIdx: Int): Column =
      when(isQuad, RdfXml.xmlUnesc(grp(QuadLine, quadIdx)))
        .when(isTriple && lit(tripleIdx) > 0,
          RdfXml.xmlUnesc(grp(TripleLine, tripleIdx)))
        .otherwise(lit(null).cast("string"))
    spark.read.text(path)
      .filter(!col("value").rlike(NQuads.FullLineComment) &&
        !col("value").rlike(Framing))
      .select(NQuads.stripTrailingComment(col("value"),
        Seq(QuadLine, TripleLine)).as("value"))
      .filter(!col("value").rlike(NQuads.PrefixLine))
      .select(
        pick(2, 1).as("subject"),
        pick(3, 2).as("predicate"),
        pick(4, 3).as("object"),
        pick(1, -1).as("source"))
  }
}
