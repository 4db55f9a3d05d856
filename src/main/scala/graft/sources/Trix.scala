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

  /** Resource position: `<uri>` for IRIs, TriX's `<id>` for bnode
    * tokens (`_:label` → label — the spec carries bare labels).
    */
  private def resTag(c: Column): Column =
    when(c.startsWith("_:"),
      concat(lit("<id>"), RdfXml.xmlEsc(c.substr(lit(3), length(c))),
        lit("</id>")))
      .otherwise(concat(lit("<uri>"), RdfXml.xmlEsc(c), lit("</uri>")))

  /** Object position (typed model, round 6): TriX's own vocabulary —
    * `<uri>`, `<id>`, `<plainLiteral [xml:lang]>`, `<typedLiteral
    * datatype>`; legacy frames emit `<plainLiteral>` byte-identically.
    */
  private def objTag(statements: DataFrame): Column = {
    val plain = concat(lit("<plainLiteral>"), RdfXml.xmlEsc(col("object")),
      lit("</plainLiteral>"))
    if (!statements.columns.contains("okind")) plain
    else {
      val hasLang = statements.columns.contains("lang")
      val hasDt = statements.columns.contains("datatype")
      val lit0 =
        when(lit(hasLang) && col("lang").isNotNull,
          concat(lit("<plainLiteral xml:lang=\""), col("lang"), lit("\">"),
            RdfXml.xmlEsc(col("object")), lit("</plainLiteral>")))
          .when(lit(hasDt) && col("datatype").isNotNull,
            concat(lit("<typedLiteral datatype=\""),
              RdfXml.xmlEsc(col("datatype")), lit("\">"),
              RdfXml.xmlEsc(col("object")), lit("</typedLiteral>")))
          .otherwise(plain)
      when(col("okind") === "iri" || col("okind") === "bnode",
        resTag(col("object"))).otherwise(lit0)
    }
  }

  private def tripleBody(statements: DataFrame): Column = concat(
    lit("<triple>"), resTag(col("subject")),
    lit("<uri>"), RdfXml.xmlEsc(col("predicate")),
    lit("</uri>"), objTag(statements), lit("</triple>"))

  /** One TriX graph block per statement row. */
  def serialize(statements: DataFrame): DataFrame = {
    val body = tripleBody(statements)
    val bare = concat(lit("<graph>"), body, lit("</graph>"))
    val line =
      if (!statements.columns.contains("source")) bare
      else when(col("source").isNull, bare)
        .otherwise(concat(lit("<graph>"), resTag(col("source")),
          body, lit("</graph>")))
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

  // term-token alternations (all inner groups non-capturing): resource
  // = uri | id; object additionally plain/lang/typed literal. Captured
  // whole by the line grammars, classified by the T* patterns below.
  private val ResTok = "(?:<uri>[^<]*</uri>|<id>[^<]*</id>)"
  private val ObjTok = "(?:<uri>[^<]*</uri>|<id>[^<]*</id>" +
    "|<plainLiteral(?: xml:lang=\"[A-Za-z][A-Za-z0-9-]*\")?>[^<]*</plainLiteral>" +
    "|<typedLiteral datatype=\"[^\"]*\">[^<]*</typedLiteral>)"
  private val Body =
    s"<triple>($ResTok)<uri>([^<]*)</uri>($ObjTok)</triple>"
  private val QuadLine = s"^<graph>($ResTok)$Body</graph>$$"
  private val TripleLine = s"^<graph>$Body</graph>$$"
  private val Framing = "^(<\\?xml|<TriX|</TriX>)"

  private val TUri = "^<uri>([^<]*)</uri>$"
  private val TId = "^<id>([^<]*)</id>$"
  private val TPlain = "^<plainLiteral>([^<]*)</plainLiteral>$"
  private val TLang =
    "^<plainLiteral xml:lang=\"([A-Za-z][A-Za-z0-9-]*)\">([^<]*)</plainLiteral>$"
  private val TTyped = "^<typedLiteral datatype=\"([^\"]*)\">([^<]*)</typedLiteral>$"

  /** Parse back into the TYPED statement frame: named-graph blocks
    * surface with their `source`, unnamed blocks with `source = null`;
    * `<uri>`/`<id>`/lang/datatype terms land in okind/lang/datatype
    * (bnode labels re-prefixed `_:`, the shared token convention).
    * Framing, `@prefix` and `#` comment lines are metadata; malformed
    * lines → all-null rows, the shared contract.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path))

  /** The parse transform alone (streaming composes). */
  def parseLines(lines: DataFrame): DataFrame = {
    val isQuad = col("value").rlike(QuadLine)
    val isTriple = col("value").rlike(TripleLine)
    def grp(p: String, i: Int): Column = regexp_extract(col("value"), p, i)
    def tok(quadIdx: Int, tripleIdx: Int): Column =
      when(isQuad, grp(QuadLine, quadIdx))
        .when(isTriple && lit(tripleIdx) > 0, grp(TripleLine, tripleIdx))
        .otherwise(lit(null).cast("string"))
    def t(c: Column, p: String, i: Int): Column =
      RdfXml.xmlUnesc(regexp_extract(c, p, i))
    // resource token → value (`<id>label</id>` → `_:label`)
    def res(c: Column): Column =
      when(c.rlike(TUri), t(c, TUri, 1))
        .when(c.rlike(TId), concat(lit("_:"), t(c, TId, 1)))
    val objT = tok(4, 3)
    val objectC =
      when(objT.rlike(TUri) || objT.rlike(TId), res(objT))
        .when(objT.rlike(TLang), t(objT, TLang, 2))
        .when(objT.rlike(TTyped), t(objT, TTyped, 2))
        .when(objT.rlike(TPlain), t(objT, TPlain, 1))
    val okindC =
      when(objT.rlike(TUri), lit("iri"))
        .when(objT.rlike(TId), lit("bnode"))
        .when(objT.rlike(TLang) || objT.rlike(TTyped) || objT.rlike(TPlain),
          lit("literal"))
    lines
      .filter(!col("value").rlike(NQuads.FullLineComment) &&
        !col("value").rlike(Framing))
      .select(NQuads.stripTrailingComment(col("value"),
        Seq(QuadLine, TripleLine)).as("value"))
      .filter(!col("value").rlike(NQuads.PrefixLine))
      .select(
        res(tok(2, 1)).as("subject"),
        when(isQuad, RdfXml.xmlUnesc(grp(QuadLine, 3)))
          .when(isTriple, RdfXml.xmlUnesc(grp(TripleLine, 2))).as("predicate"),
        objectC.as("object"),
        okindC.as("okind"),
        when(objT.rlike(TLang), regexp_extract(objT, TLang, 1)).as("lang"),
        when(objT.rlike(TTyped), t(objT, TTyped, 1)).as("datatype"),
        res(tok(1, -1)).as("source"))
  }
}
