package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RDF/XML statement serialisation — the reference registry's `:rdf`
  * / `:owl` entry (/root/reference/grafter.io/src/grafter_2/rdf4j/
  * formats.clj:8-19, `application/rdf+xml`) as one `<rdf:Description>`
  * element per line:
  *
  * {{{
  *   <rdf:Description rdf:about="s"><local xmlns="ns">o</local></rdf:Description>
  * }}}
  *
  * The predicate IRI splits into `ns` + `local` at the longest suffix
  * that is a legal XML element name (`[A-Za-z_][A-Za-z0-9_.-]*`) — the
  * split every RDF/XML writer performs, here with the namespace carried
  * as a per-element DEFAULT `xmlns` so no prefix bookkeeping is needed.
  * A predicate with no legal local part (e.g. ending in `/`) cannot be
  * expressed in RDF/XML at all; serialisation REJECTS it loudly rather
  * than emitting an invalid document. RDF/XML carries no graph
  * component, so the registry serves it triples-only (quads go to
  * [[NQuads]]/[[Trix]]).
  *
  * XML escaping is ONE shared definition ([[RdfXml.xmlEsc]], used for
  * both attribute and text positions and by [[Trix]]): `& < > "` become
  * entities, `\n \r \t` become character references (keeping the
  * document line-oriented), and U+0000 — unrepresentable in XML 1.0
  * even escaped — is rejected loudly, the same contract as
  * [[NQuads.esc]].
  *
  * [[write]] frames the data parts with the `<?xml…?><rdf:RDF…>` header
  * and `</rdf:RDF>` footer as part files named to sort first/last, the
  * same mechanics as the `@prefix` header ([[NQuads.writePrefixHeader]]).
  * [[serialize]] (the HTTP transport surface) emits bare element lines —
  * the transport's banner/prefix framing already makes every negotiated
  * body a framed dialect, and the C2-aware readers drop the metadata.
  */
object RdfXml {

  private[sources] val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  /** XML escape for attribute AND text positions — one definition so the
    * two cannot drift. `&` first (escapes introduce no further `&`s to
    * escape after it); newline family as character references so one
    * statement stays one line.
    */
  private[sources] def xmlEsc(c: Column): Column = {
    val escaped = replace(replace(replace(replace(replace(replace(replace(c,
      lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")),
      lit(">"), lit("&gt;")),
      lit("\""), lit("&quot;")),
      lit("\n"), lit("&#10;")),
      lit("\r"), lit("&#13;")),
      lit("\t"), lit("&#9;"))
    when(c.contains("\u0000"), raise_error(concat(
      lit("RdfXml: literal contains U+0000, which XML 1.0 cannot " +
        "represent even as a character reference; refusing to serialise " +
        "statement with subject "), col("subject"))))
      .otherwise(escaped)
  }

  /** Inverse of [[xmlEsc]]: `&amp;` LAST — string replace is a single
    * left-to-right non-rescanning pass, so entities materialised by the
    * `&`-unescape can never be unescaped a second time.
    */
  private[sources] def xmlUnesc(c: Column): Column =
    replace(replace(replace(replace(replace(replace(replace(c,
      lit("&#10;"), lit("\n")),
      lit("&#13;"), lit("\r")),
      lit("&#9;"), lit("\t")),
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&amp;"), lit("&"))

  /** Header/footer part files framing a written document: names chosen
    * to sort before (`00000-`) and after (`zzzzz-`) every Spark
    * `part-*` file, so parts concatenated in name order form one valid
    * document — the footer twin of [[NQuads.writePrefixHeader]].
    */
  private[sources] def writeDocFrame(path: String, header: Seq[String],
                                     footer: Seq[String]): Unit = {
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "00000-header.xml"),
      header.mkString("", "\n", "\n"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "zzzzz-footer.xml"),
      footer.mkString("", "\n", "\n"))
  }

  /** Longest predicate suffix that is a legal XML element name; the `$`
    * anchor makes the first (leftmost) successful match the longest such
    * suffix.
    */
  private val LocalName = "([A-Za-z_][A-Za-z0-9_.-]*)$"

  /** One RDF/XML `Description` line per (subject, predicate, object).
    * Typed statement frames (round 6) use RDF/XML's own attribute
    * vocabulary: `rdf:resource` for IRI objects, `rdf:nodeID` for
    * bnodes (both on an empty property element), `xml:lang` and
    * `rdf:datatype` on literals; bnode SUBJECTS render as
    * `rdf:nodeID` in place of `rdf:about` (any frame — `_:` tokens are
    * self-describing). Legacy frames serialise byte-identically.
    */
  def serialize(statements: DataFrame): DataFrame = {
    val local = regexp_extract(col("predicate"), LocalName, 1)
    val ns = col("predicate").substr(lit(1),
      length(col("predicate")) - length(local))
    val open = concat(lit("<"), local, lit(" xmlns=\""), xmlEsc(ns), lit("\""))
    def close(extraAttr: Column): Column = concat(open, extraAttr,
      lit(">"), xmlEsc(col("object")), lit("</"), local, lit(">"))
    val prop =
      if (!statements.columns.contains("okind")) close(lit(""))
      else {
        val hasLang = statements.columns.contains("lang")
        val hasDt = statements.columns.contains("datatype")
        val litAttr =
          when(lit(hasLang) && col("lang").isNotNull,
            concat(lit(" xml:lang=\""), col("lang"), lit("\"")))
            .when(lit(hasDt) && col("datatype").isNotNull,
              concat(lit(" rdf:datatype=\""), xmlEsc(col("datatype")), lit("\"")))
            .otherwise(lit(""))
        when(col("okind") === "iri",
          concat(open, lit(" rdf:resource=\""), xmlEsc(col("object")), lit("\"/>")))
          .when(col("okind") === "bnode",
            concat(open, lit(" rdf:nodeID=\""),
              xmlEsc(col("object").substr(lit(3), length(col("object")))),
              lit("\"/>")))
          .otherwise(close(litAttr))
      }
    val subjAttr =
      when(col("subject").startsWith("_:"),
        concat(lit("rdf:nodeID=\""),
          xmlEsc(col("subject").substr(lit(3), length(col("subject")))), lit("\"")))
        .otherwise(concat(lit("rdf:about=\""), xmlEsc(col("subject")), lit("\"")))
    val line = when(local === "", raise_error(concat(
      lit("RdfXml: predicate has no XML-name local part and cannot be " +
        "expressed in RDF/XML: "), col("predicate"))))
      .otherwise(concat(
        lit("<rdf:Description "), subjAttr, lit(">"), prop,
        lit("</rdf:Description>")))
    statements.select(line.as("value"))
  }

  /** Distributed write framed as a complete RDF/XML document. */
  def write(statements: DataFrame, path: String): Unit = {
    serialize(statements).write.mode("overwrite").text(path)
    writeDocFrame(path,
      Seq("<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
        s"""<rdf:RDF xmlns:rdf="$RdfNs">"""),
      Seq("</rdf:RDF>"))
  }

  // groups: 1 subject attribute blob (about|nodeID), 2 local, 3 xmlns,
  // 4 extra-attribute blob (lang/datatype/resource/nodeID, possibly
  // empty), 5 literal text (absent on empty property elements)
  private val Line =
    "^<rdf:Description (rdf:(?:about|nodeID)=\"[^\"]*\")>" +
      "<([A-Za-z_][A-Za-z0-9_.-]*) xmlns=\"([^\"]*)\"" +
      "((?: [A-Za-z:]+=\"[^\"]*\")*)" +
      "(?:>([^<]*)</\\2>|/>)</rdf:Description>$"
  private val Framing = "^(<\\?xml|<rdf:RDF|</rdf:RDF>)"

  private val AAbout = "^rdf:about=\"([^\"]*)\"$"
  private val ANode = "^rdf:nodeID=\"([^\"]*)\"$"
  private val ALang = " xml:lang=\"([A-Za-z][A-Za-z0-9-]*)\""
  private val ADt = " rdf:datatype=\"([^\"]*)\""
  private val ARes = " rdf:resource=\"([^\"]*)\""
  private val ANodeAttr = " rdf:nodeID=\"([^\"]*)\""

  /** Parse back into the TYPED statement frame (triples only — RDF/XML
    * carries no graph): predicate = xmlns + local with the closing tag
    * backreference-checked; `rdf:resource`/`rdf:nodeID`/`xml:lang`/
    * `rdf:datatype` land in okind/lang/datatype, bnode ids re-prefixed
    * `_:`. Framing, `@prefix` and `#` comment lines are metadata;
    * malformed lines → all-null rows, the shared contract.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path))

  /** The parse transform alone (streaming composes). */
  def parseLines(lines: DataFrame): DataFrame = {
    val ok = col("value").rlike(Line)
    def grp(i: Int): Column = regexp_extract(col("value"), Line, i)
    def some(c: Column): Column =
      when(ok, c).otherwise(lit(null).cast("string"))
    val subjBlob = grp(1)
    val attrs = grp(4)
    def a(p: String): Column = regexp_extract(attrs, p, 1)
    val hasRes = attrs.rlike(ARes)
    val hasNode = attrs.rlike(ANodeAttr)
    val hasLang = attrs.rlike(ALang)
    val hasDt = attrs.rlike(ADt)
    val objectC =
      when(hasRes, xmlUnesc(a(ARes)))
        .when(hasNode, concat(lit("_:"), xmlUnesc(a(ANodeAttr))))
        .otherwise(xmlUnesc(grp(5)))
    val okindC =
      when(hasRes, lit("iri"))
        .when(hasNode, lit("bnode"))
        .when(grp(5).isNotNull, lit("literal"))
    lines
      .filter(!col("value").rlike(NQuads.FullLineComment) &&
        !col("value").rlike(Framing))
      .select(NQuads.stripTrailingComment(col("value"),
        Seq(Line)).as("value"))
      .filter(!col("value").rlike(NQuads.PrefixLine))
      .select(
        some(when(subjBlob.rlike(AAbout),
          xmlUnesc(regexp_extract(subjBlob, AAbout, 1)))
          .otherwise(concat(lit("_:"),
            xmlUnesc(regexp_extract(subjBlob, ANode, 1))))).as("subject"),
        some(concat(xmlUnesc(grp(3)), grp(2))).as("predicate"),
        some(objectC).as("object"),
        some(okindC).as("okind"),
        some(when(hasLang, a(ALang))).as("lang"),
        some(when(hasDt, xmlUnesc(a(ADt)))).as("datatype"))
  }
}
