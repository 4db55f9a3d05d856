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

  /** One RDF/XML `Description` line per (subject, predicate, object). */
  def serialize(statements: DataFrame): DataFrame = {
    val local = regexp_extract(col("predicate"), LocalName, 1)
    val ns = col("predicate").substr(lit(1),
      length(col("predicate")) - length(local))
    val line = when(local === "", raise_error(concat(
      lit("RdfXml: predicate has no XML-name local part and cannot be " +
        "expressed in RDF/XML: "), col("predicate"))))
      .otherwise(concat(
        lit("<rdf:Description rdf:about=\""), xmlEsc(col("subject")),
        lit("\"><"), local, lit(" xmlns=\""), xmlEsc(ns),
        lit("\">"), xmlEsc(col("object")),
        lit("</"), local, lit("></rdf:Description>")))
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

  private val Line =
    "^<rdf:Description rdf:about=\"([^\"]*)\"><([A-Za-z_][A-Za-z0-9_.-]*) " +
      "xmlns=\"([^\"]*)\">([^<]*)</\\2></rdf:Description>$"
  private val Framing = "^(<\\?xml|<rdf:RDF|</rdf:RDF>)"

  /** Parse back into a 3-column triple frame (predicate = xmlns + local;
    * the closing tag is backreference-checked against the opening one).
    * Framing, `@prefix` and `#` comment lines are metadata; malformed
    * lines → all-null rows, the shared contract.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val ok = col("value").rlike(Line)
    def grp(i: Int): Column = regexp_extract(col("value"), Line, i)
    def some(c: Column): Column =
      when(ok, c).otherwise(lit(null).cast("string"))
    spark.read.text(path)
      .filter(!col("value").rlike(NQuads.FullLineComment) &&
        !col("value").rlike(Framing))
      .select(NQuads.stripTrailingComment(col("value"),
        Seq(Line)).as("value"))
      .filter(!col("value").rlike(NQuads.PrefixLine))
      .select(
        some(xmlUnesc(grp(1))).as("subject"),
        some(concat(xmlUnesc(grp(3)), grp(2))).as("predicate"),
        some(xmlUnesc(grp(4))).as("object"))
  }
}
