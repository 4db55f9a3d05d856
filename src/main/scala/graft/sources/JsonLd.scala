package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSON-LD statement serialisation — the reference registry's `:jsonld`
  * entry (/root/reference/grafter.io/src/grafter_2/rdf4j/formats.clj:
  * 8-19 maps `application/ld+json` beside the line formats) re-expressed
  * as the flat, LINE-DELIMITED profile: one self-contained node object
  * per line,
  *
  * {{{
  *   triple  {"@id":"s","p":[{"@value":"o"}]}
  *   quad    {"@id":"g","@graph":[{"@id":"s","p":[{"@value":"o"}]}]}
  * }}}
  *
  * which is the newline-delimited cousin of JSON-LD flattened form —
  * every node carries its full IRIs, so no `@context` is needed for the
  * data lines to be interpretable. A prefix map passed to [[write]] is
  * recorded as a one-line `{"@context":{…}}` header part file (the
  * `write-prefixes` analog, metadata not data — [[read]] drops it,
  * [[readContext]] recovers it).
  *
  * Escaping is [[NQuads.esc]], SHARED with the N-Triples family: the
  * five C-style escapes (`\\ \" \n \r \t`) mean exactly the same thing
  * in a JSON string, and the U+0000 rejection carries over (NUL is the
  * shared unescape sentinel). All four term positions are escaped —
  * JSON string syntax requires it of every member — though an IRI
  * containing `"` or `\` parses back as the all-null malformed row
  * rather than round-tripping (the same restriction class as `>` inside
  * an N-Quads IRI).
  *
  * Like every statement parser (C2 contract, [[StatementFormats]]):
  * full-line `#` comments, grammar-guarded trailing comments, and
  * `@prefix`/`@context` metadata lines are stripped — the HTTP transport
  * frames every negotiated body with banner/prefix/end-marker lines
  * regardless of dialect.
  */
object JsonLd {

  /** A JSON string body: any run of non-quote/non-backslash chars or
    * backslash escapes — disjoint alternatives, so the match is linear.
    */
  private val Str = "((?:[^\"\\\\]|\\\\.)*)"

  /** The object-position JSON term (typed model, round 6): a literal
    * `{"@value":…}` with optional `@language`/`@type`, or an IRI/bnode
    * `{"@id":…}` — captured whole by the line grammars, classified by
    * the `J*` patterns below. Non-capturing inside, so line-group
    * numbering is stable.
    */
  private val StrNc = "(?:[^\"\\\\]|\\\\.)*"
  private val ObjTok =
    s"(\\{\"@(?:value|id)\":\"$StrNc\"" +
      s"(?:,\"@(?:language|type)\":\"$StrNc\")?\\})"

  private val TripleLine =
    s"^\\{\"@id\":\"$Str\",\"$Str\":\\[$ObjTok\\]\\}$$"
  private val QuadLine =
    s"^\\{\"@id\":\"$Str\",\"@graph\":\\[\\{\"@id\":\"$Str\",\"$Str\":" +
      s"\\[$ObjTok\\]\\}\\]\\}$$"
  private val ContextLine = "^\\{\"@context\":\\{.*\\}\\}$"

  private val JId = s"^\\{\"@id\":\"$Str\"\\}$$"
  private val JLang =
    s"^\\{\"@value\":\"$Str\",\"@language\":\"([A-Za-z][A-Za-z0-9-]*)\"\\}$$"
  private val JType = s"^\\{\"@value\":\"$Str\",\"@type\":\"$Str\"\\}$$"
  private val JPlain = s"^\\{\"@value\":\"$Str\"\\}$$"

  /** One flat JSON-LD node line per statement row; frames without a
    * `source` column — or rows with a null source — emit bare node
    * lines, quad rows wrap the node in the graph's `@graph` (triple =
    * quad with nil context, the shared statement-model contract).
    */
  def serialize(statements: DataFrame): DataFrame = {
    def e(c: Column): Column = NQuads.esc(c)
    // typed frames render JSON-LD's native object terms: {"@id":…} for
    // IRIs and bnodes (bnode tokens already carry their `_:`),
    // @language / @type members for tagged/typed literals; legacy
    // frames emit the plain {"@value":…} byte-for-byte as before
    val plainObj = concat(lit("{\"@value\":\""), e(col("object")), lit("\"}"))
    val obj =
      if (!statements.columns.contains("okind")) plainObj
      else {
        val hasLang = statements.columns.contains("lang")
        val hasDt = statements.columns.contains("datatype")
        val lit0 = concat(lit("{\"@value\":\""), e(col("object")),
          when(lit(hasLang) && col("lang").isNotNull,
            concat(lit("\",\"@language\":\""), col("lang")))
            .when(lit(hasDt) && col("datatype").isNotNull,
              concat(lit("\",\"@type\":\""), e(col("datatype"))))
            .otherwise(lit("")),
          lit("\"}"))
        when(col("okind") === "iri" || col("okind") === "bnode",
          concat(lit("{\"@id\":\""), e(col("object")), lit("\"}")))
          .otherwise(lit0)
      }
    val node = concat(
      lit("{\"@id\":\""), e(col("subject")), lit("\",\""),
      e(col("predicate")), lit("\":["), obj, lit("]}"))
    val line =
      if (!statements.columns.contains("source")) node
      else when(col("source").isNull, node)
        .otherwise(concat(lit("{\"@id\":\""), e(col("source")),
          lit("\",\"@graph\":["), node, lit("]}")))
    statements.select(line.as("value"))
  }

  /** Distributed text write; a non-empty prefix map lands as a one-line
    * `{"@context":{…}}` header part file named to sort before every data
    * part (the same mechanics as [[NQuads.writePrefixHeader]]).
    */
  def write(statements: DataFrame, path: String,
            prefixes: Map[String, String] = Map.empty): Unit = {
    serialize(statements).write.mode("overwrite").text(path)
    if (prefixes.nonEmpty) {
      val ctx = prefixes.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":"$v"""" }
        .mkString("{\"@context\":{", ",", "}}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path, "00000-context.jsonld"), ctx + "\n")
    }
  }

  /** Parse a flat JSON-LD file back into the 4-column statement frame:
    * graph-wrapped nodes surface with their `source`, bare nodes with
    * `source = null`. Malformed lines → all-null rows (the shared
    * contract); `@context`/`@prefix` and `#` comment lines are metadata.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path))

  /** The parse transform alone (streaming composes). */
  def parseLines(lines: DataFrame): DataFrame = {
    val isQuad = col("value").rlike(QuadLine)
    val isTriple = col("value").rlike(TripleLine)
    def grp(p: String, i: Int): Column = regexp_extract(col("value"), p, i)
    def rawPick(quadIdx: Int, tripleIdx: Int): Column =
      when(isQuad, grp(QuadLine, quadIdx))
        .when(isTriple && lit(tripleIdx) > 0, grp(TripleLine, tripleIdx))
        .otherwise(lit(null).cast("string"))
    def pick(quadIdx: Int, tripleIdx: Int): Column =
      NQuads.unesc(rawPick(quadIdx, tripleIdx))
    // classify the captured object term (typed model)
    val tok = rawPick(4, 3)
    def t(p: String, i: Int): Column = regexp_extract(tok, p, i)
    val idVal = NQuads.unesc(t(JId, 1))
    val objectC =
      when(tok.rlike(JId), idVal)
        .when(tok.rlike(JLang), NQuads.unesc(t(JLang, 1)))
        .when(tok.rlike(JType), NQuads.unesc(t(JType, 1)))
        .when(tok.rlike(JPlain), NQuads.unesc(t(JPlain, 1)))
    val okindC =
      when(tok.rlike(JId),
        when(idVal.startsWith("_:"), lit("bnode")).otherwise(lit("iri")))
        .when(tok.rlike(JLang) || tok.rlike(JType) || tok.rlike(JPlain),
          lit("literal"))
    val langC = when(tok.rlike(JLang), t(JLang, 2))
    val dtC = when(tok.rlike(JType), NQuads.unesc(t(JType, 2)))
    lines
      .filter(!col("value").rlike(NQuads.FullLineComment))
      .select(NQuads.stripTrailingComment(col("value"),
        Seq(QuadLine, TripleLine, ContextLine)).as("value"))
      .filter(!col("value").rlike(ContextLine) &&
        !col("value").rlike(NQuads.PrefixLine))
      .select(
        pick(2, 1).as("subject"),
        pick(3, 2).as("predicate"),
        objectC.as("object"),
        okindC.as("okind"),
        langC.as("lang"),
        dtC.as("datatype"),
        pick(1, -1).as("source"))
  }

  /** The `@context` header of a written file (empty when none); the
    * driver-side collect is bounded by the prefix count.
    */
  def readContext(spark: SparkSession, path: String): Map[String, String] = {
    val Pair = "\"([^\"]+)\":\"([^\"]*)\"".r
    spark.read.text(path)
      .filter(col("value").rlike(ContextLine))
      .collect().flatMap(r => Pair.findAllMatchIn(r.getString(0))
        .map(m => m.group(1) -> m.group(2)))
      .toMap
  }
}
