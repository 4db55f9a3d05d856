package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-Quads / N-Triples statement serialisation — the line-oriented RDF
  * sink/source the reference writes through RDF4j Rio (`rdf-writer`,
  * /root/reference/grafter.io/src/grafter_2/rdf4j/io.clj:500-582;
  * N-Triples literal escaping io.clj:253-263) re-expressed as pure Column
  * transforms over statement frames:
  *
  * {{{
  *   (subject, predicate, object, source)  →  <s> <p> "o" <source> .   (.nq)
  *   (subject, predicate, object)          →  <s> <p> "o" .            (.nt)
  * }}}
  *
  * A triple IS a quad with a null context (reference
  * protocols.cljc:396-406): a frame without a `source` column — or with a
  * null source value — serialises as an N-Triples line; the parser returns
  * a 4-column frame with `source = null` for triple lines, so the two
  * formats round-trip through one schema.
  *
  * Objects are literals with N-Triples string escaping (\\ \" \n \r \t);
  * subject/predicate/graph render as IRIs. `parse ∘ serialise = id` is
  * pinned by the round-trip spec, mirroring the reference's own round-trip
  * tests (io_test.clj:187-223). Distributed text write/read — one line per
  * statement, no driver materialisation.
  *
  * A prefix map can be written as a file header (`@prefix k: <iri> .`
  * lines, key-sorted), the analog of the reference's `write-prefixes`
  * header (io.clj:500-582; ordering pinned like io_test.clj:284-397). The
  * header lands in a part file whose name sorts before every data part, so
  * the concatenated-in-name-order document starts with the prefixes.
  *
  * A literal containing U+0000 cannot be represented (it is the unescape
  * sentinel): serialisation REJECTS it loudly with `raise_error` instead of
  * corrupting silently.
  */
object NQuads {

  private val Nul = "\u0000"

  private[sources] def esc(c: Column): Column = {
    val escaped = replace(replace(replace(replace(replace(c,
      lit("\\"), lit("\\\\")),
      lit("\""), lit("\\\"")),
      lit("\n"), lit("\\n")),
      lit("\r"), lit("\\r")),
      lit("\t"), lit("\\t"))
    when(c.contains(Nul), raise_error(concat(
      lit("NQuads: literal contains U+0000 (the unescape sentinel) and " +
        "cannot round-trip; refusing to serialise statement with subject "),
      col("subject"))))
      .otherwise(escaped)
  }

  private[sources] def unesc(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("\\\\"), lit(Nul)),
      lit("\\\""), lit("\"")),
      lit("\\n"), lit("\n")),
      lit("\\r"), lit("\r")),
      lit("\\t"), lit("\t")),
      lit(Nul), lit("\\"))

  /** One N-Quads / N-Triples line per statement row. Frames without a
    * `source` column — or rows whose source is null — emit triple lines.
    * Typed statement frames (carrying [[RdfTerms.TypedCols]]) render IRI
    * objects, bnodes and language/datatype literal suffixes; legacy
    * frames render plain quoted literals exactly as before.
    */
  def serialize(statements: DataFrame): DataFrame = {
    val head = concat(
      RdfTerms.renderResource(col("subject")), lit(" <"), col("predicate"),
      lit("> "), RdfTerms.renderObject(statements))
    val line =
      if (!statements.columns.contains("source")) concat(head, lit(" ."))
      else when(col("source").isNull, concat(head, lit(" .")))
        .otherwise(concat(head, lit(" "),
          RdfTerms.renderResource(col("source")), lit(" .")))
    statements.select(line.as("value"))
  }

  /** Distributed text write of the statement frame; `prefixes` (optional)
    * are written as an `@prefix` header file that sorts before every data
    * part, so readers concatenating parts in name order see the header
    * first — the reference's `write-prefixes` semantics.
    */
  def write(statements: DataFrame, path: String,
            prefixes: Map[String, String] = Map.empty): Unit = {
    serialize(statements).write.mode("overwrite").text(path)
    writePrefixHeader(path, prefixes)
  }

  /** The `@prefix` header file (key-sorted, named to sort before every
    * data part) — ONE definition shared by every statement writer
    * (N-Quads/N-Triples here, Turtle and TriG in [[Turtle]]), so header
    * mechanics cannot drift between formats.
    */
  private[sources] def writePrefixHeader(path: String,
                                         prefixes: Map[String, String]): Unit =
    if (prefixes.nonEmpty) {
      val lines = prefixes.toSeq.sortBy(_._1)
        .map { case (k, v) => s"@prefix $k: <$v> ." }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path, "00000-prefixes.txt"),
        lines.mkString("", "\n", "\n"))
    }

  // full N-Triples/N-Quads term grammar: bnode subjects/graphs, and the
  // complete object-term alternation (IRI / bnode / plain / @lang /
  // ^^<datatype> literal) from [[RdfTerms.objTokenPat]]. Groups: subject,
  // predicate-IRI, object token[, graph].
  private val ResTok = "(<[^>]*>|_:\\S+)"
  private val QuadLine =
    s"^$ResTok <([^>]*)> (${RdfTerms.objTokenPat(turtle = false)}) $ResTok \\.$$"
  private val TripleLine =
    s"^$ResTok <([^>]*)> (${RdfTerms.objTokenPat(turtle = false)}) \\.$$"
  // prefix names may be EMPTY (`@prefix : <ns> .` — the default
  // namespace, the reference fixtures' own shape)
  private[sources] val PrefixLine = "^@prefix ([^:\\s]*): <([^>]*)> \\.$"

  /** Comment handling (C2 — the reference strips `#` comments from query
    * text before processing, `strip-comments`
    * /root/reference/grafter.repository/src/clj/grafter_2/rdf4j/
    * sparql.clj:115-121, applied in pre-process-query:134-139; recast
    * here onto the statement-text surface a lake engine actually parses):
    * full-line `# …` lines are dropped by the readers, and trailing
    * ` # …` comments are stripped — GRAMMAR-GUARDED twice over. A line
    * matching a statement grammar intact is untouched, so a `#` inside a
    * quoted literal (or an IRI fragment id) can never be truncated; and a
    * strip CANDIDATE is only ever used when the remainder itself matches
    * the grammar, so no strip can corrupt a statement. Candidate comment
    * starts are `\s+#` sites directly after a statement terminator
    * (`.`/`}` — the only place a trailing comment can legally begin);
    * the first and the last such site are both tried, which covers
    * literals containing `. # ` on either side of the real comment.
    * Lines where neither candidate parses stay as-is (the all-null
    * malformed contract). The reference's whitespace-guarded regex has
    * the literal-`#` blind spot on query strings; on data lines the
    * known grammar closes it.
    */
  private[sources] val FullLineComment = "^\\s*#"

  private[sources] def stripTrailingComment(line: Column,
                                            grammar: Seq[String]): Column = {
    def ok(c: Column): Column = grammar.map(c.rlike).reduce(_ || _)
    // first terminator-adjacent site (lookbehind keeps non-terminator
    // `#`s — e.g. inside a literal — from ever being a candidate);
    // terminators: `.` (N-family), `}` (TriG/JSON-LD), `>` (XML formats)
    val first = regexp_replace(line, "(?<=[.}>])\\s+#[^\\n]*$", "")
    // last terminator-adjacent site (greedy prefix)
    val last = regexp_extract(line, "^(.*[.}>])\\s+#[^\\n]*$", 1)
    when(ok(line), line)
      .when(ok(first), first)
      .when(ok(last), last)
      .otherwise(line)
  }

  /** Parse an N-Quads/N-Triples file back into a TYPED statement frame
    * `(subject, predicate, object, okind, lang, datatype, source)` —
    * the full term grammar: IRI / bnode / language-tagged / datatyped
    * objects ([[RdfTerms.parseObject]]), bnode subjects and graphs
    * (riding as their raw `_:label` token). Triple lines surface with
    * `source = null` (triple = quad with nil context). `@prefix` header
    * lines are metadata, not data — dropped here, read via
    * [[readPrefixes]]. Comment lines and grammar-guarded trailing
    * comments are stripped (C2, [[stripTrailingComment]]). Malformed
    * lines surface as all-null rows — distinguishable from data, since
    * regexp_extract alone would return empty strings (route them through
    * [[graft.cdc.Quarantine]]-style handling upstream if the input is
    * untrusted).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path))

  /** The parse TRANSFORM alone — a single-`value`-column frame of lines
    * (batch or STREAMING: `spark.readStream.text(dir)` composes
    * directly, making any dropbox of statement files a structured
    * stream) → the typed statement frame.
    */
  def parseLines(lines: DataFrame): DataFrame = {
    val isQuad = col("value").rlike(QuadLine)
    val isTriple = col("value").rlike(TripleLine)
    def grp(pattern: String, i: Int): Column = regexp_extract(col("value"), pattern, i)
    def tok(i: Int): Column =
      when(isQuad, grp(QuadLine, i))
        .when(isTriple && lit(i) <= 3, grp(TripleLine, i))
        .otherwise(lit(null).cast("string"))
    // `<iri>` unwraps; `_:label` rides raw (self-describing — IRIs can
    // never start with `_:`)
    def res(c: Column): Column =
      when(c.startsWith("<"), c.substr(lit(2), length(c) - 2)).otherwise(c)
    val parsedObj = RdfTerms.parseObject(tok(3))
    lines
      .filter(length(trim(col("value"))) > 0) // blank lines are not statements
      .filter(!col("value").rlike(FullLineComment))
      .select(stripTrailingComment(col("value"),
        Seq(QuadLine, TripleLine, PrefixLine)).as("value"))
      .filter(!col("value").rlike(PrefixLine))
      .select(
        res(tok(1)).as("subject"),
        tok(2).as("predicate"),
        parsedObj(0).as("object"),
        parsedObj(1).as("okind"),
        parsedObj(2).as("lang"),
        parsedObj(3).as("datatype"),
        res(tok(4)).as("source"))
  }

  /** The prefix header of a written statement file (empty map when none).
    * Driver-side collect is bounded by the prefix count.
    */
  def readPrefixes(spark: SparkSession, path: String): Map[String, String] =
    spark.read.text(path)
      .select(stripTrailingComment(col("value"), Seq(PrefixLine)).as("value"))
      .filter(col("value").rlike(PrefixLine))
      .select(regexp_extract(col("value"), PrefixLine, 1).as("k"),
        regexp_extract(col("value"), PrefixLine, 2).as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
}
