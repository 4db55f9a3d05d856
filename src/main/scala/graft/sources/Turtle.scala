package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Turtle statement serialisation — the reference's single most-used
  * output format (RDF4j Rio `:ttl`, /root/reference/grafter.io/src/
  * grafter_2/rdf4j/formats.clj:8-19; writer + prefix header io.clj:
  * 500-582) as pure Column transforms, sharing one escaping definition
  * with [[NQuads]]:
  *
  * {{{
  *   (subject, predicate, object)  →  doc:42 dct:title "…" .
  * }}}
  *
  * What Turtle adds over N-Triples, re-expressed here:
  *  - CURIE compaction against the caller's prefix map (the namespace
  *    splice of [[Prefixes]], longest namespace first), with a
  *    conservative PN_LOCAL safety subset — a local part outside
  *    `[A-Za-z0-9_][A-Za-z0-9_.-]*` (or ending in '.') falls back to the
  *    always-legal `<iri>` form rather than emitting invalid Turtle;
  *  - the `a` keyword for `rdf:type` predicates;
  *  - an `@prefix` header (key-sorted, same mechanics as the NQuads
  *    header — a part file sorting before every data part).
  *
  * Statements are triples (Turtle carries no graph component — quads go
  * to [[NQuads]]); objects are literals with the shared N-Triples
  * escaping. `parse ∘ serialise = id` on statement frames is pinned by
  * CodecSpec round-trips against the NQuads path.
  */
object Turtle {

  /** The rdf:type IRI the `a` keyword abbreviates. */
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** Conservative safe subset of Turtle's PN_LOCAL grammar: what we are
    * certain serialises legally as the local part of a CURIE. Anything
    * else (percent escapes, colons, unicode ranges, trailing dot) is
    * legal as `<iri>`, so falling back loses nothing but compactness.
    */
  private val SafeLocal = "^[A-Za-z0-9_][A-Za-z0-9_.-]*$"

  /** IRI column → Turtle term: longest-namespace CURIE when the local
    * part is in the safe subset, else `<iri>`. Chained `when`s over the
    * original value — one codegen'd pass, the [[Prefixes.compact]] shape
    * with the safety test fused in.
    */
  private def iriTerm(c: Column, prefixes: Map[String, String]): Column =
    prefixes.toSeq.sortBy { case (p, ns) => (-ns.length, p) }
      .foldRight(concat(lit("<"), c, lit(">")): Column) { case ((p, ns), els) =>
        val local = c.substr(lit(ns.length + 1), length(c))
        when(c.startsWith(ns) && local.rlike(SafeLocal) && !local.endsWith("."),
          concat(lit(s"$p:"), local))
          .otherwise(els)
      }

  private def predicateTerm(c: Column, prefixes: Map[String, String]): Column =
    when(c === RdfType, lit("a")).otherwise(iriTerm(c, prefixes))

  /** THE statement-line body — one definition shared by the Turtle and
    * TriG serialisers so escaping/CURIE fixes cannot drift between the
    * two formats (the same single-definition rule as
    * [[NQuads.writePrefixHeader]]). Typed statement frames render IRI
    * objects as CURIE-compacted terms, bnodes raw, and literal
    * `@lang`/`^^dt` suffixes (datatypes CURIE-compacted too); legacy
    * frames render plain quoted literals exactly as before.
    */
  private def lineBody(statements: DataFrame,
                       prefixes: Map[String, String]): Column = {
    val compact = Some((c: Column) => iriTerm(c, prefixes))
    concat(
      RdfTerms.renderResource(col("subject"), compact), lit(" "),
      predicateTerm(col("predicate"), prefixes), lit(" "),
      RdfTerms.renderObject(statements, compact), lit(" ."))
  }

  /** One Turtle statement line per (subject, predicate, object) row. */
  def serialize(statements: DataFrame,
                prefixes: Map[String, String] = Map.empty): DataFrame =
    statements.select(lineBody(statements, prefixes).as("value"))

  /** Distributed text write with the `@prefix` header file (same
    * name-sorts-first mechanics as [[NQuads.write]]).
    */
  def write(statements: DataFrame, path: String,
            prefixes: Map[String, String] = Map.empty): Unit = {
    serialize(statements, prefixes).write.mode("overwrite").text(path)
    NQuads.writePrefixHeader(path, prefixes)
  }

  /** TriG statement lines — Turtle's quad extension (reference registry
    * `formats.clj:8-19` lists `:trig` beside `:ttl`): each row with a
    * non-null `source` emits one single-statement graph block
    * `g { s p o . }` (repeated blocks of one graph name merge, per the
    * TriG grammar), null-source rows emit plain Turtle triple lines — the
    * same "triple = quad with null context" contract as [[NQuads]].
    */
  def serializeTrig(statements: DataFrame,
                    prefixes: Map[String, String] = Map.empty): DataFrame = {
    if (!statements.columns.contains("source"))
      return serialize(statements, prefixes) // all-triple frame = Turtle
    val body = lineBody(statements, prefixes)
    val line = when(col("source").isNull, body)
      .otherwise(concat(
        RdfTerms.renderResource(col("source"),
          Some((c: Column) => iriTerm(c, prefixes))), lit(" { "),
        body, lit(" }")))
    statements.select(line.as("value"))
  }

  /** Distributed TriG write with the `@prefix` header file. */
  def writeTrig(statements: DataFrame, path: String,
                prefixes: Map[String, String] = Map.empty): Unit = {
    serializeTrig(statements, prefixes).write.mode("overwrite").text(path)
    NQuads.writePrefixHeader(path, prefixes)
  }

  /** Parse a TriG file written by [[writeTrig]]: graph blocks surface
    * with their `source`, bare triple lines with `source = null` — the
    * NQuads 4-column schema, so the two quad formats round-trip through
    * one statement model.
    */
  /** Parse-side term resolution — the shared inverse of [[iriTerm]] /
    * [[predicateTerm]]: `<iri>` unwraps, CURIEs expand against the file's
    * prefix map, `a` resolves back to rdf:type.
    */
  private def resolveTerm(t: Column, prefixes: Map[String, String]): Column =
    when(t.startsWith("<"), t.substr(lit(2), length(t) - 2))
      .otherwise(Prefixes.expand(t, prefixes))

  private def resolvePred(t: Column, prefixes: Map[String, String]): Column =
    when(t === "a", lit(RdfType)).otherwise(resolveTerm(t, prefixes))

  def readTrig(spark: SparkSession, path: String): DataFrame =
    parseTrigLines(spark.read.text(path), NQuads.readPrefixes(spark, path))

  /** The TriG parse transform alone (streaming composes; prefixes are
    * caller-supplied — an unbounded stream has no finite header).
    */
  def parseTrigLines(lines: DataFrame,
                     prefixes: Map[String, String] = Map.empty): DataFrame = {
    def resolve(t: Column): Column = resolveTerm(t, prefixes)
    def pred(t: Column): Column = resolvePred(t, prefixes)
    val isQuad = col("value").rlike(TrigLine)
    val isTriple = col("value").rlike(Line)
    def g(pattern: String, i: Int): Column =
      regexp_extract(col("value"), pattern, i)
    def pick(quadIdx: Int, tripleIdx: Int)(f: Column => Column): Column =
      when(isQuad, f(g(TrigLine, quadIdx)))
        .when(isTriple && lit(tripleIdx) > 0, f(g(Line, tripleIdx)))
        .otherwise(lit(null).cast("string"))
    val parsedObj = RdfTerms.parseObject(pick(4, 3)(identity),
      turtle = true, prefixes = prefixes)
    lines
      .filter(length(trim(col("value"))) > 0) // blank lines are not statements
      .filter(!col("value").rlike(NQuads.FullLineComment))
      .select(NQuads.stripTrailingComment(col("value"),
        Seq(TrigLine, Line, PrefixLine)).as("value"))
      .filter(!col("value").rlike(PrefixLine))
      .select(
        pick(2, 1)(resolve).as("subject"),
        pick(3, 2)(pred).as("predicate"),
        parsedObj(0).as("object"),
        parsedObj(1).as("okind"),
        parsedObj(2).as("lang"),
        parsedObj(3).as("datatype"),
        pick(1, -1)(resolve).as("source"))
  }

  // full Turtle object-term alternation ([[RdfTerms.objTokenPat]]):
  // quoted literals (escape-aware) with @lang / ^^<iri> / ^^curie
  // suffixes, <iri>, _:bnode, and the bare shorthands (boolean /
  // integer / decimal / double / CURIE)
  // ---- DOCUMENT reader (third-party Turtle, round 6) ----

  /** One list-body token: a quoted literal (escape-aware, optional
    * lang/datatype suffix), `<iri>`, bnode, bare shorthand (CURIE /
    * boolean / numeric — never containing `;`/`,`), or a separator.
    */
  private val ListTok =
    "(?:" + RdfTerms.QuotedLitPat +
      "(?:@[A-Za-z][A-Za-z0-9-]*|\\^\\^<[^>]*>|\\^\\^(?:[A-Za-z_][\\w.-]*)?:[^\\s;,]*)?" +
      "|<[^>]*>|_:[^\\s;,]+|[^\"<\\s;,][^\\s;,]*|;|,)"

  /** Parse THIRD-PARTY Turtle the statement-oriented way: the input is
    * split on the ` .` statement terminator (so a statement may span
    * any number of physical lines — the predicate-list layout of real
    * ontology files, e.g. the reference's `foaf.ttl` fixture), comment
    * lines are dropped, whitespace runs collapse, and each statement's
    * `subject p1 o1, o2; p2 o3` body unrolls into one row per
    * (predicate, object) pair via a columnar state machine — no UDFs,
    * one `aggregate` over the token array. CURIEs/`a` resolve against
    * the document's own `@prefix` header; objects take the full typed
    * term grammar ([[RdfTerms.parseObject]]).
    *
    * Documented limits (all-null rows, the malformed contract): triple-
    * quoted multiline literals; a literal containing the exact sequence
    * `" ."` (it reads as a statement terminator); inline `[...]` bnode
    * property lists and collections.
    */
  def readDocument(spark: SparkSession, path: String): DataFrame = {
    val prefixes = NQuads.readPrefixes(spark, path)
    // chunks = statements: ' .' ends a statement (also @prefix lines,
    // filtered below). Trailing chunk holds only whitespace.
    val chunks = spark.read.option("lineSep", " .").text(path)
      // comment LINES inside a chunk (incl. file banners gluing to the
      // following statement) go first, then whitespace normalizes
      .select(regexp_replace(col("value"), "(?m)^\\s*#[^\\n]*$", "").as("value"))
      .select(trim(regexp_replace(col("value"), "\\s+", " ")).as("value"))
      .filter(length(col("value")) > 0)
      .filter(!col("value").startsWith("@prefix"))
    val toks = regexp_extract_all(col("value"), lit(ListTok), lit(0))
    // full-consumption check: stripping every token must leave only
    // whitespace, else the chunk is malformed (never silently partial)
    val consumed = regexp_replace(col("value"), ListTok, "")
    val matched = consumed.rlike("^\\s*$") && size(toks) >= lit(3)
    // state machine over the body tokens: 0 = expect predicate,
    // 1 = expect object, 2 = after object (separator or end legal)
    val pairT = "array<struct<p:string,o:string>>"
    def mk(pred: Column, st: Column, err: Column, out: Column): Column =
      struct(pred.as("pred"), st.as("st"), err.as("err"), out.as("out"))
    val init = mk(lit(null).cast("string"), lit(0), lit(false),
      array().cast(pairT))
    val folded = aggregate(slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      init, (acc, t) => {
        val pred = acc.getField("pred"); val st = acc.getField("st")
        val err = acc.getField("err"); val out = acc.getField("out")
        when(err, acc)
          .when(t === ";",
            when(st === 2, mk(lit(null).cast("string"), lit(0), lit(false), out))
              .otherwise(mk(pred, st, lit(true), out)))
          .when(t === ",",
            when(st === 2, mk(pred, lit(1), lit(false), out))
              .otherwise(mk(pred, st, lit(true), out)))
          .when(st === 0, mk(t, lit(1), lit(false), out))
          .when(st === 1, mk(pred, lit(2), lit(false),
            array_append(out, struct(pred.as("p"), t.as("o")))))
          .otherwise(mk(pred, st, lit(true), out))
      })
    val ok = matched && !folded.getField("err") && folded.getField("st") === 2
    val nullPair = array(struct(lit(null).cast("string").as("p"),
      lit(null).cast("string").as("o")))
    val pairs = when(ok, folded.getField("out")).otherwise(nullPair)
    val subjTok = when(ok, element_at(toks, 1)).otherwise(lit(null).cast("string"))
    val exploded = chunks.select(subjTok.as("_st"),
      explode(pairs).as("_pair"))
    val parsedObj = RdfTerms.parseObject(col("_pair.o"),
      turtle = true, prefixes = prefixes)
    exploded.select(
      resolveTerm(col("_st"), prefixes).as("subject"),
      resolvePred(col("_pair.p"), prefixes).as("predicate"),
      parsedObj(0).as("object"),
      parsedObj(1).as("okind"),
      parsedObj(2).as("lang"),
      parsedObj(3).as("datatype"))
  }

  private val Line = s"^(\\S+) (\\S+) (${RdfTerms.objTokenPat(turtle = true)}) \\.$$"
  private val TrigLine =
    s"^(\\S+) \\{ (\\S+) (\\S+) (${RdfTerms.objTokenPat(turtle = true)}) \\. \\}$$"
  private val PrefixLine = NQuads.PrefixLine

  /** Parse a Turtle file back into a TYPED statement frame `(subject,
    * predicate, object, okind, lang, datatype)`, resolving CURIEs
    * against the file's own `@prefix` header (read driver-side first —
    * bounded by the prefix count) and `a` back to rdf:type. Beyond the
    * engine's own output, this reads the single-line constructs of
    * third-party Turtle — IRI/CURIE objects, language tags, typed
    * literals (`^^xsd:…` or `^^<…>`), bare boolean/integer/decimal/
    * double shorthands, bnode subjects/objects (the reference's own
    * fixtures `rdf-types.ttl`, `1.nt`, `bnodes.nt` — FormatSpec reads
    * them verbatim). Multiline literals, predicate/object lists and
    * bnode property paths are NOT line-expressible: such lines surface
    * as all-null rows, same contract as [[NQuads.read]].
    */
  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path), NQuads.readPrefixes(spark, path))

  /** The Turtle line-parse transform alone (streaming composes;
    * prefixes are caller-supplied — an unbounded stream has no finite
    * header).
    */
  def parseLines(lines: DataFrame,
                 prefixes: Map[String, String] = Map.empty): DataFrame = {
    def grp(i: Int): Column = regexp_extract(col("value"), Line, i)
    def resolve(t: Column): Column = resolveTerm(t, prefixes)
    val ok = col("value").rlike(Line)
    def tok(i: Int): Column =
      when(ok, grp(i)).otherwise(lit(null).cast("string"))
    val parsedObj = RdfTerms.parseObject(tok(3),
      turtle = true, prefixes = prefixes)
    lines
      .filter(length(trim(col("value"))) > 0) // blank lines are not statements
      .filter(!col("value").rlike(NQuads.FullLineComment))
      .select(NQuads.stripTrailingComment(col("value"),
        Seq(Line, PrefixLine)).as("value"))
      .filter(!col("value").rlike(PrefixLine))
      .select(
        tok(1).cast("string").as("_s"),
        tok(2).cast("string").as("_p"),
        parsedObj(0).as("object"),
        parsedObj(1).as("okind"),
        parsedObj(2).as("lang"),
        parsedObj(3).as("datatype"))
      .select(
        resolve(col("_s")).as("subject"),
        resolvePred(col("_p"), prefixes).as("predicate"),
        col("object"), col("okind"), col("lang"), col("datatype"))
  }
}
