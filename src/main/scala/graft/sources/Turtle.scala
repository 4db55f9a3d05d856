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
    * [[NQuads.writePrefixHeader]]).
    */
  private def lineBody(prefixes: Map[String, String]): Column = concat(
    iriTerm(col("subject"), prefixes), lit(" "),
    predicateTerm(col("predicate"), prefixes), lit(" \""),
    NQuads.esc(col("object")), lit("\" ."))

  /** One Turtle statement line per (subject, predicate, object) row. */
  def serialize(statements: DataFrame,
                prefixes: Map[String, String] = Map.empty): DataFrame =
    statements.select(lineBody(prefixes).as("value"))

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
    val body = lineBody(prefixes)
    val line = when(col("source").isNull, body)
      .otherwise(concat(iriTerm(col("source"), prefixes), lit(" { "),
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

  def readTrig(spark: SparkSession, path: String): DataFrame = {
    val prefixes = NQuads.readPrefixes(spark, path)
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
    spark.read.text(path)
      .filter(!col("value").rlike(NQuads.FullLineComment))
      .select(NQuads.stripTrailingComment(col("value"),
        Seq(TrigLine, Line, PrefixLine)).as("value"))
      .filter(!col("value").rlike(PrefixLine))
      .select(
        pick(2, 1)(resolve).as("subject"),
        pick(3, 2)(pred).as("predicate"),
        pick(4, 3)(NQuads.unesc).as("object"),
        pick(1, -1)(resolve).as("source"))
  }

  private val Line = "^(\\S+) (\\S+) \"(.*)\" \\.$"
  private val TrigLine = "^(\\S+) \\{ (\\S+) (\\S+) \"(.*)\" \\. \\}$"
  private val PrefixLine = "^@prefix ([^:]+): <([^>]*)> \\.$"

  /** Parse a Turtle file written by [[write]] back into a statement
    * frame, resolving CURIEs against the file's own `@prefix` header
    * (read driver-side first — bounded by the prefix count) and `a` back
    * to rdf:type. Malformed lines surface as all-null rows, same
    * contract as [[NQuads.read]].
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val prefixes = NQuads.readPrefixes(spark, path)
    def grp(i: Int): Column = regexp_extract(col("value"), Line, i)
    def resolve(t: Column): Column = resolveTerm(t, prefixes)
    val ok = col("value").rlike(Line)
    spark.read.text(path)
      .filter(!col("value").rlike(NQuads.FullLineComment))
      .select(NQuads.stripTrailingComment(col("value"),
        Seq(Line, PrefixLine)).as("value"))
      .filter(!col("value").rlike(PrefixLine))
      .select(
        when(ok, resolve(grp(1))).otherwise(lit(null).cast("string")).as("subject"),
        when(ok, resolvePred(grp(2), prefixes))
          .otherwise(lit(null).cast("string")).as("predicate"),
        when(ok, NQuads.unesc(grp(3))).otherwise(lit(null).cast("string")).as("object"))
  }
}
