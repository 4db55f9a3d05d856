package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The RDF OBJECT-TERM grammar shared by the statement readers and
  * writers — the typed-object extension of the statement model. The
  * reference parses full-spec RDF through Rio and hands applications
  * typed objects (IRI / language literal / typed literal / bnode —
  * `io.clj:649-678`, `formats.clj:149-189`; its fixtures `1.nt`,
  * `rdf-types.ttl`, `bnodes.nt` exercise exactly these constructs). Our
  * statement frame carries the same information as three ADDITIVE
  * columns next to `object`:
  *
  *  - `okind`    : "iri" | "literal" | "bnode" (null on malformed rows)
  *  - `lang`     : language tag for language-tagged literals, else null
  *  - `datatype` : datatype IRI for typed literals, else null
  *
  * Frames WITHOUT these columns (every pre-existing producer) serialise
  * exactly as before — plain quoted literals — so the typed model is a
  * strict extension, not a migration. Blank nodes ride as their raw
  * `_:label` token in subject/object/source columns: IRIs can never
  * start with `_:`, so the token is self-describing and round-trips
  * through the subject position without a subject-kind column.
  *
  * Turtle-only surface (numeric/boolean shorthand, CURIE datatypes) is
  * parameterised by the file's prefix map; the N-family passes none.
  * NOT parsed (documented all-null, per the malformed-row contract):
  * multiline literals, predicate/object lists, bnode property paths —
  * constructs that span lines and cannot be line-grammar'd.
  */
object RdfTerms {

  val XsdNs = "http://www.w3.org/2001/XMLSchema#"

  /** Columns the typed statement model adds next to `object`. */
  val TypedCols: Seq[String] = Seq("okind", "lang", "datatype")

  // ---- object-term classification (read side) ----

  private val IriTok = "^<([^>]*)>$"
  private val BnodeTok = "^_:\\S+$"
  private val PlainLit = "^\"(.*)\"$"
  private val LangLit = "^\"(.*)\"@([A-Za-z][A-Za-z0-9-]*)$"
  private val TypedLitIri = "^\"(.*)\"\\^\\^<([^>]*)>$"
  // Turtle shorthand (never legal in the N-family); CURIE prefixes may
  // be EMPTY (`:local` against `@prefix : <ns> .` — rdf-types.ttl's own
  // shape). `_:x` tokens also fit the CURIE grammar, so classification
  // must test bnode first (the when-chains below do).
  private val TypedLitCurie = "^\"(.*)\"\\^\\^(([A-Za-z_][\\w.-]*)?:\\S*)$"
  private val BoolTok = "^(true|false)$"
  private val IntTok = "^[+-]?\\d+$"
  private val DecimalTok = "^[+-]?\\d*\\.\\d+$"
  private val DoubleTok = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)[eE][+-]?\\d+$"
  private val CurieTok = "^([A-Za-z_][\\w.-]*)?:\\S*$"

  /** Parse an object TOKEN into (object, okind, lang, datatype) columns.
    * `turtle = true` additionally accepts the Turtle shorthands (bare
    * boolean/integer/decimal/double, CURIE objects and CURIE datatypes,
    * resolved against `prefixes`). An unclassifiable token yields all
    * nulls — the malformed-row contract.
    */
  def parseObject(tok: Column, turtle: Boolean = false,
                  prefixes: Map[String, String] = Map.empty): Seq[Column] = {
    def ext(p: String, i: Int): Column = regexp_extract(tok, p, i)
    def xsd(t: String): Column = lit(XsdNs + t)
    val lexBase =
      when(tok.rlike(IriTok), ext(IriTok, 1))
        .when(tok.rlike(BnodeTok), tok)
        .when(tok.rlike(LangLit), NQuads.unesc(ext(LangLit, 1)))
        .when(tok.rlike(TypedLitIri), NQuads.unesc(ext(TypedLitIri, 1)))
        .when(tok.rlike(PlainLit), NQuads.unesc(ext(PlainLit, 1)))
    val kindBase =
      when(tok.rlike(IriTok), lit("iri"))
        .when(tok.rlike(BnodeTok), lit("bnode"))
        .when(tok.rlike(LangLit) || tok.rlike(TypedLitIri) ||
          tok.rlike(PlainLit), lit("literal"))
    val dtBase =
      when(tok.rlike(LangLit) || tok.rlike(PlainLit),
        lit(null).cast("string"))
        .when(tok.rlike(TypedLitIri), ext(TypedLitIri, 2))
    val (lex, kind, dt) =
      if (!turtle) (lexBase, kindBase, dtBase)
      else (
        lexBase
          .when(tok.rlike(TypedLitCurie), NQuads.unesc(ext(TypedLitCurie, 1)))
          .when(tok.rlike(BoolTok) || tok.rlike(IntTok) ||
            tok.rlike(DecimalTok) || tok.rlike(DoubleTok), tok)
          .when(tok.rlike(CurieTok), Prefixes.expand(tok, prefixes)),
        kindBase
          .when(tok.rlike(TypedLitCurie) || tok.rlike(BoolTok) ||
            tok.rlike(IntTok) || tok.rlike(DecimalTok) ||
            tok.rlike(DoubleTok), lit("literal"))
          .when(tok.rlike(CurieTok), lit("iri")),
        dtBase
          .when(tok.rlike(TypedLitCurie),
            Prefixes.expand(ext(TypedLitCurie, 2), prefixes))
          .when(tok.rlike(BoolTok), xsd("boolean"))
          .when(tok.rlike(IntTok), xsd("integer"))
          .when(tok.rlike(DecimalTok), xsd("decimal"))
          .when(tok.rlike(DoubleTok), xsd("double")))
    Seq(lex, kind,
      when(tok.rlike(LangLit), ext(LangLit, 2)), // lang: one grammar either mode
      dt)
  }

  /** PRECISE object-token sub-pattern for line regexes (all groups
    * non-capturing, so surrounding line patterns keep their numbering).
    * The quoted-literal body is escape-aware (`\"` inside a literal
    * cannot end the token), which keeps line matching unambiguous and
    * the grammar-guarded comment stripping safe: a trailing `# …`
    * comment can never be absorbed into an object token.
    */
  private[sources] val QuotedLitPat = "\"(?:[^\"\\\\]|\\\\.)*\""

  private[sources] def objTokenPat(turtle: Boolean): String = {
    val litSuffix = "(?:@[A-Za-z][A-Za-z0-9-]*|\\^\\^<[^>]*>" +
      (if (turtle) "|\\^\\^(?:[A-Za-z_][\\w.-]*)?:\\S*" else "") + ")?"
    val core = s"<[^>]*>|_:\\S+|$QuotedLitPat$litSuffix"
    // Turtle adds bare tokens (numerics, booleans, CURIEs) — anything
    // unquoted/unbracketed; classification decides validity per row
    if (turtle) s"(?:$core|[^\"<\\s]\\S*)" else s"(?:$core)"
  }

  // ---- object-term rendering (write side) ----

  /** Render the object term for a statement frame. Without the typed
    * columns this is exactly the legacy plain-quoted-literal form; with
    * them, IRI objects render `<iri>` (or CURIE-compacted when
    * `compactIri` is given — the Turtle writer passes its [[Turtle]]
    * `iriTerm`), bnodes their raw token, literals with their `@lang` /
    * `^^<datatype>` suffix. A null okind on a typed frame falls back to
    * the plain-literal rendering (absent == legacy row).
    */
  def renderObject(df: DataFrame,
                   compactIri: Option[Column => Column] = None): Column = {
    val quoted = concat(lit("\""), NQuads.esc(col("object")), lit("\""))
    if (!df.columns.contains("okind")) return quoted
    val hasLang = df.columns.contains("lang")
    val hasDt = df.columns.contains("datatype")
    val dtTerm: Column => Column =
      compactIri.getOrElse(c => concat(lit("<"), c, lit(">")))
    val lit0 = (hasLang, hasDt) match {
      case (true, true) =>
        when(col("lang").isNotNull, concat(quoted, lit("@"), col("lang")))
          .when(col("datatype").isNotNull,
            concat(quoted, lit("^^"), dtTerm(col("datatype"))))
          .otherwise(quoted)
      case (true, false) =>
        when(col("lang").isNotNull, concat(quoted, lit("@"), col("lang")))
          .otherwise(quoted)
      case (false, true) =>
        when(col("datatype").isNotNull,
          concat(quoted, lit("^^"), dtTerm(col("datatype"))))
          .otherwise(quoted)
      case _ => quoted
    }
    when(col("okind") === "iri",
      compactIri.getOrElse((c: Column) => concat(lit("<"), c, lit(">")))
        .apply(col("object")))
      .when(col("okind") === "bnode", col("object"))
      .otherwise(lit0)
  }

  /** Subject/graph term: bnode tokens (`_:label`) render raw, IRIs
    * bracketed (or CURIE-compacted when `compactIri` is given).
    */
  def renderResource(c: Column,
                     compactIri: Option[Column => Column] = None): Column =
    when(c.startsWith("_:"), c)
      .otherwise(compactIri.getOrElse((x: Column) =>
        concat(lit("<"), x, lit(">"))).apply(c))
}
