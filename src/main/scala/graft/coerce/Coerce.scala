package graft.coerce

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed coercion layer — the Spark recast of grafter's XSD↔JVM matrix
  * (/root/reference/grafter.io/src/grafter_2/rdf4j/io.clj:48-181,211-299)
  * with the reference's pinned corner cases:
  *
  *  - special float lexical forms `INF`/`+INF`/`-INF`/`NaN` parse to the
  *    IEEE values (io.clj:74-88; tests io_test.clj:167-177) — Spark's
  *    plain cast only accepts `Infinity` spellings, so a `when` chain
  *    front-runs it (still pure Column ops, codegen'd);
  *  - xsd:time `24:00:00` normalises to `00:00` and fractional seconds
  *    truncate (round down) to 9 digits/nanos (io.clj:132-144; tests
  *    io_test.clj:110-126);
  *  - bounded vs unbounded integers stay distinct types: int ≠ long ≠
  *    unbounded integer ↦ Decimal(38,0) (io_test.clj:46-51);
  *  - unknown datatypes pass through as (raw string, datatype) pairs
  *    (io.clj:176-181) rather than failing.
  *
  * Open extension follows the reference's multimethod style
  * (`backend-literal->grafter-type`, io.clj:48-56): [[registry]] maps a
  * datatype name to a `Column => Column`, and users add entries.
  */
object Coerce {

  /** xsd:double/xsd:float lexical space incl. INF forms → double. */
  def parseDouble(c: Column): Column =
    when(c === "INF" || c === "+INF", lit(Double.PositiveInfinity))
      .when(c === "-INF", lit(Double.NegativeInfinity))
      .when(c === "NaN", lit(Double.NaN))
      .otherwise(c.cast(DoubleType))

  def parseFloat(c: Column): Column = parseDouble(c).cast(FloatType)

  /** Serialise back to the XSD lexical space (INF not Infinity). */
  def formatDouble(c: Column): Column =
    when(c === lit(Double.PositiveInfinity), "INF")
      .when(c === lit(Double.NegativeInfinity), "-INF")
      .when(isnan(c), "NaN")
      .otherwise(c.cast(StringType))

  /** xsd:time "HH:MM:SS(.fffffffff…)" → nanos-of-day (long), with the
    * reference's rules: 24:00:00 ≡ 00:00:00; fractional digits beyond 9
    * truncate toward zero.
    */
  def parseTimeNanos(c: Column): Column = {
    val h = substring(c, 1, 2).cast(LongType)
    val m = substring(c, 4, 2).cast(LongType)
    val s = substring(c, 7, 2).cast(LongType)
    // fraction: everything after the dot, right-padded then cut to 9
    val frac = when(length(c) > 8,
        rpad(substring(c, 10, 9), 9, "0").cast(LongType))
      .otherwise(lit(0L))
    val hNorm = when(h === 24, lit(0L)).otherwise(h)
    ((hNorm * 3600L + m * 60L + s) * 1000000000L) + frac
  }

  /** Unbounded xsd:integer ↦ Decimal(38,0) (no exact Spark type — same
    * trade-off the survey documents, SURVEY.md §1.4).
    */
  def parseUnboundedInteger(c: Column): Column = c.try_cast(DecimalType(38, 0))

  /** Language-tagged string ↦ struct(value, tag) — grafter's LangString
    * (protocols.cljc:199-235). Comparison: value then tag (L2).
    */
  def langString(value: Column, tag: Column): Column =
    struct(value.as("value"), tag.as("tag"))

  /** LangString ordering key (orderBy this column). */
  def langStringOrder(ls: Column): Column =
    struct(ls.getField("value"), ls.getField("tag"))

  /** Unknown-datatype passthrough: keep (lexical form, datatype URI). */
  def rawLiteral(value: Column, datatype: Column): Column =
    struct(value.as("raw"), datatype.as("datatype"))

  /** Trailing zone designator ("Z" or "±HH:MM") → signed offset seconds;
    * null when the lexical form carries no zone.
    */
  def zoneOffsetSeconds(c: Column): Column = {
    val z = regexp_extract(c, "(Z|[+-]\\d{2}:\\d{2})$", 1)
    val sign = when(substring(z, 1, 1) === "-", lit(-1)).otherwise(lit(1))
    val secs = substring(z, 2, 2).cast(IntegerType) * 3600 +
      substring(z, 5, 2).cast(IntegerType) * 60
    when(z === "Z", lit(0))
      .when(z =!= "", sign * secs)
      .otherwise(lit(null).cast(IntegerType))
  }

  private def stripZone(c: Column): Column =
    regexp_replace(c, "(Z|[+-]\\d{2}:\\d{2})$", "")

  /** xsd:date with an optional zone ↦ struct(date, offsetSeconds) — the
    * reference's OffsetDate, which java.time (and Spark's DateType) cannot
    * represent losslessly (protocols.cljc:153-161; SURVEY.md §1.4 struct
    * mapping). `offsetSeconds` is null for zoneless dates.
    */
  def offsetDate(c: Column): Column =
    struct(to_date(substring(c, 1, 10)).as("date"),
      zoneOffsetSeconds(c).as("offsetSeconds"))

  /** xsd:time with an optional zone ↦ struct(nanos, offsetSeconds), with
    * the same 24:00→00:00 and 9-digit-truncation rules as
    * [[parseTimeNanos]] (io.clj:132-144).
    */
  def offsetTime(c: Column): Column =
    struct(parseTimeNanos(stripZone(c)).as("nanos"),
      zoneOffsetSeconds(c).as("offsetSeconds"))

  /** Open registry of named coercions — the extension point. */
  // try_cast: under ANSI mode (Spark 4 default) a plain cast throws on
  // overflow/malformed input; the reference's behavior for a value that
  // does not fit the requested datatype is "not that datatype" → null here
  val registry: scala.collection.mutable.Map[String, Column => Column] =
    scala.collection.mutable.Map(
      "xsd:double" -> parseDouble _,
      "xsd:float" -> parseFloat _,
      "xsd:boolean" -> ((c: Column) => c.try_cast(BooleanType)),
      "xsd:int" -> ((c: Column) => c.try_cast(IntegerType)),
      "xsd:long" -> ((c: Column) => c.try_cast(LongType)),
      "xsd:integer" -> parseUnboundedInteger _,
      "xsd:decimal" -> ((c: Column) => c.try_cast(DecimalType(38, 18))),
      "xsd:dateTime" -> ((c: Column) => c.try_cast(TimestampType)),
      "xsd:date" -> ((c: Column) => c.try_cast(DateType)),
      "xsd:date+offset" -> offsetDate _,
      "xsd:time" -> offsetTime _,
      "xsd:string" -> ((c: Column) => c.cast(StringType)))

  def coerce(datatype: String, c: Column): Column =
    registry.getOrElse(datatype, identity[Column] _)(c)

  // ---- typed statement model bridge (round 6) ----

  /** Full XSD datatype IRI (the typed statement model's `datatype`
    * column, [[graft.sources.RdfTerms]]) → registry key: the XSD
    * namespace maps to the registry's `xsd:` shorthand; any other IRI
    * passes through unchanged so full-IRI registry extensions resolve
    * too — the reference's unknown-datatype passthrough
    * (io.clj:176-181).
    */
  def registryKey(datatypeIri: String): String =
    if (datatypeIri.startsWith(graft.sources.RdfTerms.XsdNs))
      "xsd:" + datatypeIri.stripPrefix(graft.sources.RdfTerms.XsdNs)
    else datatypeIri

  /** Native value of rows whose `datatype` column equals `xsdIri`
    * (other datatypes → null): the lexical form routed through the
    * coercion matrix, statically typed per extraction — the columnar
    * recast of the reference's dynamically-typed object position
    * (backend→grafter mapping io.clj:60-100). Use one call per target
    * type; Spark columns are monomorphic by design.
    */
  def typedValue(value: Column, datatype: Column, xsdIri: String): Column =
    when(datatype === xsdIri, coerce(registryKey(xsdIri), value))

  /** The whole value lattice at once: a sparse struct with one field
    * per primary XSD type, exactly one of which is non-null per row
    * (plus `string` for plain literals — null datatype). The dynamic
    * typing of the reference's object position, expressed as a struct
    * column instead of a sum type.
    *
    * Apply over a MATERIALIZED typed frame, not fused onto a reader's
    * parse chain: ten lattice fields × the readers' classification
    * whens exceeds the JVM's 64 KB method limit and drops the stage to
    * interpreted mode. For single-type extraction prefer [[typedValue]]
    * (one field, codegen-friendly anywhere).
    */
  def nativeStruct(value: Column, datatype: Column): Column = {
    val ns = graft.sources.RdfTerms.XsdNs
    struct(
      typedValue(value, datatype, s"${ns}boolean").as("bool"),
      typedValue(value, datatype, s"${ns}integer").as("integer"),
      typedValue(value, datatype, s"${ns}long").as("long"),
      typedValue(value, datatype, s"${ns}int").as("int"),
      typedValue(value, datatype, s"${ns}decimal").as("decimal"),
      typedValue(value, datatype, s"${ns}double").as("double"),
      typedValue(value, datatype, s"${ns}float").as("float"),
      typedValue(value, datatype, s"${ns}dateTime").as("dateTime"),
      typedValue(value, datatype, s"${ns}date").as("date"),
      when(datatype.isNull || datatype === s"${ns}string", value).as("string"))
  }
}
