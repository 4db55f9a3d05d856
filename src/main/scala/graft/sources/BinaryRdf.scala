package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary statement serialisation — the reference registry's `:brf`
  * entry (/root/reference/grafter.io/src/grafter_2/rdf4j/formats.clj:
  * 138-152 registers `RDFFormat/BINARY` → `BinaryRDFParserFactory`,
  * mime `application/x-binary-rdf`; lines 104-120 give binary formats
  * their own stream coercers). RDF4J's BRF is a single sequential
  * stream with a global string dictionary — compact, but UNSPLITTABLE:
  * a 100 TB file parses on one thread. This engine's analog keeps the
  * binary record layout but makes each RECORD self-contained, one per
  * line, so Spark's input splits and per-line parallel parse keep
  * working at any file size — the deliberate trade of dictionary
  * compression for splittability (the lake's parquet already owns the
  * compressed-at-rest role; a wire format's job here is exactness).
  *
  * Record layout (version 2; version-1 records parse unchanged):
  * {{{
  *   flags   : 1 byte — bit0 quad (has source), bit1 TYPED record,
  *             bit4 has lang term, bit5 has datatype term
  *   term×3  : u32 big-endian byte length, then UTF-8 bytes  (s, p, o)
  *   okind   : 1 byte (0 literal, 1 iri, 2 bnode) — typed records only
  *   lang    : term, present only when bit4
  *   datatype: term, present only when bit5
  *   source  : term, present only when bit0
  * }}}
  * Legacy frames — no `okind` column — serialise to the EXACT
  * version-1 bytes (flags 0x00/0x01): the format version is a property
  * of the data, not the writer.
  * armored as unchunked base64, one record per line. NO escaping
  * exists in this format — lengths delimit, so every code point
  * including U+0000, `"`, `>` and newlines round-trips exactly; this
  * is the one registry entry with no malformed-character class. The
  * base64 alphabet cannot contain `#`, so the transport's comment
  * framing ([[Http]]) is unambiguous by construction; full-line
  * comments and `@prefix` metadata lines are stripped like every other
  * parser (C2 contract), and a line that is not structurally valid
  * base64-of-a-well-formed-record parses as the all-null row.
  *
  * Both directions are pure Column combinators (`unhex`/`hex`/`conv`/
  * `substr`/`encode`/`decode`/`base64`/`unbase64`) — whole-stage
  * codegen'd, no UDFs, and exactly reproducible by the DuckDB oracle's
  * blob algebra (q84).
  */
object BinaryRdf {

  private val TripleFlag = Array[Byte](0)
  private val QuadFlag = Array[Byte](1)

  /** u32 big-endian length prefix of a string column's UTF-8 bytes. */
  private def len4(c: Column): Column =
    unhex(lpad(hex(octet_length(c)), 8, "0"))

  private def term(c: Column): Column = concat(len4(c), encode(c, "UTF-8"))

  /** One base64 record line per statement row; triple = quad with null
    * context, the shared statement-model contract.
    */
  def serialize(statements: DataFrame): DataFrame = {
    val triple = concat(lit(TripleFlag),
      term(col("subject")), term(col("predicate")), term(col("object")))
    val legacy =
      if (!statements.columns.contains("source")) triple
      else when(col("source").isNull, triple)
        .otherwise(concat(lit(QuadFlag),
          term(col("subject")), term(col("predicate")), term(col("object")),
          term(col("source"))))
    val rec =
      if (!statements.columns.contains("okind")) legacy
      else {
        val none = lit(Array.empty[Byte])
        val hasSrc = statements.columns.contains("source")
        val srcP = if (hasSrc) col("source").isNotNull else lit(false)
        val langP = if (statements.columns.contains("lang"))
          col("lang").isNotNull else lit(false)
        val dtP = if (statements.columns.contains("datatype"))
          col("datatype").isNotNull else lit(false)
        def byte(i: Column): Column = unhex(lpad(hex(i), 2, "0"))
        val flags = byte(lit(2) +
          when(srcP, 1).otherwise(0) +
          when(langP, 16).otherwise(0) +
          when(dtP, 32).otherwise(0))
        val okByte = byte(
          when(col("okind") === "iri", 1)
            .when(col("okind") === "bnode", 2).otherwise(0))
        concat(flags,
          term(col("subject")), term(col("predicate")), term(col("object")),
          okByte,
          when(langP, term(col("lang"))).otherwise(none),
          when(dtP, term(col("datatype"))).otherwise(none),
          if (hasSrc) when(srcP, term(col("source"))).otherwise(none) else none)
      }
    // Spark's base64 MIME-folds output at 76 chars (CRLF) — behavior
    // gated by a legacy conf. A format's bytes must not depend on
    // session confs, so the fold is stripped unconditionally: one
    // unchunked base64 line per record on every engine (DuckDB's
    // to_base64 agrees byte-for-byte, q84's oracle).
    statements.select(
      regexp_replace(base64(rec), "[\\r\\n]", "").as("value"))
  }

  /** Distributed write of the armored line profile with a version
    * header comment (metadata, not data — [[read]] strips it).
    */
  def write(statements: DataFrame, path: String): Unit = {
    serialize(statements).write.mode("overwrite").text(path)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "00000-header.brf"), "# BRDF 1\n")
  }

  /** Structural base64 shape: only alphabet chars plus trailing `=`
    * padding, non-empty, length divisible by 4 — anything else is
    * malformed before we ever decode.
    */
  private val B64Line = "^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{4})$"

  /** Parse back into the 4-column statement frame. Validation is
    * length-accounting: the declared term lengths must tile the record
    * exactly; any mismatch (truncation, trailing bytes, non-base64)
    * yields the all-null row instead of garbage terms.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path))

  /** The parse transform alone (streaming composes). */
  def parseLines(linesDf: DataFrame): DataFrame = {
    // Every arithmetic step is null-safe under ANSI mode: non-base64
    // lines never reach unbase64 (regex gate), and a garbage-but-valid
    // base64 line whose declared lengths are absurd nulls out through
    // try_cast instead of throwing on int overflow — the malformed row
    // MUST surface as all-nulls, never wedge the scan.
    val bin = when(col("value").rlike(B64Line), unbase64(col("value")))
      .otherwise(lit(null).cast("binary"))
    def toPos(c: Column): Column = c.try_cast("int")
    def u32(pos: Column): Column = conv(hex(bin.substr(toPos(pos), lit(4))),
      16, 10).cast("long")
    def u8(pos: Column): Column = conv(hex(bin.substr(toPos(pos), lit(1))),
      16, 10).cast("int")
    val total = octet_length(bin).cast("long")
    val flags = u8(lit(1L))
    // valid flag bytes: legacy 0x00/0x01; typed 0x02 | quad(0x01) |
    // exactly-one-of lang(0x10)/datatype(0x20)
    val legalFlags = Seq(0, 1, 2, 3, 18, 19, 34, 35)
    val isTyped = flags.bitwiseAND(lit(2)) === 2
    val isQuad = flags.bitwiseAND(lit(1)) === 1
    val hasLang = flags.bitwiseAND(lit(16)) === 16
    val hasDt = flags.bitwiseAND(lit(32)) === 32
    // 1-based offsets of each length prefix; the term follows 4 later
    val p1 = lit(2L)
    val l1 = u32(p1)
    val p2 = p1 + lit(4L) + l1
    val l2 = u32(p2)
    val p3 = p2 + lit(4L) + l2
    val l3 = u32(p3)
    val afterO = p3 + lit(4L) + l3 // okind byte (typed) / next term pos
    val okPos = afterO
    val pLang = afterO + when(isTyped, lit(1L)).otherwise(lit(0L))
    val lLang = when(hasLang, u32(pLang)).otherwise(lit(0L))
    val pDt = pLang + when(hasLang, lLang + lit(4L)).otherwise(lit(0L))
    val lDt = when(hasDt, u32(pDt)).otherwise(lit(0L))
    val pSrc = pDt + when(hasDt, lDt + lit(4L)).otherwise(lit(0L))
    val lSrc = when(isQuad, u32(pSrc)).otherwise(lit(0L))
    val end = pSrc + when(isQuad, lSrc + lit(4L)).otherwise(lit(0L)) - lit(1L)
    val wellFormed = coalesce(total >= lit(13L) &&
      flags.isin(legalFlags.map(Integer.valueOf): _*) &&
      end === total, lit(false))
    def t(pos: Column, len: Column): Column =
      when(wellFormed, decode(bin.substr(toPos(pos), toPos(len)), "UTF-8"))
        .otherwise(lit(null).cast("string"))
    val okByte = u8(okPos)
    linesDf
      .filter(!col("value").rlike(NQuads.FullLineComment))
      .filter(!col("value").rlike(NQuads.PrefixLine))
      .select(
        t(p1 + lit(4L), l1).as("subject"),
        t(p2 + lit(4L), l2).as("predicate"),
        t(p3 + lit(4L), l3).as("object"),
        // legacy records are plain literals by the version-1 contract
        when(wellFormed && !isTyped, lit("literal"))
          .when(wellFormed && isTyped,
            when(okByte === 1, "iri").when(okByte === 2, "bnode")
              .otherwise("literal"))
          .otherwise(lit(null).cast("string")).as("okind"),
        when(wellFormed && hasLang,
          decode(bin.substr(toPos(pLang + lit(4L)), toPos(lLang)), "UTF-8"))
          .otherwise(lit(null).cast("string")).as("lang"),
        when(wellFormed && hasDt,
          decode(bin.substr(toPos(pDt + lit(4L)), toPos(lDt)), "UTF-8"))
          .otherwise(lit(null).cast("string")).as("datatype"),
        when(wellFormed && isQuad,
          decode(bin.substr(toPos(pSrc + lit(4L)), toPos(lSrc)), "UTF-8"))
          .otherwise(lit(null).cast("string")).as("source"))
  }
}
