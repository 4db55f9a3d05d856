package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}

import graft.sources.{BinaryRdf, JsonLd, NQuads, RdfJson, RdfXml, StatementFormats, Trix, Turtle}

/** Round-trip and escaping behavior of the round-5 format additions
  * (JSON-LD flat lines, RDF/XML, TriX, the N3 alias) — each against the
  * NQuads path, the cross-format agreement contract of formats.clj:8-19.
  */
class FormatSpec extends SparkSpec {
  import spark.implicits._

  private val quadFrame = Seq(
    ("http://e.org/d1", "http://purl.org/dc/terms/title",
      "A \"quoted\"\ttitle\\here\nsecond line", "http://e.org/g1"),
    ("http://e.org/d2", "http://e.org/p", "plain", null),
    // adversarial: object mimicking each grammar's own structural tail
    ("http://e.org/d3", "http://e.org/p", "evil\"}]}", "http://e.org/g2"),
    ("http://e.org/d4", "http://e.org/p", "<tag> & &amp; entities", null)
  ).toDF("subject", "predicate", "object", "source")

  test("jsonld: flat node lines, quad wrapping, round trip vs NQuads") {
    val dir = tmpDir("jsonld")
    JsonLd.write(quadFrame, s"$dir/out.jsonld",
      Map("doc" -> "http://e.org/"))
    val lines = spark.read.text(s"$dir/out.jsonld").collect()
      .map(_.getString(0)).toSet
    assert(lines.contains(
      """{"@id":"http://e.org/d2","http://e.org/p":[{"@value":"plain"}]}"""),
      lines.mkString("\n"))
    assert(lines.contains(
      """{"@id":"http://e.org/g2","@graph":[{"@id":"http://e.org/d3",""" +
        """"http://e.org/p":[{"@value":"evil\"}]}"}]}]}"""))
    // escapes shared with the N-family: \" \t \\ \n
    assert(lines.exists(l => l.contains("""A \"quoted\"\ttitle\\here\nsecond""")))
    // the @context header is recoverable metadata, not data
    assert(JsonLd.readContext(spark, s"$dir/out.jsonld") ==
      Map("doc" -> "http://e.org/"))
    // parse ∘ serialise = id on the 4-column statement frame
    val back = JsonLd.read(spark, s"$dir/out.jsonld")
      .select("subject", "predicate", "object", "source")
    assert(back.exceptAll(quadFrame).isEmpty && quadFrame.exceptAll(back).isEmpty)
    // cross-format agreement with the NQuads quad path
    val dir2 = tmpDir("jsonld-nq")
    NQuads.write(quadFrame, s"$dir2/out.nq")
    val viaNq = NQuads.read(spark, s"$dir2/out.nq")
      .select("subject", "predicate", "object", "source")
    assert(back.exceptAll(viaNq).isEmpty && viaNq.exceptAll(back).isEmpty)
  }

  test("rdfxml: QName split, xml escaping, doc framing, round trip") {
    val stmts = Seq(
      ("http://e.org/d1", "http://purl.org/dc/terms/title",
        "a<b>&c \"quoted\"\nnewline\ttab"),
      ("http://e.org/d2", "http://e.org/meta#n_chars", "42"),
      // pre-escaped-looking text must NOT double-unescape
      ("http://e.org/d3", "http://e.org/p", "&amp; &#10; literal entities")
    ).toDF("subject", "predicate", "object")
    val dir = tmpDir("rdfxml")
    RdfXml.write(stmts, s"$dir/out.rdf")
    val raw = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/out.rdf"))
      .toArray.map(_.toString.split('/').last)
      .filterNot(n => n.startsWith(".") || n.startsWith("_")).sorted
    // header sorts first, footer last, so name-order concat is a document
    assert(raw.head == "00000-header.xml" && raw.last == "zzzzz-footer.xml",
      raw.mkString("\n"))
    val lines = spark.read.text(s"$dir/out.rdf").collect()
      .map(_.getString(0)).toSet
    assert(lines.contains("""<rdf:Description rdf:about="http://e.org/d2">""" +
      """<n_chars xmlns="http://e.org/meta#">42</n_chars></rdf:Description>"""),
      lines.mkString("\n"))
    assert(lines.exists(_.contains(
      "a&lt;b&gt;&amp;c &quot;quoted&quot;&#10;newline&#9;tab")))
    val back = RdfXml.read(spark, s"$dir/out.rdf")
      .select("subject", "predicate", "object")
    assert(back.exceptAll(stmts).isEmpty && stmts.exceptAll(back).isEmpty)
    // a predicate with no XML-name local part fails loudly, never invalid
    val bad = Seq(("http://e.org/d", "http://e.org/p/", "x"))
      .toDF("subject", "predicate", "object")
    val e = intercept[Exception] { RdfXml.serialize(bad).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("local part")), msgs(e).mkString(" | "))
  }

  test("trix: graph blocks, unnamed-graph triples, round trip vs NQuads") {
    val dir = tmpDir("trix")
    Trix.write(quadFrame, s"$dir/out.trix")
    val lines = spark.read.text(s"$dir/out.trix").collect()
      .map(_.getString(0)).toSet
    assert(lines.contains("<graph><triple><uri>http://e.org/d2</uri>" +
      "<uri>http://e.org/p</uri><plainLiteral>plain</plainLiteral>" +
      "</triple></graph>"), lines.mkString("\n"))
    assert(lines.contains("<graph><uri>http://e.org/g2</uri><triple>" +
      "<uri>http://e.org/d3</uri><uri>http://e.org/p</uri>" +
      "<plainLiteral>evil&quot;}]}</plainLiteral></triple></graph>"))
    val back = Trix.read(spark, s"$dir/out.trix")
      .select("subject", "predicate", "object", "source")
    assert(back.exceptAll(quadFrame).isEmpty && quadFrame.exceptAll(back).isEmpty)
    val dir2 = tmpDir("trix-nq")
    NQuads.write(quadFrame, s"$dir2/out.nq")
    val viaNq = NQuads.read(spark, s"$dir2/out.nq")
      .select("subject", "predicate", "object", "source")
    assert(back.exceptAll(viaNq).isEmpty && viaNq.exceptAll(back).isEmpty)
  }

  test("rdfjson: subject-object lines, literal typing, round trip") {
    val stmts = quadFrame.select("subject", "predicate", "object")
    val dir = tmpDir("rj")
    RdfJson.write(stmts, s"$dir/out.rj")
    val lines = spark.read.text(s"$dir/out.rj").collect()
      .map(_.getString(0)).toSet
    assert(lines.contains("""{"http://e.org/d2":{"http://e.org/p":""" +
      """[{"value":"plain","type":"literal"}]}}"""), lines.mkString("\n"))
    // the adversarial object mimicking the grammar's own tail survives
    assert(lines.contains("""{"http://e.org/d3":{"http://e.org/p":""" +
      """[{"value":"evil\"}]}","type":"literal"}]}}"""))
    val back = RdfJson.read(spark, s"$dir/out.rj")
      .select("subject", "predicate", "object")
    assert(back.exceptAll(stmts).isEmpty && stmts.exceptAll(back).isEmpty)
    // malformed line → all-null row, never garbage terms
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "bad.rj"),
      "{\"s\":{\"p\":[{\"value\":\"missing type\"}]}}\n")
    val mal = RdfJson.read(spark, s"$dir/bad.rj").collect()
    assert(mal.length == 1 && (0 to 6).forall(mal.head.isNullAt))
  }

  test("brf: binary records carry what every text dialect must escape") {
    // NUL, quotes, angle brackets, newlines, tabs, supplementary chars —
    // the length-delimited layout has no escaping and no malformed
    // character class (the one registry entry where U+0000 is legal)
    val hostile = Seq(
      ("http://e.org/d1", "http://e.org/p", "NUL\u0000 \"q\" <a>\nline2\t😀",
        "http://e.org/g1"),
      ("http://e.org/d2", "http://e.org/p", "", null) // empty term, triple
    ).toDF("subject", "predicate", "object", "source")
    val dir = tmpDir("brf")
    BinaryRdf.write(hostile, s"$dir/out.brf")
    val back = BinaryRdf.read(spark, s"$dir/out.brf")
      .select("subject", "predicate", "object", "source")
    assert(back.exceptAll(hostile).isEmpty && hostile.exceptAll(back).isEmpty)
    // armored lines are pure base64 (line-transport-safe by alphabet)
    val lines = spark.read.text(s"$dir/out.brf").collect().map(_.getString(0))
    assert(lines.filterNot(_.startsWith("#"))
      .forall(_.matches("^[A-Za-z0-9+/=]+$")), lines.mkString("\n"))
    // malformed inputs: non-base64, valid base64 of a lying record
    // (declared length beyond the bytes), absurd u32 length — each must
    // yield the all-null row under ANSI, never throw or emit garbage
    val b64 = java.util.Base64.getEncoder
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "bad.brf"),
      "not base64!!!\n" +
        b64.encodeToString(Array[Byte](0, 0, 0, 0, 9, 65)) + "\n" +
        b64.encodeToString(Array[Byte](0, 127, -1, -1, -1) ++
          Array.fill[Byte](20)(66)) + "\n")
    val mal = BinaryRdf.read(spark, s"$dir/bad.brf").collect()
    assert(mal.length == 3 &&
      mal.forall(r => (0 to 3).forall(r.isNullAt)), mal.mkString(" | "))
  }

  test("registry: new formats resolve by mime and extension, n3 = turtle") {
    assert(StatementFormats.formatFor("application/ld+json").contains("jsonld"))
    assert(StatementFormats.formatFor(".jsonld").contains("jsonld"))
    assert(StatementFormats.formatFor("application/rdf+xml").contains("rdf"))
    assert(StatementFormats.formatFor("application/trix").contains("trix"))
    assert(StatementFormats.formatFor("text/n3").contains("n3"))
    assert(StatementFormats.formatFor("application/rdf+json").contains("rj"))
    assert(StatementFormats.formatFor("application/x-binary-rdf").contains("brf"))
    assert(StatementFormats.formatFor(".brf").contains("brf"))
    // the binary/text coercer split (formats.clj:104-120): exactly one
    // binary entry, and it is brf
    assert(StatementFormats.registry.collect {
      case (k, c) if c.binary => k }.toSeq == Seq("brf"))
    // negotiation preferences unchanged: */* → first entry, text/* → ttl
    assert(StatementFormats.negotiate(Some("*/*")).contains("nq"))
    assert(StatementFormats.negotiate(Some("text/*")).contains("ttl"))
    assert(StatementFormats.negotiate(
      Some("application/ld+json;q=0.9, text/turtle;q=0.1")).contains("jsonld"))
    // the n3 alias serialises the Turtle subset byte-for-byte
    val stmts = Seq(("http://e.org/d1", Turtle.RdfType, "Doc"))
      .toDF("subject", "predicate", "object")
    val n3 = StatementFormats.registry("n3").serialize(stmts, Map.empty)
    val ttl = Turtle.serialize(stmts)
    assert(n3.exceptAll(ttl).isEmpty && ttl.exceptAll(n3).isEmpty)
  }

  test("served bodies in every negotiated dialect parse back to the frame") {
    // the transport's banner + @prefix + end-marker framing must be
    // transparent to EVERY registered reader (the C2 contract the
    // registry documents) — loop all 10 formats through one live server.
    // Triple-only codecs DROP the graph component (all rows survive as
    // triples — RDF/XML and friends carry no context), quad codecs
    // round-trip the full 4-column frame.
    val tripleView = quadFrame.select("subject", "predicate", "object")
    val srv = graft.sources.Http.serve(quadFrame,
      Map("e" -> "http://e.org/"))
    try StatementFormats.registry.foreach { case (fmt, codec) =>
      val got = graft.sources.Http.read(spark, srv.url,
        accept = Seq(codec.mime)).localCheckpoint()
      val want =
        if (Set("nq", "trig", "jsonld", "trix", "brf").contains(fmt)) quadFrame
        else tripleView
      val gotAligned = got.select(want.columns.map(org.apache.spark.sql
        .functions.col).toIndexedSeq: _*)
      assert(gotAligned.exceptAll(want).isEmpty &&
        want.exceptAll(gotAligned).isEmpty,
        s"format $fmt did not round-trip over HTTP")
    } finally srv.stop()
  }

  // ---- the reference's own fixtures (grafter.io/dev/resources/grafter/
  // rdf/{1.nt, bnodes.nt, rdf-types.ttl}) — IRI objects, bnodes, typed
  // literals, the constructs a grafter user's FIRST real input carries ----

  private val RefRdf = "/root/reference/grafter.io/dev/resources/grafter/rdf"
  private def refFixture(name: String): String = {
    val p = s"$RefRdf/$name"
    assume(new java.io.File(p).exists(), s"reference fixture $p not present")
    p
  }
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"

  test("reference fixture 1.nt: IRI object parses as okind=iri") {
    val one = NQuads.read(spark, refFixture("1.nt")).collect()
    assert(one.length == 1)
    val r = one(0)
    assert(r.getString(0) == "http://one" && r.getString(1) == "http://lonely")
    assert(r.getString(2) == "http://triple" && r.getString(3) == "iri")
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }

  test("reference fixture bnodes.nt: bnode object AND subject round-trip") {
    val rows = NQuads.read(spark, refFixture("bnodes.nt"))
    assert(rows.count() == 2)
    val byKind = rows.collect().map(r => r.getString(3) ->
      (r.getString(0), r.getString(2))).toMap
    assert(byKind("bnode") == ("http://foo", "_:bnode1"))
    assert(byKind("iri") == ("_:bnode1", "http://bar"))
    // round-trip: serialise the typed frame and parse it back identically
    val dir = tmpDir("refbn")
    NQuads.write(rows, s"$dir/out.nt")
    val back = NQuads.read(spark, s"$dir/out.nt")
    assert(back.exceptAll(rows).isEmpty && rows.exceptAll(back).isEmpty)
  }

  test("reference fixture rdf-types.ttl: every typed-literal construct") {
    val rows = Turtle.read(spark, refFixture("rdf-types.ttl"))
    val got = rows.collect().map(r => r.getString(0) ->
      (r.getString(2), r.getString(3), Option(r.getString(5)))).toMap
    assert(got.size == 7, got.mkString("\n"))
    // CURIE subjects/predicates expand against the DEFAULT (empty) prefix
    assert(got("http://example/boolean") ==
      (("true", "literal", Some(s"${Xsd}boolean"))))
    assert(got("http://example/date") ==
      (("2015-01-01T00:00:00Z", "literal", Some(s"${Xsd}dateTime"))))
    assert(got("http://example/decimal") ==
      (("1.2", "literal", Some(s"${Xsd}decimal"))))
    assert(got("http://example/double") ==
      (("1.0e6", "literal", Some(s"${Xsd}double"))))
    assert(got("http://example/float") ==
      (("0.4", "literal", Some(s"${Xsd}float"))))
    assert(got("http://example/integer") ==
      (("10", "literal", Some(s"${Xsd}integer"))))
    assert(got("http://example/string") == (("hello", "literal", None)))
    // round-trip through the N-family (typed literals as "lex"^^<dt>)
    val dir = tmpDir("reftypes")
    NQuads.write(rows.withColumn("source", lit(null).cast("string")),
      s"$dir/out.nt")
    val back = NQuads.read(spark, s"$dir/out.nt").drop("source")
    assert(back.exceptAll(rows).isEmpty && rows.exceptAll(back).isEmpty)
    // and through Turtle itself with CURIE-compacted datatypes
    Turtle.write(rows, s"$dir/out.ttl", Map("xsd" -> Xsd, "" -> "http://example/"))
    val lines = spark.read.text(s"$dir/out.ttl").collect().map(_.getString(0))
    assert(lines.exists(_.contains("\"1.2\"^^xsd:decimal")), lines.mkString("\n"))
    val viaTtl = Turtle.read(spark, s"$dir/out.ttl")
    assert(viaTtl.exceptAll(rows).isEmpty && rows.exceptAll(viaTtl).isEmpty)
  }

  test("typed objects round-trip through JSON-LD and RDF/JSON " +
      "(their native term vocabularies)") {
    val typed = Seq(
      ("http://e.org/d1", "http://e.org/p", "http://e.org/other",
        "iri", null, null, "http://e.org/g1"),
      ("http://e.org/d2", "http://e.org/p", "_:b7",
        "bnode", null, null, null),
      ("http://e.org/d3", "http://e.org/p", "bonjour",
        "literal", "fr", null, null),
      ("http://e.org/d4", "http://e.org/p", "42",
        "literal", null, s"${Xsd}integer", "http://e.org/g2"),
      ("http://e.org/d5", "http://e.org/p", "plain \"q\"\n",
        "literal", null, null, null)
    ).toDF("subject", "predicate", "object", "okind", "lang", "datatype", "source")
    // JSON-LD: @id objects, @language, @type
    val jd = tmpDir("jsonld-typed")
    JsonLd.write(typed, s"$jd/out.jsonld")
    val jl = spark.read.text(s"$jd/out.jsonld").collect().map(_.getString(0)).toSet
    assert(jl.exists(_.contains("""[{"@id":"http://e.org/other"}]""")), jl.mkString("\n"))
    assert(jl.exists(_.contains("""[{"@value":"bonjour","@language":"fr"}]""")))
    assert(jl.exists(_.contains(
      """[{"@value":"42","@type":"http://www.w3.org/2001/XMLSchema#integer"}]""")))
    val jback = JsonLd.read(spark, s"$jd/out.jsonld")
    assert(jback.exceptAll(typed).isEmpty && typed.exceptAll(jback).isEmpty)
    // RDF/JSON: type uri/bnode/literal, lang, datatype (triple format)
    val tripleTyped = typed.drop("source")
    val rd = tmpDir("rj-typed")
    RdfJson.write(tripleTyped, s"$rd/out.rj")
    val rl = spark.read.text(s"$rd/out.rj").collect().map(_.getString(0)).toSet
    assert(rl.exists(_.contains("""{"value":"http://e.org/other","type":"uri"}""")),
      rl.mkString("\n"))
    assert(rl.exists(_.contains("""{"value":"_:b7","type":"bnode"}""")))
    assert(rl.exists(_.contains(""","type":"literal","lang":"fr"}""")))
    assert(rl.exists(_.contains(
      ""","type":"literal","datatype":"http://www.w3.org/2001/XMLSchema#integer"}""")))
    val rback = RdfJson.read(spark, s"$rd/out.rj").drop("source")
    assert(rback.exceptAll(tripleTyped).isEmpty &&
      tripleTyped.exceptAll(rback).isEmpty)
    // cross-format agreement: both equal the N-Quads path on the same frame
    val nd = tmpDir("nq-typed")
    NQuads.write(typed, s"$nd/out.nq")
    val viaNq = NQuads.read(spark, s"$nd/out.nq")
    assert(jback.exceptAll(viaNq).isEmpty && viaNq.exceptAll(jback).isEmpty)
  }

  test("typed frames survive the live HTTP transport in every dialect") {
    val typed = Seq(
      ("http://e.org/d1", "http://e.org/p", "http://e.org/other",
        "iri", null, null, "http://e.org/g1"),
      ("http://e.org/d3", "http://e.org/p", "bonjour",
        "literal", "fr", null, null),
      ("http://e.org/d4", "http://e.org/p", "42",
        "literal", null, s"${Xsd}integer", "http://e.org/g2"),
      ("http://e.org/d5", "http://e.org/p", "plain", "literal", null, null, null)
    ).toDF("subject", "predicate", "object", "okind", "lang", "datatype", "source")
    val tripleView = typed.drop("source")
    val srv = graft.sources.Http.serve(typed, Map("e" -> "http://e.org/"))
    try StatementFormats.registry.foreach { case (fmt, codec) =>
      val got = graft.sources.Http.read(spark, srv.url,
        accept = Seq(codec.mime)).localCheckpoint()
      val want =
        if (Set("nq", "trig", "jsonld", "trix", "brf").contains(fmt)) typed
        else tripleView
      val gotAligned = got.select(want.columns.map(org.apache.spark.sql
        .functions.col).toIndexedSeq: _*)
      assert(gotAligned.exceptAll(want).isEmpty &&
        want.exceptAll(gotAligned).isEmpty,
        s"format $fmt did not round-trip TYPED terms over HTTP")
    } finally srv.stop()
  }

  test("typed objects round-trip through brf (version-2 records; " +
      "version-1 bytes bit-identical for legacy frames)") {
    val typed = Seq(
      ("http://e.org/d1", "http://e.org/p", "http://e.org/other",
        "iri", null, null, "http://e.org/g1"),
      ("_:s9", "http://e.org/p", "_:b7", "bnode", null, null, null),
      ("http://e.org/d3", "http://e.org/p", "bonjour \u0000NUL",
        "literal", "fr", null, null),
      ("http://e.org/d4", "http://e.org/p", "42",
        "literal", null, s"${Xsd}integer", "http://e.org/g2"),
      ("http://e.org/d5", "http://e.org/p", "plain", "literal", null, null, null)
    ).toDF("subject", "predicate", "object", "okind", "lang", "datatype", "source")
    val dir = tmpDir("brf-typed")
    BinaryRdf.write(typed, s"$dir/out.brf")
    val back = BinaryRdf.read(spark, s"$dir/out.brf")
    assert(back.exceptAll(typed).isEmpty && typed.exceptAll(back).isEmpty)
    // a legacy frame still produces byte-identical version-1 records
    val legacy = typed.select("subject", "predicate", "object", "source")
    val l1 = BinaryRdf.serialize(legacy).collect().map(_.getString(0)).toSeq
    val d2 = tmpDir("brf-legacy")
    BinaryRdf.write(legacy, s"$d2/out.brf")
    val reread = BinaryRdf.read(spark, s"$d2/out.brf")
    // legacy records classify as plain literals (the version-1 contract)
    assert(reread.select("okind").distinct().as[String].collect().toSeq ==
      Seq("literal"))
    assert(l1.forall(_.nonEmpty))
  }

  test("typed objects round-trip through TriX and RDF/XML " +
      "(their native term vocabularies)") {
    val typed = Seq(
      ("http://e.org/d1", "http://e.org/p", "http://e.org/other",
        "iri", null, null, "http://e.org/g1"),
      ("_:s9", "http://e.org/p", "_:b7", "bnode", null, null, null),
      ("http://e.org/d3", "http://e.org/p", "bonjour",
        "literal", "fr", null, null),
      ("http://e.org/d4", "http://e.org/p", "42",
        "literal", null, s"${Xsd}integer", "http://e.org/g2"),
      ("http://e.org/d5", "http://e.org/p", "plain \"q\"\n",
        "literal", null, null, null)
    ).toDF("subject", "predicate", "object", "okind", "lang", "datatype", "source")
    // TriX: <uri>/<id> resources, xml:lang, typedLiteral
    val td = tmpDir("trix-typed")
    Trix.write(typed, s"$td/out.trix")
    val tl = spark.read.text(s"$td/out.trix").collect().map(_.getString(0)).toSet
    assert(tl.exists(_.contains("<uri>http://e.org/other</uri></triple>")),
      tl.mkString("\n"))
    assert(tl.exists(_.contains("<id>s9</id>")), tl.mkString("\n"))
    assert(tl.exists(_.contains("<id>b7</id></triple>")))
    assert(tl.exists(_.contains("<plainLiteral xml:lang=\"fr\">bonjour</plainLiteral>")))
    assert(tl.exists(_.contains(
      "<typedLiteral datatype=\"http://www.w3.org/2001/XMLSchema#integer\">42</typedLiteral>")))
    val tback = Trix.read(spark, s"$td/out.trix")
    assert(tback.exceptAll(typed).isEmpty && typed.exceptAll(tback).isEmpty)
    // RDF/XML: rdf:resource / rdf:nodeID empty elements, xml:lang,
    // rdf:datatype, bnode subject via rdf:nodeID (triple format)
    val tripleTyped = typed.drop("source")
    val xd = tmpDir("rdfxml-typed")
    RdfXml.write(tripleTyped, s"$xd/out.rdf")
    val xl = spark.read.text(s"$xd/out.rdf").collect().map(_.getString(0)).toSet
    assert(xl.exists(_.contains(" rdf:resource=\"http://e.org/other\"/>")),
      xl.mkString("\n"))
    assert(xl.exists(l => l.contains("<rdf:Description rdf:nodeID=\"s9\">") &&
      l.contains(" rdf:nodeID=\"b7\"/>")))
    assert(xl.exists(_.contains(" xml:lang=\"fr\">bonjour</p>")))
    assert(xl.exists(_.contains(
      " rdf:datatype=\"http://www.w3.org/2001/XMLSchema#integer\">42</p>")))
    val xback = RdfXml.read(spark, s"$xd/out.rdf")
    assert(xback.exceptAll(tripleTyped).isEmpty &&
      tripleTyped.exceptAll(xback).isEmpty)
    // cross-format agreement with the N-Quads path on the same frame
    val nd = tmpDir("nq-typed2")
    NQuads.write(typed, s"$nd/out.nq")
    val viaNq = NQuads.read(spark, s"$nd/out.nq")
    assert(tback.exceptAll(viaNq).isEmpty && viaNq.exceptAll(tback).isEmpty)
  }

  test("readDocument parses real multi-line Turtle: the reference's foaf.ttl " +
      "(predicate lists, a-keyword, CURIEs, 627 statements)") {
    val foaf = "/root/reference/grafter.repository/dev-resources/grafter/" +
      "rdf4j/repository/rdfs/foaf.ttl"
    assume(new java.io.File(foaf).exists(), s"fixture $foaf not present")
    val rows = Turtle.readDocument(spark, foaf).localCheckpoint()
    val good = rows.filter(col("subject").isNotNull)
    // 93 statements; 91 parse into 627 (s,p,o) rows — ONE statement's
    // literal contains the sequence `" ."` (foaf:plan's ".plan files"
    // comment) and splits mid-literal: the two fragments surface as the
    // documented all-null malformed rows, never as silent partial data
    assert(good.count() == 627, s"got ${good.count()} statements")
    assert(rows.filter(col("subject").isNull).count() == 2)
    val rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    val foafNs = "http://xmlns.com/foaf/0.1/"
    // `a` resolves to rdf:type; CURIE subjects/objects expand; the
    // object is typed as an IRI
    assert(good.filter(col("subject") === s"${foafNs}Person" &&
      col("predicate") === Turtle.RdfType &&
      col("object") === s"${rdfs}Class" && col("okind") === "iri").count() == 1)
    // predicate-list unrolling: foaf:Person carries many properties
    assert(good.filter(col("subject") === s"${foafNs}Person").count() >= 8)
    // plain literals from the lists classify as literals
    assert(good.filter(col("subject") === s"${foafNs}Person" &&
      col("predicate") === s"${rdfs}label" &&
      col("object") === "Person" && col("okind") === "literal").count() == 1)
    // every parsed object classified (iri or literal — foaf has no
    // bnode objects in line-expressible statements)
    assert(good.filter(col("okind").isNull).isEmpty)
    // the document's own @prefix header resolved every CURIE: no
    // residual `prefix:local` forms in subjects/predicates
    assert(good.filter(col("predicate").rlike("^[A-Za-z]+:[A-Za-z]") &&
      !col("predicate").startsWith("http")).isEmpty)
  }

  test("readDocument handles object lists, typed and tagged literals in lists") {
    val dir = tmpDir("ttl-doc")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "in.ttl"),
      """@prefix : <http://e.org/> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |# banner comment
        |:d1 :p "a", "b", "c" ;
        |    :q 42 ;
        |    :r "bonjour"@fr, "hello"@en ;
        |    :s "1.5"^^xsd:decimal ;
        |    :t :other, <http://x.org/y> .
        |:d2 :p "solo" .
        |""".stripMargin)
    val rows = Turtle.readDocument(spark, dir).localCheckpoint()
    assert(rows.filter(col("subject").isNull).isEmpty)
    assert(rows.count() == 10)
    val d1 = rows.filter(col("subject") === "http://e.org/d1")
    assert(d1.filter(col("predicate") === "http://e.org/p")
      .select("object").as[String].collect().toSet == Set("a", "b", "c"))
    assert(d1.filter(col("predicate") === "http://e.org/q" &&
      col("datatype") === s"${Xsd}integer" && col("object") === "42").count() == 1)
    assert(d1.filter(col("predicate") === "http://e.org/r")
      .select("lang").as[String].collect().toSet == Set("fr", "en"))
    assert(d1.filter(col("predicate") === "http://e.org/s" &&
      col("datatype") === s"${Xsd}decimal").count() == 1)
    assert(d1.filter(col("predicate") === "http://e.org/t" &&
      col("okind") === "iri")
      .select("object").as[String].collect().toSet ==
      Set("http://e.org/other", "http://x.org/y"))
    // malformed body (dangling comma) → all-null, never partial
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "bad.ttl"),
      ":d3 :p \"x\", .\n")
    val bad = Turtle.readDocument(spark, s"$dir/bad.ttl").collect()
    assert(bad.length == 1 && (0 until 6).forall(bad(0).isNullAt))
  }

  test("readFile: extension-sniffed statements entry point, ttl routes " +
      "to the document reader") {
    val foaf = "/root/reference/grafter.repository/dev-resources/grafter/" +
      "rdf4j/repository/rdfs/foaf.ttl"
    assume(new java.io.File(foaf).exists(), s"fixture $foaf not present")
    // .ttl → document reader: the multi-line foaf statements all parse
    assert(StatementFormats.readFile(spark, foaf)
      .filter(col("subject").isNotNull).count() == 627)
    // explicit mime override beats the extension
    assert(StatementFormats.readFile(spark, foaf, Some("text/turtle"))
      .filter(col("subject").isNotNull).count() == 627)
    // .nt → the N-family line reader
    val one = "/root/reference/grafter.io/dev/resources/grafter/rdf/1.nt"
    assert(StatementFormats.readFile(spark, one).count() == 1)
    // unknown extension fails loudly with the known list
    val e = intercept[IllegalArgumentException] {
      StatementFormats.readFile(spark, "/tmp/x.unknownext")
    }
    assert(e.getMessage.contains("known extensions"))
    val e2 = intercept[IllegalArgumentException] {
      StatementFormats.readFile(spark, "/tmp/x.nt", Some("text/banana"))
    }
    assert(e2.getMessage.contains("unknown statement format"))
  }

  test("writeFile/readFile: extension-sniffed write ∘ read = id per dialect") {
    val typed = Seq(
      ("http://e.org/d1", "http://e.org/ns#p", "http://e.org/other",
        "iri", null, null, "http://e.org/g1"),
      ("http://e.org/d3", "http://e.org/ns#p", "bonjour",
        "literal", "fr", null, null),
      ("http://e.org/d4", "http://e.org/ns#p", "42",
        "literal", null, s"${Xsd}integer", null)
    ).toDF("subject", "predicate", "object", "okind", "lang", "datatype", "source")
    for (ext <- Seq("nq", "nt", "ttl", "trig", "jsonld", "rdf", "trix", "rj", "brf")) {
      val path = s"${tmpDir(s"wf-$ext")}/out.$ext"
      StatementFormats.writeFile(typed, path,
        Map("e" -> "http://e.org/", "xsd" -> Xsd))
      val want =
        if (Set("nq", "trig", "jsonld", "trix", "brf").contains(ext)) typed
        else typed.drop("source")
      val got = StatementFormats.readFile(spark, path)
        .select(want.columns.map(col).toIndexedSeq: _*)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"writeFile/readFile identity failed for .$ext")
    }
    intercept[IllegalArgumentException] {
      StatementFormats.writeFile(typed, "/tmp/x.unknownext")
    }
  }

  test("readStream: a dropbox of statement files is a typed statement stream") {
    val dir = tmpDir("stmt-stream")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/a.nq"),
      "<http://d1> <http://p> \"x\" <http://g> .\n" +
        "<http://d2> <http://p> <http://o> .\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/b.nq"),
      "# comment\n<http://d3> <http://p> \"y\"@en <http://g> .\n")
    val seen = scala.collection.mutable.ArrayBuffer.empty[Row]
    StatementFormats.readStream(spark, s"$dir/in", "nq",
        options = Map("maxFilesPerTrigger" -> "1"))
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= b.collect(); ()
      }.start().awaitTermination()
    assert(seen.size == 3)
    val byS = seen.map(r => r.getString(0) ->
      (r.getString(2), r.getString(3), Option(r.getString(4)))).toMap
    assert(byS("http://d1") == (("x", "literal", None)))
    assert(byS("http://d2") == (("http://o", "iri", None)))
    assert(byS("http://d3") == (("y", "literal", Some("en"))))
    // ttl streaming takes the caller's prefix map
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/ttl"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/ttl/a.ttl"), "e:d4 a \"Doc\" .\n")
    val seen2 = scala.collection.mutable.ArrayBuffer.empty[Row]
    StatementFormats.readStream(spark, s"$dir/ttl", "text/turtle",
        prefixes = Map("e" -> "http://e.org/"))
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen2 ++= b.collect(); ()
      }.start().awaitTermination()
    assert(seen2.size == 1 && seen2.head.getString(0) == "http://e.org/d4" &&
      seen2.head.getString(1) == Turtle.RdfType)
  }

  test("fuzz: 120 seeded typed statements round-trip through every dialect") {
    // deterministic generator: literals draw from a hostile alphabet
    // (quotes, backslashes, newline family, unicode incl. supplementary,
    // each grammar's own structural delimiters); IRIs stay in the legal
    // IRI charset; langs legal BCP47-ish tags. NUL excluded — every text
    // dialect rejects it loudly by contract (brf's NUL-legality has its
    // own test).
    val rnd = new scala.util.Random(20260818L)
    val hostile = Array("\"", "\\", "\n", "\t", "\r", "ü", "日", "😀",
      "<", ">", "&", "#", " . ", "\" <g> .", "@prefix ", "}]}", "; ", ", ",
      "^^", "@en", "'", "{", "}")
    def lit0(): String =
      (0 until rnd.nextInt(6)).map(_ => hostile(rnd.nextInt(hostile.length)))
        .mkString(rnd.nextBoolean().toString, "x", "")
    def iri(): String = s"http://e.org/r${rnd.nextInt(50)}"
    def statement(i: Int): (String, String, String, String, String, String, String) = {
      val subj = if (rnd.nextInt(5) == 0) s"_:b${rnd.nextInt(9)}" else iri()
      // RDF/XML needs an XML-name local part on every predicate
      val pred = s"http://e.org/ns#p${rnd.nextInt(9)}"
      val src = if (rnd.nextInt(3) == 0) null else iri()
      rnd.nextInt(5) match {
        case 0 => (subj, pred, iri(), "iri", null, null, src)
        case 1 => (subj, pred, s"_:o${rnd.nextInt(9)}", "bnode", null, null, src)
        case 2 => (subj, pred, lit0(), "literal",
          Seq("en", "fr", "en-GB", "zh")(rnd.nextInt(4)), null, src)
        case 3 => (subj, pred, lit0(), "literal", null,
          s"${Xsd}${Seq("integer", "dateTime", "anyURI")(rnd.nextInt(3))}", src)
        case _ => (subj, pred, lit0(), "literal", null, null, src)
      }
    }
    val typed = (0 until 120).map(statement)
      .toDF("subject", "predicate", "object", "okind", "lang", "datatype", "source")
      .localCheckpoint()
    val tripleView = typed.drop("source")
    val writers: Map[String, (String) => Unit] = Map(
      "nq" -> (d => NQuads.write(typed, d)),
      "nt" -> (d => NQuads.write(tripleView, d)),
      "ttl" -> (d => Turtle.write(tripleView, d)),
      "trig" -> (d => Turtle.writeTrig(typed, d)),
      "jsonld" -> (d => JsonLd.write(typed, d)),
      "rdf" -> (d => RdfXml.write(tripleView, d)),
      "trix" -> (d => Trix.write(typed, d)),
      "rj" -> (d => RdfJson.write(tripleView, d)),
      "brf" -> (d => BinaryRdf.write(typed, d)))
    val readers: Map[String, String => org.apache.spark.sql.DataFrame] = Map(
      "nq" -> (d => NQuads.read(spark, d)),
      "nt" -> (d => NQuads.read(spark, d)),
      "ttl" -> (d => Turtle.read(spark, d)),
      "trig" -> (d => Turtle.readTrig(spark, d)),
      "jsonld" -> (d => JsonLd.read(spark, d)),
      "rdf" -> (d => RdfXml.read(spark, d)),
      "trix" -> (d => Trix.read(spark, d)),
      "rj" -> (d => RdfJson.read(spark, d)),
      "brf" -> (d => BinaryRdf.read(spark, d)))
    writers.foreach { case (fmt, w) =>
      val dir = s"${tmpDir(s"fuzz-$fmt")}/out.$fmt"
      w(dir)
      val want =
        if (Set("nq", "trig", "jsonld", "trix", "brf").contains(fmt)) typed
        else tripleView
      val got = readers(fmt)(dir).select(want.columns.map(col).toIndexedSeq: _*)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"dialect $fmt did not round-trip the fuzz frame: " +
          got.exceptAll(want).limit(3).collect().mkString(" | "))
    }
  }

  test("lang-tagged literals round-trip through N-Triples and Turtle") {
    val dir = tmpDir("langlit")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "in.nt"),
      "<http://d1> <http://p> \"bonjour\"@fr .\n" +
        "<http://d1> <http://p> \"hello\"@en-GB .\n")
    val rows = NQuads.read(spark, s"$dir/in.nt")
    assert(rows.select("lang").as[String].collect().toSet == Set("fr", "en-GB"))
    assert(rows.select("okind").distinct().as[String].collect().toSeq ==
      Seq("literal"))
    NQuads.write(rows, s"$dir/out.nt")
    val back = NQuads.read(spark, s"$dir/out.nt")
    assert(back.exceptAll(rows).isEmpty && rows.exceptAll(back).isEmpty)
    Turtle.write(rows.drop("source"), s"$dir/out.ttl")
    val viaTtl = Turtle.read(spark, s"$dir/out.ttl")
    assert(viaTtl.exceptAll(rows.drop("source")).isEmpty &&
      rows.drop("source").exceptAll(viaTtl).isEmpty)
  }
}
