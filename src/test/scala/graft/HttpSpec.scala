package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Http, NQuads, StatementFormats, Turtle}

/** HTTP statement transport (S9), mime negotiation over the open format
  * registry (E3), and comment stripping in the statement parsers (C2) —
  * the recast of the reference's SPARQL-over-HTTP session
  * (SPARQLSession.java), format multimethods (formats.clj:35-71) and
  * query-text strip-comments (sparql.clj:115-121).
  */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private val prefixes = Map(
    "doc" -> "http://example.org/doc/",
    "g" -> "http://example.org/graph/")

  private def stmts: DataFrame = Seq(
    ("http://example.org/doc/1", "http://example.org/doc/lang", "en",
      "http://example.org/graph/a"),
    ("http://example.org/doc/2", "http://example.org/doc/lang", "fr",
      "http://example.org/graph/b"),
    ("http://example.org/doc/3", "http://example.org/doc/title",
      "line1\nline2 \"quoted\"", "http://example.org/graph/a")
  ).toDF("subject", "predicate", "object", "source")

  private def withServer[A](df: DataFrame = stmts,
                            pfx: Map[String, String] = prefixes)
                           (f: Http.StatementServer => A): A = {
    val srv = Http.serve(df, pfx)
    try f(srv) finally srv.stop()
  }

  test("negotiation: Accept picks the served format; Content-Type drives the parse") {
    withServer() { srv =>
      // typed-model columns ride along; negotiation compares the legacy
      // statement columns
      def legacy(df: org.apache.spark.sql.DataFrame) =
        df.select(df.columns.filterNot(
          graft.sources.RdfTerms.TypedCols.contains).map(col): _*)
      // quads ask → quads back, graph column intact
      val nq = legacy(Http.read(spark, srv.url, accept = Seq("application/n-quads")))
      assert(nq.exceptAll(stmts).isEmpty && stmts.exceptAll(nq).isEmpty)
      // turtle ask → triples back (turtle carries no graph), CURIEs resolved
      val ttl = legacy(Http.read(spark, srv.url, accept = Seq("text/turtle")))
      val expected = stmts.drop("source")
      assert(ttl.exceptAll(expected).isEmpty && expected.exceptAll(ttl).isEmpty)
      // trig ask → quads back through the Turtle term model
      val trig = legacy(Http.read(spark, srv.url, accept = Seq("application/trig")))
      assert(trig.exceptAll(stmts).isEmpty && stmts.exceptAll(trig).isEmpty)
    }
  }

  test("negotiation honors q-values, wildcards, and the 406 contract") {
    // q-value order beats listing order (formats.clj-registry priority
    // only breaks ties)
    assert(StatementFormats.negotiate(
      Some("application/n-triples;q=0.2, text/turtle")).contains("ttl"))
    // mime parameters are trimmed at ';' (formats.clj:41-43)
    assert(StatementFormats.negotiate(
      Some("text/turtle; charset=utf-8")).contains("ttl"))
    // */* and type/* wildcards resolve against registration order
    assert(StatementFormats.negotiate(Some("*/*")).contains("nq"))
    assert(StatementFormats.negotiate(Some("text/*")).contains("ttl"))
    // q=0 excludes; nothing servable → None → HTTP 406 → loud client error
    assert(StatementFormats.negotiate(Some("text/turtle;q=0")).isEmpty)
    // q=0 is EXCLUSION: a wildcard must not resolve to a zeroed-out mime
    // (with turtle zeroed, text/* falls through to the NEXT text type)
    assert(StatementFormats.negotiate(Some("text/*, text/turtle;q=0")).contains("n3"))
    assert(StatementFormats.negotiate(
      Some("text/*, text/turtle;q=0, text/n3;q=0")).isEmpty)
    assert(StatementFormats.negotiate(
      Some("*/*, application/n-quads;q=0")).contains("nt"))
    withServer() { srv =>
      val e = intercept[IllegalStateException] {
        Http.read(spark, srv.url, accept = Seq("application/pdf"))
      }
      assert(e.getMessage.contains("406"))
    }
    // extension-style coercion (reference ->rdf-format String without '/')
    assert(StatementFormats.formatFor(".ttl").contains("ttl"))
    assert(StatementFormats.formatFor("NT").contains("nt"))
    assert(StatementFormats.formatFor("application/unknown").isEmpty)
  }

  test("graph and limit request parameters restrict the served statements") {
    withServer() { srv =>
      val one = Http.read(spark,
        srv.url + "?graph=" + java.net.URLEncoder.encode(
          "http://example.org/graph/b", "UTF-8"))
      assert(one.count() == 1 &&
        one.select("object").as[String].collect().sameElements(Array("fr")))
      val limited = Http.read(spark, srv.url + "?limit=2")
      assert(limited.count() == 2)
    }
    // a triples-only frame has no named graphs: graph-scoped requests
    // yield ZERO statements, never the whole frame under a 200
    withServer(df = stmts.drop("source"), pfx = Map.empty) { srv =>
      assert(Http.read(spark, srv.url + "?graph=anything").count() == 0)
    }
  }

  test("a truncated marked stream is refused, never returned partial") {
    // a server that PROMISES the end marker but dies mid-body: the
    // chunked encoding still terminates cleanly, so only the marker
    // protocol can expose the truncation
    withServer() { srv =>
      srv.server.createContext("/trunc", (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getResponseHeaders.set("Content-Type", "application/n-quads")
        ex.getResponseHeaders.set("X-Graft-Stream", "marked")
        ex.sendResponseHeaders(200, 0)
        ex.getResponseBody.write(
          "<s> <p> \"o\" <g> .\n".getBytes("UTF-8")) // no end marker
        ex.close()
      })
      val e = intercept[java.io.IOException] {
        Http.read(spark, s"http://127.0.0.1:${srv.port}/trunc")
      }
      assert(e.getMessage.contains("truncated"))
      // and the normal path (marker present) still round-trips
      assert(Http.read(spark, srv.url).count() == 3)
    }
  }

  test("redirects are followed (HANDLE_REDIRECTS analog)") {
    withServer() { srv =>
      srv.server.createContext("/old", (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getResponseHeaders.set("Location", srv.url)
        ex.sendResponseHeaders(302, -1)
        ex.close()
      })
      val via = Http.read(spark, s"http://127.0.0.1:${srv.port}/old")
      assert(via.count() == stmts.count())
    }
  }

  test("timeout propagates as ms param and the Stardog-shaped 500 raises typed") {
    // a frame whose first partition takes ~3 s to produce: the server's
    // deadline (1 s) expires before the first byte
    val slowField = udf { () => Thread.sleep(30); "x" }.asNondeterministic()
    val slow = spark.range(100).repartition(1).select(
      slowField().as("subject"), slowField().as("predicate"),
      slowField().as("object"))
    withServer(df = slow, pfx = Map.empty) { srv =>
      intercept[Http.QueryTimeoutException] {
        Http.read(spark, srv.url, maxQueryTimeSeconds = 1)
      }
      // the parameter rode in ms = 1000 × seconds (SPARQLSession.java:120-126)
      assert(srv.lastRequestUri.contains("timeout=1000"))
    }
    // and a fast frame under the same deadline succeeds
    withServer() { srv =>
      assert(Http.read(spark, srv.url, maxQueryTimeSeconds = 1).count() == 3)
    }
  }

  test("registry is open: a registered custom codec becomes negotiable (E3)") {
    val key = "tsvish"
    StatementFormats.registry(key) = StatementFormats.StatementCodec(
      "text/tab-separated-statements", "tsvish",
      (df, _) => df.select(concat_ws("\t",
        col("subject"), col("predicate"), col("object")).as("value")),
      (s, p) => {
        val parts = split(col("value"), "\t")
        s.read.text(p).filter(!col("value").rlike("^\\s*#"))
          .select(parts.getItem(0).as("subject"),
            parts.getItem(1).as("predicate"), parts.getItem(2).as("object"))
      })
    val flat = Seq( // tsv carries no escaping — newline-free fixtures
      ("s1", "p", "en"), ("s2", "p", "fr")).toDF("subject", "predicate", "object")
    try withServer(df = flat, pfx = Map.empty) { srv =>
      val back = Http.read(spark, srv.url,
        accept = Seq("text/tab-separated-statements"))
      assert(back.exceptAll(flat).isEmpty && flat.exceptAll(back).isEmpty)
    } finally StatementFormats.registry.remove(key)
  }

  test("comment stripping (C2): full-line and trailing comments, guarded literals") {
    val dir = tmpDir("c2")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "in.nq"),
      """# full-line comment
        |<s1> <p> "plain" <g> .
        |<s2> <p> "o" <g> . # trailing comment
        |   # indented full-line comment
        |<s3> <p> "kept # inside literal" <g> .
        |<s4#frag> <p> "o" <g> .
        |<s5> <p> "a # b" <g> . # literal hash AND trailing comment
        |<s6> <p> "end. # c" <g> . # terminator-lookalike inside literal
        |@prefix ex: <http://e.org/> . # commented prefix header
        |""".stripMargin)
    val back = NQuads.read(spark, s"$dir/in.nq").collect()
    assert(back.length == 6)
    val bySubject = back.map(r => r.getString(0) -> r.getString(2)).toMap
    assert(bySubject("s2") == "o") // trailing comment stripped
    assert(bySubject("s3") == "kept # inside literal") // grammar-guarded
    assert(bySubject.contains("s4#frag")) // IRI fragment untouched
    // strip candidates are grammar-checked: the comment is removed at a
    // terminator-adjacent site whose REMAINDER parses, so a '#' (even a
    // '. #') inside the literal survives alongside a real trailing comment
    assert(bySubject("s5") == "a # b")
    assert(bySubject("s6") == "end. # c")
    assert(NQuads.readPrefixes(spark, dir) == Map("ex" -> "http://e.org/"))

    // turtle: same contract through the CURIE path (own dir — the
    // readers scan whole directories)
    val tdir = tmpDir("c2ttl")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tdir, "in.ttl"),
      """@prefix doc: <http://example.org/doc/> .
        |# banner
        |doc:1 doc:lang "en" . # note
        |doc:2 doc:lang "has # hash" .
        |""".stripMargin)
    val ttl = Turtle.read(spark, tdir).collect()
    assert(ttl.length == 2)
    assert(ttl.map(_.getString(2)).toSet == Set("en", "has # hash"))
  }

  test("served body banner comment is transparent to every parser") {
    // the server writes '# graft statement service (fmt)' first — C2 in
    // the live transport loop, all four formats
    withServer() { srv =>
      for (mime <- Seq("application/n-quads", "application/n-triples",
        "text/turtle", "application/trig")) {
        val df = Http.read(spark, srv.url, accept = Seq(mime))
        assert(df.count() == 3, mime)
        assert(df.filter(col("subject").isNull).count() == 0, mime)
      }
    }
  }
}
