package graft

import graft.feed.{ChangeFeed, FeedConfig}
import graft.lake.LakeTable
import graft.model.Schemas
import graft.sources.Codecs
import graft.stream.CdcIngest
import graft.verify.FoldOracle

/** Codec registry: extension inference, jsonl round-trip, replay from a
  * jsonl feed == replay from parquet == fold oracle.
  */
class CodecSpec extends SparkSpec {
  import spark.implicits._

  val cfg = FeedConfig(seed = 5L, numEvents = 3000, numDocs = 100, maxTokens = 8)

  test("extension inference: file, directory, unknown") {
    val dir = tmpDir("codec")
    ChangeFeed.events(spark, cfg).toDF().write.json(s"$dir/feed.jsonl")
    // a Spark-written "feed.jsonl" is a directory of part-*.json files —
    // directory sniffing looks inside, so either spelling is correct
    assert(Set("json", "jsonl").contains(Codecs.infer(s"$dir/feed.jsonl").get))
    assert(Codecs.infer("/not/existing/feed.jsonl").contains("jsonl"))
    ChangeFeed.events(spark, cfg).toDF().write.parquet(s"$dir/pq")
    assert(Codecs.infer(s"$dir/pq").contains("parquet"))
    assert(Codecs.infer("/does/not/matter.ttl").isEmpty)
    intercept[IllegalArgumentException] {
      Codecs.read(spark, "/tmp/whatever.ttl", Schemas.changeEvent)
    }
  }

  test("jsonl feed replays to the same state as the fold oracle") {
    val dir = tmpDir("codec2")
    ChangeFeed.events(spark, cfg).toDF().write.json(s"$dir/feed.jsonl")
    val feed = Codecs.read(spark, s"$dir/feed.jsonl", Schemas.changeEvent)
    assert(feed.count() == cfg.numEvents)
    val table = LakeTable.create(spark, s"$dir/t", Schemas.docRow, numBuckets = 4)
    CdcIngest.applyBatch(table, feed, epochId = 0L)
    assert(FoldOracle.diff(table.read(), FoldOracle.finalState(cfg)).isEmpty)
  }

  test("URL handling: file: URLs resolve, other schemes sniff without I/O") {
    val dir = tmpDir("codec3")
    ChangeFeed.events(spark, cfg).toDF().write.parquet(s"$dir/pq")
    assert(Codecs.infer(s"file://$dir/pq").contains("parquet"))
    assert(Codecs.infer("https://example.invalid/data/feed.jsonl?x=1").contains("jsonl"))
    assert(Codecs.infer("s3://bucket/prefix/part-0.parquet").contains("parquet"))
    assert(Codecs.infer("https://example.invalid/feed.ttl").isEmpty)
  }

  test("registry is open: a custom codec can be registered") {
    Codecs.registry("ndjson") = Codecs.Codec("json")
    assert(Codecs.infer("/x/feed.ndjson").contains("ndjson"))
    Codecs.registry.remove("ndjson")
    assert(Codecs.infer("/x/feed.tsv").contains("tsv")) // built-in
  }
}

/** CURIE prefix expansion/compaction (SURVEY §2.9 C3). */
class PrefixesSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.sources.Prefixes

  test("expand/compact: round trip, longest-namespace match, passthrough") {
    val m = Map(
      "ex" -> "http://example.org/",
      "exd" -> "http://example.org/doc/", // nested inside ex's namespace
      "dct" -> "http://purl.org/dc/terms/")
    val vals = Seq("ex:thing", "exd:42", "dct:title", "unknown:x", "plain")
      .toDF("v")
    val out = vals.select($"v",
      Prefixes.expand($"v", m).as("iri"))
      .withColumn("back", Prefixes.compact($"iri", m))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val byV = out.map(t => t._1 -> t).toMap
    assert(byV("ex:thing")._2 == "http://example.org/thing")
    assert(byV("exd:42")._2 == "http://example.org/doc/42")
    assert(byV("dct:title")._2 == "http://purl.org/dc/terms/title")
    // no mapping -> unchanged (unknown-passthrough, io.clj:176-181 analog)
    assert(byV("unknown:x")._2 == "unknown:x" && byV("plain")._2 == "plain")
    // compact inverts expand - INCLUDING the nested namespace, which must
    // compact to the longest match (exd:, not ex:doc/)
    out.foreach { case (v, _, back) => assert(back == v, s"$v -> $back") }
    val nested = spark.range(1)
      .select(Prefixes.compact(lit("http://example.org/doc/9"), m).as("c"))
      .head().getString(0)
    assert(nested == "exd:9")
  }
}
