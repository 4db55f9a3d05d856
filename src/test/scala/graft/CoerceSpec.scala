package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.coerce.Coerce
import graft.stream.Batching

/** Coercion-matrix corner cases — the reference's pinned semantics
  * (io_test.clj:46-51, 110-126, 167-177) re-pinned over Spark columns —
  * plus the exact batch-split arithmetic (batching_test.clj:47-62).
  */
class CoerceSpec extends SparkSpec {
  import spark.implicits._

  test("special float lexical forms: INF/+INF/-INF/NaN round-trip") {
    val df = Seq("INF", "+INF", "-INF", "NaN", "1.5", "-2.25e3")
      .toDF("s").select($"s", Coerce.parseDouble($"s").as("d"))
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("INF").isPosInfinity && got("+INF").isPosInfinity)
    assert(got("-INF").isNegInfinity)
    assert(got("NaN").isNaN)
    assert(got("1.5") == 1.5 && got("-2.25e3") == -2250.0)
    // serialise back to the XSD lexical space
    val back = df.select(Coerce.formatDouble($"d").as("s2")).collect().map(_.getString(0))
    assert(back.toSet == Set("INF", "-INF", "NaN", "1.5", "-2250.0"))
  }

  test("xsd:time: 24:00:00 normalises to 00:00; fraction truncates to 9 digits") {
    val df = Seq(
      "24:00:00",            // normalises to midnight (io.clj:132-144)
      "00:00:00.5",
      "13:20:15.123456789999", // > 9 digits: truncate, round DOWN
      "01:02:03")
      .toDF("t").select($"t", Coerce.parseTimeNanos($"t").as("n"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("24:00:00") == 0L)
    assert(got("00:00:00.5") == 500000000L)
    assert(got("13:20:15.123456789999") ==
      ((13L * 3600 + 20 * 60 + 15) * 1000000000L + 123456789L))
    assert(got("01:02:03") == (1L * 3600 + 2 * 60 + 3) * 1000000000L)
  }

  test("OffsetDate/OffsetTime structs: zone kept losslessly, absent zone is null") {
    // the reference's OffsetDate exists because java.time cannot hold
    // date+zone losslessly (protocols.cljc:153-161) — struct mapping §1.4
    val d = Seq("2024-02-29-08:00", "2024-01-15Z", "2024-06-01")
      .toDF("s").select($"s", Coerce.offsetDate($"s").as("od"))
    val got = d.select($"s", $"od.date".cast("string"), $"od.offsetSeconds")
      .collect().map(r => r.getString(0) -> (r.getString(1), if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(got("2024-02-29-08:00") == ("2024-02-29", Some(-28800)))
    assert(got("2024-01-15Z") == ("2024-01-15", Some(0)))
    assert(got("2024-06-01") == ("2024-06-01", None))

    val t = Seq("24:00:00Z", "13:20:30.123456789999+05:30", "01:02:03")
      .toDF("s").select($"s", Coerce.offsetTime($"s").as("ot"))
    val gt = t.select($"s", $"ot.nanos", $"ot.offsetSeconds")
      .collect().map(r => r.getString(0) -> (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    // 24:00 normalisation and 9-digit truncation apply inside the struct too
    assert(gt("24:00:00Z") == (0L, Some(0)))
    assert(gt("13:20:30.123456789999+05:30") ==
      (((13L * 3600 + 20 * 60 + 30) * 1000000000L + 123456789L), Some(19800)))
    assert(gt("01:02:03") == ((1L * 3600 + 2 * 60 + 3) * 1000000000L, None))
  }

  test("int / long / unbounded integer stay distinct types") {
    val df = Seq("2147483647", "9223372036854775807",
        "99999999999999999999999999999999999999")
      .toDF("s")
      .select(
        Coerce.coerce("xsd:int", $"s").as("i"),
        Coerce.coerce("xsd:long", $"s").as("l"),
        Coerce.coerce("xsd:integer", $"s").as("u"))
    assert(df.schema("i").dataType == IntegerType)
    assert(df.schema("l").dataType == LongType)
    assert(df.schema("u").dataType == DecimalType(38, 0))
    val rows = df.collect()
    assert(rows(0).getInt(0) == Int.MaxValue)
    assert(rows(1).isNullAt(0) && rows(1).getLong(1) == Long.MaxValue) // overflow → null, not wrap
    assert(rows(2).isNullAt(1) && rows(2).getDecimal(2) != null)       // only unbounded holds it
  }

  test("LangString: struct shape and value-then-tag ordering (L2)") {
    val df = Seq(("Bonsoir", "fr"), ("Bonsoir", "de"), ("Au revoir", "fr"))
      .toDF("v", "t").select(Coerce.langString($"v", $"t").as("ls"))
    val ordered = df.orderBy(Coerce.langStringOrder($"ls"))
      .collect().map(r => (r.getStruct(0).getString(0), r.getStruct(0).getString(1)))
    assert(ordered.toSeq == Seq(("Au revoir", "fr"), ("Bonsoir", "de"), ("Bonsoir", "fr")))
  }

  test("unknown datatype passes through as (raw, datatype)") {
    val df = Seq(("abc", "http://example/custom"))
      .toDF("v", "dt").select(Coerce.rawLiteral($"v", $"dt").as("r"))
    val r = df.collect()(0).getStruct(0)
    assert(r.getString(0) == "abc" && r.getString(1) == "http://example/custom")
  }

  test("registry is open for extension") {
    Coerce.registry("test:upper") = (c) => upper(c)
    val out = Seq("x").toDF("s").select(Coerce.coerce("test:upper", $"s")).head.getString(0)
    assert(out == "X")
    Coerce.registry.remove("test:upper")
  }

  test("typed statement model bridges into the coercion matrix " +
      "(reference rdf-types.ttl → native values)") {
    val fixture =
      "/root/reference/grafter.io/dev/resources/grafter/rdf/rdf-types.ttl"
    assume(new java.io.File(fixture).exists(), s"fixture $fixture not present")
    val rows = graft.sources.Turtle.read(spark, fixture)
      .select(col("subject"), Coerce.nativeStruct(col("object"), col("datatype")).as("v"))
    def row(s: String) = rows.filter(col("subject") === s"http://example/$s")
    // every fixture construct lands as its native Spark value
    assert(row("boolean").select($"v.bool").head.getBoolean(0))
    assert(row("integer").select($"v.integer".cast("long")).head.getLong(0) == 10L)
    assert(row("decimal").select($"v.decimal".cast("double")).head.getDouble(0) == 1.2)
    assert(row("double").select($"v.double").head.getDouble(0) == 1.0e6)
    assert(row("float").select($"v.float").head.getFloat(0) == 0.4f)
    assert(row("date").select(date_format($"v.dateTime", "yyyy-MM-dd HH:mm"))
      .head.getString(0) == "2015-01-01 00:00")
    assert(row("string").select($"v.string").head.getString(0) == "hello")
    // sparse: exactly one lattice field non-null per row
    val nonNull = rows.select((0 until 10).map(i =>
      when($"v".getField(rows.select($"v.*").columns(i)).isNotNull, 1)
        .otherwise(0)).reduce(_ + _).as("n"))
    assert(nonNull.filter(col("n") =!= 1).isEmpty)
    // unknown datatype IRIs pass through the registry key unchanged
    assert(Coerce.registryKey("http://example/custom") == "http://example/custom")
    assert(Coerce.registryKey(
      "http://www.w3.org/2001/XMLSchema#integer") == "xsd:integer")
  }

  test("batch splits match the reference's exact arithmetic: [3 3 3 1]") {
    assert(Batching.splitSizes(10, 3) == Seq(3L, 3L, 3L, 1L))
    assert(Batching.splitSizes(10, 5) == Seq(5L, 5L))
    assert(Batching.splitSizes(0, 3).isEmpty)
    assert(Batching.splitSizes(2, 3) == Seq(2L))
    assert(Batching.lsnRanges(100, 109, 3) ==
      Seq((100L, 102L), (103L, 105L), (106L, 108L), (109L, 109L)))
  }
}
