package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative pins for the scalar primitives: the native HammingHex
  * expression against both the column-tree oracle twin AND a plain Scala
  * popcount, and the Prefixes expand∘compact inverse law — random inputs,
  * evaluated in one Spark job per property (not one per case).
  */
class HashPropertySpec extends SparkSpec {
  import spark.implicits._

  private val hexChar = Gen.oneOf("0123456789abcdef".toSeq)
  private val hex16 = Gen.listOfN(16, hexChar).map(_.mkString)

  test("hammingHex: native == column tree == scala popcount on random hex pairs") {
    graft.functions.VectorExprs.register(spark)
    val pairs = Gen.listOfN(300, Gen.zip(hex16, hex16)).sample.get
    def scalaHamming(a: String, b: String): Int =
      a.zip(b).map { case (x, y) =>
        Integer.bitCount(Integer.parseInt(x.toString, 16) ^
          Integer.parseInt(y.toString, 16))
      }.sum
    val got = pairs.toDF("a", "b").select($"a", $"b",
        graft.functions.VectorExprs.hammingHex($"a", $"b").as("n"),
        graft.operators.DedupOps.hammingHex64($"a", $"b").as("c"))
      .collect()
    got.foreach { r =>
      val expected = scalaHamming(r.getString(0), r.getString(1))
      assert(r.getInt(2) == expected && r.getInt(3) == expected,
        s"${r.getString(0)} vs ${r.getString(1)}: native=${r.getInt(2)} " +
          s"tree=${r.getInt(3)} scala=$expected")
    }
    // triangle inequality spot-check on consecutive triples (sanity that
    // the distance is a metric, not just deterministic)
    val hs = Gen.listOfN(60, hex16).sample.get
    val triples = hs.sliding(3).collect { case Seq(a, b, c) => (a, b, c) }.toSeq
    triples.foreach { case (a, b, c) =>
      val ab = scalaHamming(a, b); val bc = scalaHamming(b, c); val ac = scalaHamming(a, c)
      assert(ac <= ab + bc)
    }
  }

  test("prefixes: compact ∘ expand = id on random CURIEs; expand ∘ compact = id on IRIs") {
    import graft.sources.Prefixes
    val m = Map("a" -> "http://a.example/", "ab" -> "http://a.example/b/",
      "z" -> "http://z.example/ns#")
    val local = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(12).mkString)
    val curies = Gen.listOfN(200,
      Gen.zip(Gen.oneOf(m.keys.toSeq), local).map { case (p, l) => s"$p:$l" })
      .sample.get
    val out = curies.toDF("v").select($"v",
        Prefixes.compact(Prefixes.expand($"v", m), m).as("rt"))
      .filter($"v" =!= $"rt").count()
    assert(out == 0, "compact ∘ expand must be identity on mapped CURIEs")
    val iris = Gen.listOfN(200,
      Gen.zip(Gen.oneOf(m.values.toSeq), local).map { case (ns, l) => s"$ns$l" })
      .sample.get
    val out2 = iris.toDF("v").select($"v",
        Prefixes.expand(Prefixes.compact($"v", m), m).as("rt"))
      .filter($"v" =!= $"rt").count()
    assert(out2 == 0, "expand ∘ compact must be identity on mapped IRIs")
  }
}
