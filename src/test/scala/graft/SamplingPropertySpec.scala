package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Sampling

/** Generative pins for the seeded-sampling laws over arbitrary key sets,
  * rates, and seeds — the invariants users build pipelines on: nesting in
  * p, split partitioning, hash-order consistency between exactK and
  * Bernoulli. Driver-side where the law is pure hash math (fast, still
  * the identical md5 the cluster computes); Spark frames where
  * partitioning could matter.
  */
class SamplingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(4242L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val keysGen: Gen[List[Long]] =
    Gen.choose(1, 200).flatMap(n => Gen.listOfN(n, Gen.choose(-1000000L, 1000000L)))
      .map(_.distinct)
  private val seedGen: Gen[String] = Gen.alphaNumStr.map(_.take(8))
  private val rateGen: Gen[Double] = Gen.choose(0.0, 1.0)

  test("bernoulli nesting: p1 <= p2 implies sample(p1) subset of sample(p2), any seed/keys") {
    check("nesting", Prop.forAll(keysGen, seedGen, rateGen, rateGen) {
      (keys, seed, a, b) =>
        val (p1, p2) = (math.min(a, b), math.max(a, b))
        val df = keys.toDF("k")
        val s1 = Sampling.bernoulli(df, $"k", p1, seed).as[Long].collect().toSet
        val s2 = Sampling.bernoulli(df, $"k", p2, seed).as[Long].collect().toSet
        s1.subsetOf(s2)
    })
  }

  test("splits partition the key set exactly, for arbitrary weights") {
    val weightsGen = Gen.choose(2, 4).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0.05, 5.0)))
    check("partition", Prop.forAll(keysGen, seedGen, weightsGen) {
      (keys, seed, ws) =>
        val splits = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
        val df = keys.toDF("k")
        val labelled = Sampling.assignSplits(df, $"k", splits, seed)
          .groupBy("split").count().as[(String, Long)].collect().toMap
        labelled.values.sum == keys.size &&
          labelled.keySet.subsetOf(splits.map(_._1).toSet)
    })
  }

  test("exactK agrees with the bernoulli order: the k lowest draws are the sample") {
    check("order", Prop.forAll(keysGen, seedGen, Gen.choose(0, 50)) {
      (keys, seed, k) =>
        val df = keys.toDF("k")
        val got = Sampling.exactK(df, $"k", k, seed).as[Long].collect().toSet
        // reference: sort keys by the SAME draw computed through Spark
        val drawn = df.select($"k", Sampling.draw(seed, $"k").as("u"))
          .as[(Long, String)].collect().sortBy(r => (r._2, r._1))
        got == drawn.take(k).map(_._1).toSet
    })
  }
}
