package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.cdc.{Dedup, Lww}
import graft.model.ChangeEvent
import graft.verify.FoldOracle

/** ScalaCheck properties (FIXTURES.md §6): permutation-invariance of LWW,
  * duplicate-delivery idempotence, salted == unsalted, engine == fold.
  * Replaces the reference's hand-rolled round-trip tests
  * (/root/reference/grafter.io/test/grafter_2/rdf4j/io_test.clj:187-235)
  * with generative ones. Raw ScalaCheck (scalatestplus is not in the
  * offline cache); fixed initial seed for reproducibility.
  */
class LwwPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val eventsGen: Gen[List[ChangeEvent]] = for {
    n <- Gen.choose(1, 60)
    keys <- Gen.choose(1, 8)
    evs <- Gen.sequence[List[ChangeEvent], ChangeEvent]((0 until n).map { i =>
      for {
        k <- Gen.choose(0, keys - 1)
        isDel <- Gen.frequency(4 -> false, 1 -> true)
        toks <- Gen.choose(1, 5).flatMap(len => Gen.listOfN(len, Gen.choose(0, 999)))
      } yield ChangeEvent(
        if (isDel) "D" else "U", s"k$k", i.toLong,
        new Timestamp(i * 1000L),
        if (isDel) null else toks.toArray,
        if (isDel) null else Int.box(toks.length), "s")
    })
  } yield evs

  test("LWW is permutation-invariant, matches max-lsn fold; salted == plain") {
    check("lww-perm", Prop.forAll(eventsGen, Gen.long) { (events, permSeed) =>
      val rnd = new scala.util.Random(permSeed)
      val shuffled = rnd.shuffle(events)
      val df = spark.createDataset(shuffled).toDF()
      val plain = Lww.reduce(df).collect()
        .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("lsn"))).toSet
      val salted = Lww.reduceSalted(df, 4).collect()
        .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("lsn"))).toSet
      val expected = events.groupBy(_.doc_id).map { case (k, es) =>
        (k, es.map(_.lsn).max)
      }.toSet
      plain == salted && plain == expected
    })
  }

  test("duplicate delivery is idempotent through dedup+LWW") {
    check("dup-idem", Prop.forAll(eventsGen) { events =>
      val df = spark.createDataset(events ++ events.take(events.size / 2)).toDF()
      val once = spark.createDataset(events).toDF()
      val a = Lww.reduce(Dedup.exact(df)).collect()
        .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("lsn"))).toSet
      val b = Lww.reduce(once).collect()
        .map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("lsn"))).toSet
      a == b
    })
  }

  test("Misra–Gries sketch: detection guarantee, partition invariance, routing equivalence") {
    import graft.cdc.HeavyHitters
    import org.apache.spark.sql.functions._
    // hot feed: key "hot" holds 50% of 10k rows, rest uniform over 500
    val hot = spark.range(0, 10000).selectExpr(
      "CASE WHEN id % 2 = 0 THEN 'hot' ELSE concat('k', id % 500) END AS doc_id")
    val k = 64
    // MG guarantee: a key with true share s is reported with share
    // ≥ s − 1/(k+1); detection must also be invariant to partitioning
    // (the sketch merges across partitions, it does not sample them)
    Seq(1, 7, 32).foreach { parts =>
      val share = HeavyHitters.topShare(hot.repartition(parts), "doc_id", k)
      assert(share >= 0.5 - 1.0 / (k + 1) - 1e-9,
        s"hot share $share under-detected at $parts partitions")
      assert(share <= 0.51, s"hot share $share over-reported")
    }
    // uniform feed: no key may look hot (every true share = 1/500)
    val uniform = spark.range(0, 10000).selectExpr("concat('k', id % 500) AS doc_id")
    assert(HeavyHitters.topShare(uniform.repartition(8), "doc_id", k) < 0.05)
    // empty batch → 0.0, never NaN/NPE (idle streaming triggers)
    assert(HeavyHitters.topShare(hot.limit(0), "doc_id", k) == 0.0)
    // routing never changes results: sketched auto == plain reduce on
    // both shapes (the salted path engages for the hot feed)
    val cfgHot = graft.feed.FeedConfig(seed = 5L, numEvents = 6000, numDocs = 200,
      hotFraction = 0.5, numHot = 2, deletePct = 5, maxTokens = 6)
    val feed = graft.feed.ChangeFeed.events(spark, cfgHot).toDF()
    val auto = graft.cdc.Lww.reduceAutoSketched(feed, "doc_id", numBuckets = 4)
      .select("doc_id", "lsn").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = graft.cdc.Lww.reduce(feed)
      .select("doc_id", "lsn").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(auto == plain)
  }

  test("fold oracle visibility: winner D hides the key, winner U carries payload") {
    check("fold-vis", Prop.forAll(eventsGen) { events =>
      val state = FoldOracle.finalState(events)
      events.groupBy(_.doc_id).forall { case (k, es) =>
        val winner = es.maxBy(_.lsn)
        if (winner.op == "D") !state.contains(k)
        else state.contains(k) && state(k).tokens.sameElements(winner.tokens)
      }
    })
  }
}
