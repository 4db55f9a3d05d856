package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Path
import graft.operators.Path._

/** ScalaCheck laws for the composable path algebra over random small
  * labeled graphs — the generative counterpart of the reference's
  * hand-picked path tests (/root/reference/grafter.repository/test/
  * grafter_2/rdf4j/sparql/path_test.clj:49-218).
  */
class PathPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(6)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val preds = Seq("a", "b", "c")

  private val graphGen: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(3, 14)
    edges <- Gen.listOfN(n, for {
      s <- Gen.choose(0L, 5L)
      p <- Gen.oneOf(preds)
      d <- Gen.choose(0L, 5L)
    } yield (s, p, d))
  } yield edges

  private def rows(edges: List[(Long, String, Long)], p: Path): Set[(Long, Long)] =
    Path.eval(edges.toDF("src", "p", "dst"), p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("alt is commutative and associative; seq distributes over alt") {
    check("alt-laws", Prop.forAll(graphGen) { g =>
      val (a, b, c) = (Pred("a"), Pred("b"), Pred("c"))
      rows(g, a | b) == rows(g, b | a) &&
        rows(g, (a | b) | c) == rows(g, a | (b | c)) &&
        // seq distributes over alt (relational composition over union)
        rows(g, (a | b) / c) == (rows(g, a / c) ++ rows(g, b / c))
    })
  }

  test("inverse: involution and the contravariant reverse law -(a/b) == -b / -a") {
    check("inverse-laws", Prop.forAll(graphGen) { g =>
      val (a, b) = (Pred("a"), Pred("b"))
      rows(g, -(-(a: Path))) == rows(g, a) &&
        rows(g, -(a / b)) == rows(g, -(b: Path) / -(a: Path)) &&
        rows(g, -(a | b)) == rows(g, -(a: Path) | -(b: Path))
    })
  }

  test("closures: + is / -fixpoint, * adds identity, ? is idempotent") {
    check("closure-laws", Prop.forAll(graphGen) { g =>
      val a = Pred("a")
      val plus = rows(g, a.+)
      val one = rows(g, a)
      // a+ == a ∪ (a / a+): one step unrolling of the fixpoint
      val unrolled = one ++ (for {
        (s, m1) <- one; (m2, d) <- plus if m1 == m2
      } yield (s, d))
      plus == unrolled &&
        rows(g, a.*) == plus.union(
          g.flatMap(e => Seq(e._1, e._3)).toSet[Long].map(n => (n, n))) &&
        rows(g, a.?.?) == rows(g, a.?) &&
        // negated set of all predicates matches nothing
        rows(g, Path.not(preds: _*)).isEmpty
    })
  }
}
