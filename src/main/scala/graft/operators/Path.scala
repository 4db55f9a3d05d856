package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composable property-path algebra — the reference's path DSL as a
  * first-class value type (/root/reference/grafter.repository/src/clj/
  * grafter_2/rdf4j/sparql/path.clj:34-112: `(a | b) / c* / !d` built from
  * prefix combinators and evaluated later). A [[Path]] is a pure AST; the
  * single interpreter [[Path.eval]] lowers it onto an edge table
  * `(src, p, dst)` through the join builders of [[GraphOps]], so every
  * composite stays one declarative Catalyst plan (closures excepted —
  * those iterate, SURVEY.md §2.4 J4/J5).
  *
  * Combinators (mirroring the reference grammar):
  *  - `a / b`   sequence (path.clj:84-87)
  *  - `a | b`   alternative (path.clj:89-92)
  *  - `-a`      inverse — the reference's prefix `-` for SPARQL `^`
  *              (path.clj:79-82)
  *  - `a.?`     zero-or-one (path.clj:104-107)
  *  - `a.*`     zero-or-more (path.clj:94-97)
  *  - `a.+`     one-or-more (path.clj:99-102)
  *  - `!Pred`   negated predicate set (path.clj:109-112)
  */
sealed trait Path {
  def /(that: Path): Path = Path.Sequence(this, that)
  def |(that: Path): Path = Path.Alternative(this, that)
  def unary_- : Path = Path.Inverse(this)
  def ? : Path = Path.ZeroOrOne(this)
  def * : Path = Path.ZeroOrMore(this)
  def + : Path = Path.OneOrMore(this)
}

object Path {

  /** Single hop via predicate `p`. */
  final case class Pred(p: String) extends Path {
    /** `!p`: hop via any predicate NOT in this one-element set. */
    def unary_! : Path = Negated(Seq(p))
  }

  /** Hop via any predicate NOT in `ps` (NegatedPropertySet — predicates
    * only, as in SPARQL).
    */
  final case class Negated(ps: Seq[String]) extends Path

  final case class Sequence(a: Path, b: Path) extends Path
  final case class Alternative(a: Path, b: Path) extends Path
  final case class Inverse(a: Path) extends Path
  final case class ZeroOrOne(a: Path) extends Path
  final case class ZeroOrMore(a: Path) extends Path
  final case class OneOrMore(a: Path) extends Path

  /** Hop via any predicate not in `ps` — vararg convenience. */
  def not(ps: String*): Path = Negated(ps)

  /** Evaluate a path against an edge table with columns (src, p, dst);
    * returns the matched (src, dst) pairs. Zero-length path steps (in
    * `?`/`*`) match every node of the graph to itself — SPARQL's
    * zero-length-path semantics over the queried graph's node set.
    */
  def eval(edges: DataFrame, path: Path, maxIters: Int = 20): DataFrame = {
    lazy val nodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst").as("n"))).distinct()
    def identity: DataFrame = nodes.select(col("n").as("src"), col("n").as("dst"))
    def go(p: Path): DataFrame = p match {
      case Pred(pr)         => edges.filter(col("p") === pr).select("src", "dst")
      case Negated(ps)      => GraphOps.negatedPath(edges, "p", ps)
      case Sequence(a, b)   => GraphOps.seqPath(go(a), go(b))
      case Alternative(a, b) => GraphOps.altPath(go(a), go(b))
      case Inverse(a)       => GraphOps.inversePath(go(a))
      case ZeroOrOne(a)     => identity.union(go(a)).distinct()
      case ZeroOrMore(a)    =>
        identity.union(GraphOps.transitiveClosure(go(a), maxIters)).distinct()
      case OneOrMore(a)     => GraphOps.transitiveClosure(go(a), maxIters)
    }
    go(path)
  }
}
