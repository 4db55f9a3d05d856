package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The templater: declarative row → graph-statement expansion, including
  * NESTED blank-node subtrees — the reference's `triplify`/`graph`
  * (/root/reference/grafter.io/src/grafter_2/rdf4j/templater.clj:40-97,
  * nested expansion tested at templater_test.clj:11-25). A nested vector
  * in the reference becomes a fresh blank node whose id is gensym'd
  * (protocols.cljc:438-444); gensym is nondeterministic and would break
  * checkpoint replay, so here subtree ids are SKOLEMISED deterministically:
  * `md5(subject ∥ 0x01 ∥ predicate)` (SURVEY.md §1.4). Same row in, same
  * subtree id out — on every replay, in every engine (md5 has an exact
  * DuckDB twin).
  *
  * The expansion is a single `explode(array(struct...))` — a Catalyst
  * Generator inside whole-stage codegen, one pass, no UDFs, no shuffle.
  */
object Templater {

  /** One template property: either a direct value or a nested subtree.
    * The ADT mirrors the reference's template grammar, where a nested
    * vector at ANY depth becomes a fresh blank-node subtree
    * (`make-triples` recurses unboundedly, templater.clj:40-51).
    */
  sealed trait Prop

  /** Direct property of the row's subject. */
  final case class Leaf(predicate: String, value: Column) extends Prop

  /** Blank-node subtree: `subject --predicate--> _:skolem --child--> …`;
    * children may themselves be [[Node]]s — depth is unbounded, and each
    * level's skolem id chains the parent's id (md5 ∘ md5 ∘ …), so distinct
    * positions in the template tree get distinct, replay-stable ids.
    */
  final case class Node(predicate: String, children: Seq[Prop]) extends Prop

  private val Sep = "\u0001"

  /** Deterministic skolem id for the subtree hung off (subject, predicate). */
  def skolem(subject: Column, predicate: String): Column =
    md5(concat_ws(Sep, subject.cast("string"), lit(predicate)))

  /** add-properties (templater.clj:99-105): merge a {predicate → value}
    * map into each subject row — the dynamic column append of the
    * reference's template merge. Existing columns are replaced, new ones
    * appended (Clojure merge semantics).
    */
  def addProperties(df: DataFrame, props: Map[String, Column]): DataFrame =
    props.foldLeft(df) { case (d, (name, value)) => d.withColumn(name, value) }

  /** Recursive template expansion: one struct(subject, predicate, object)
    * per emitted statement, subtrees linked through chained skolem ids
    * (level-k id = md5 of level-(k−1) id ∥ 0x01 ∥ predicate).
    */
  private def expand(subject: Column, props: Seq[Prop]): Seq[Column] =
    props.flatMap {
      case Leaf(p, v) =>
        Seq(struct(subject.cast("string").as("subject"),
          lit(p).as("predicate"), v.cast("string").as("object")))
      case Node(p, children) =>
        val sk = skolem(subject, p)
        struct(subject.cast("string").as("subject"), lit(p).as("predicate"),
          sk.as("object")) +: expand(sk, children)
    }

  /** Expand each row into (subject, predicate, object, source) statements,
    * stamping `graphId` as the context — the in-repo `make-graph`
    * (templater.clj:68-97). `leaves ++ nodes` form the template tree;
    * nodes recurse to any depth.
    */
  def graph(df: DataFrame, subject: Column, graphId: String,
            leaves: Seq[Leaf], nodes: Seq[Node] = Seq.empty): DataFrame = {
    val triples = expand(subject, (leaves: Seq[Prop]) ++ nodes)
    df.select(explode(array(triples: _*)).as("t"))
      .select(col("t.subject").as("subject"), col("t.predicate").as("predicate"),
        col("t.object").as("object"), lit(graphId).as("source"))
  }
}
