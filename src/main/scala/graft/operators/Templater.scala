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

  /** Direct property of the row's subject. */
  final case class Leaf(predicate: String, value: Column)

  /** Blank-node subtree: `subject --predicate--> _:skolem --child--> v`. */
  final case class Node(predicate: String, children: Seq[Leaf])

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

  /** Expand each row into (subject, predicate, object, source) statements,
    * stamping `graphId` as the context — the in-repo `make-graph`
    * (templater.clj:68-97).
    */
  def graph(df: DataFrame, subject: Column, graphId: String,
            leaves: Seq[Leaf], nodes: Seq[Node] = Seq.empty): DataFrame = {
    val s = subject.cast("string")
    val leafTriples = leaves.map { l =>
      struct(s.as("subject"), lit(l.predicate).as("predicate"),
        l.value.cast("string").as("object"))
    }
    val nodeTriples = nodes.flatMap { n =>
      val sk = skolem(subject, n.predicate)
      struct(s.as("subject"), lit(n.predicate).as("predicate"),
        sk.as("object")) +:
        n.children.map { c =>
          struct(sk.as("subject"), lit(c.predicate).as("predicate"),
            c.value.cast("string").as("object"))
        }
    }
    df.select(explode(array((leafTriples ++ nodeTriples): _*)).as("t"))
      .select(col("t.subject").as("subject"), col("t.predicate").as("predicate"),
        col("t.object").as("object"), lit(graphId).as("source"))
  }
}
