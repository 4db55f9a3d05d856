package graft.operators

import org.apache.spark.sql.DataFrame

/** Forward-chaining inference as a materialised view — the reference's
  * custom-rule repositories run a SPARQL rule at load time and add the
  * derived statements back to the store until nothing new derives
  * (/root/reference/grafter.repository/src/clj/grafter_2/rdf4j/
  * repository.clj:303-335; RDFS example tested at
  * repository_test.clj:193-215). Here the rule is any DataFrame → DataFrame
  * query: derive, union, repeat to fixpoint — compute once, query many.
  */
object Inference {

  /** Materialise `base` ∪ everything `rule` can derive, to fixpoint.
    * `rule` receives the CURRENT statement set (base + derived so far) and
    * returns candidate statements (may overlap; dedup happens here).
    * Checkpointing truncates lineage per round like
    * [[GraphOps.transitiveClosure]]; throws rather than returning a
    * truncated materialisation at the iteration cap.
    */
  def materialize(base: DataFrame, rule: DataFrame => DataFrame,
                  maxIters: Int = 20,
                  reliableCheckpoint: Boolean = false): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint() else df.localCheckpoint()
    var all = cp(base.distinct())
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      // distinct BEFORE the subtraction: exceptAll subtracts multiplicities,
      // so a statement the rule re-derives via two premises in one round
      // (x memberOf g1,g2, both subsetOf h) would survive `exceptAll(all)`
      // with multiplicity 1 and re-enter `all` as a duplicate — and on
      // cyclic rule graphs the surviving multiplicities grow every round,
      // so the fixpoint is never detected. Deduping the candidates first
      // keeps `all` duplicate-free by induction.
      val derived = cp(rule(all).distinct().exceptAll(all))
      if (derived.isEmpty) done = true
      else all = cp(all.union(derived))
      i += 1
    }
    if (!done) throw new IllegalStateException(
      s"inference did not reach a fixpoint within $maxIters iterations — " +
        "raise maxIters; refusing to return a partial materialisation")
    all
  }

  /** Semi-naive materialisation: `rule(all, delta)` receives BOTH the full
    * statement set and the statements new since the last round, and
    * should derive candidates whose premises touch the delta — each
    * round's join work is then proportional to the NEW facts, not the
    * accumulated set (the same frontier discipline as
    * [[GraphOps.transitiveClosure]]). Sound whenever the rule is monotone
    * and every derivation uses ≥1 delta premise (true of Datalog-style
    * rules like RDFS type/subclass propagation); equality with the naive
    * [[materialize]] is spec-pinned. At a 10^9-statement materialised
    * view, re-joining the full set every round is the difference between
    * O(rounds × all) and O(total derivations).
    */
  def materializeIncremental(base: DataFrame,
                             rule: (DataFrame, DataFrame) => DataFrame,
                             maxIters: Int = 20,
                             reliableCheckpoint: Boolean = false): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint() else df.localCheckpoint()
    var all = cp(base.distinct())
    var delta = all
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      val derived = cp(rule(all, delta).distinct().exceptAll(all))
      if (derived.isEmpty) done = true
      else {
        all = cp(all.union(derived))
        delta = derived
      }
      i += 1
    }
    if (!done) throw new IllegalStateException(
      s"inference did not reach a fixpoint within $maxIters iterations — " +
        "raise maxIters; refusing to return a partial materialisation")
    all
  }
}
