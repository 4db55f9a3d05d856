package graft

/** Driver-contract smoke: entry() on sf0.001 returns rows; queries and
  * oracleSql keys line up (every oracle has a query).
  */
class EntrySpec extends SparkSpec {
  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys; >90% of queries have oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o.diff(q)}")
    assert(o.size.toDouble / q.size > 0.9,
      s"only ${o.size}/${q.size} queries oracled")
  }
}
