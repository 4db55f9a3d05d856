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

  test("no oracle leaks int128: integer sums are always outer-cast") {
    // DuckDB widens sum(INT/BIGINT) to HUGEINT, which surfaces as
    // decimal128(38,0) at the Arrow layer — Spark emits int64, and the
    // driver's hash compares the RAW Arrow types (the round-5 q85 red
    // row). Pin the pattern: every `sum(CAST(… AS INT/BIGINT))` in an
    // oracle must sit inside an outer `CAST(`. The authoritative sweep is
    // tools/oracle_type_scan.py (runs every oracle and inspects the real
    // Arrow schema); this lint catches the known foot-gun without DuckDB.
    val intSum = raw"sum\s*\(\s*CAST\s*\([^()]*(\([^()]*\)[^()]*)*AS\s+(BIG)?INT\s*\)\s*\)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      intSum.findAllMatchIn(sql).foreach { m =>
        val prefix = sql.substring(0, m.start).replaceAll(raw"\s+$$", "")
        assert(prefix.toUpperCase.endsWith("CAST("),
          s"$name: integer sum without an outer CAST -> DuckDB HUGEINT/" +
            s"int128 at the Arrow layer, hash-only mismatch: ${m.matched}")
      }
    }
  }
}
