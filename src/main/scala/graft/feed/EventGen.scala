package graft.feed

import java.sql.Timestamp

import graft.model.ChangeEvent

/** Deterministic, splittable change-event generator.
  *
  * `event(cfg, i)` is a pure function of (seed, i) — no wall-clock, no shared
  * RNG state — so the same feed can be materialised distributed
  * (`spark.range(n).map(event)`) and folded sequentially by the in-memory
  * oracle with bit-identical results. This deliberately avoids the
  * reference's nondeterministic gensym'd ids
  * (/root/reference/grafter.core/src/grafter_2/rdf/protocols.cljc:438-444),
  * which would break checkpoint replay.
  *
  * Properties:
  *  - `lsn == i` — globally unique, totally ordered (a WAL position).
  *  - doc_id space of `cfg.numDocs` keys; a `cfg.hotFraction` of events hit
  *    a small hot set of `cfg.numHot` keys (skew fixture, FIXTURES.md §2).
  *  - op mix: ~`cfg.deletePct`% deletes, rest inserts/updates (both upsert
  *    under LWW, mirroring grafter add-statement semantics).
  *  - token arrays: length 1..cfg.maxTokens, values 0..50257, derived from
  *    (seed, doc_id, lsn) via splitmix64.
  */
final case class FeedConfig(
    seed: Long = 42L,
    numEvents: Long = 100000L,
    numDocs: Long = 1000L,
    numHot: Long = 4L,
    hotFraction: Double = 0.0,
    deletePct: Int = 5,
    maxTokens: Int = 64,
    numSources: Int = 3,
    /** events are stamped ts = epoch + lsn seconds, jittered backwards by up
      * to `maxLatenessSec` — the out-of-order fixture. */
    maxLatenessSec: Int = 0)

object EventGen {
  final val VocabSize = 50258

  /** splitmix64 — public-domain mixer (Steele et al., "Fast Splittable
    * Pseudorandom Number Generators", OOPSLA'14). Counter-based: stateless.
    */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def u01(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble

  def docIdAt(cfg: FeedConfig, i: Long): String = {
    val h1 = mix64(cfg.seed ^ mix64(i))
    val hot = cfg.hotFraction > 0 && u01(h1) < cfg.hotFraction
    val h2 = mix64(h1 ^ 0x5851F42D4C957F2DL)
    val k = if (hot) java.lang.Long.remainderUnsigned(h2, cfg.numHot)
            else java.lang.Long.remainderUnsigned(h2, cfg.numDocs)
    f"doc_$k%012d"
  }

  def event(cfg: FeedConfig, i: Long): ChangeEvent = {
    val docId = docIdAt(cfg, i)
    val h3 = mix64(cfg.seed ^ mix64(i ^ 0x2545F4914F6CDD1DL))
    val isDelete = java.lang.Long.remainderUnsigned(h3, 100L) < cfg.deletePct
    val op = if (isDelete) "D" else if ((h3 & 1L) == 0L) "I" else "U"
    val source = s"src_${java.lang.Long.remainderUnsigned(mix64(h3), cfg.numSources.toLong)}"
    val lateness =
      if (cfg.maxLatenessSec <= 0) 0L
      else java.lang.Long.remainderUnsigned(mix64(h3 ^ 0x9E3779B97F4A7C15L), cfg.maxLatenessSec.toLong + 1L)
    val ts = new Timestamp((i - lateness).max(0L) * 1000L)
    if (isDelete) ChangeEvent(op, docId, i, ts, null, null, source)
    else {
      val toks = tokensFor(cfg.seed, docId, i, cfg.maxTokens)
      ChangeEvent(op, docId, i, ts, toks, toks.length, source)
    }
  }

  def tokensFor(seed: Long, docId: String, lsn: Long, maxTokens: Int): Array[Int] = {
    val base = mix64(seed ^ docId.hashCode.toLong ^ mix64(lsn))
    val len = (java.lang.Long.remainderUnsigned(base, maxTokens.toLong) + 1L).toInt
    val out = new Array[Int](len)
    var j = 0
    while (j < len) {
      out(j) = java.lang.Long.remainderUnsigned(mix64(base + j + 1), VocabSize.toLong).toInt
      j += 1
    }
    out
  }
}
