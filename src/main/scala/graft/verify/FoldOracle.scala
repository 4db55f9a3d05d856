package graft.verify

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}

import graft.feed.{EventGen, FeedConfig}
import graft.model.{ChangeEvent, DocRow}

/** In-memory reference fold: the ground truth the distributed replay must
  * match bit-for-bit (FIXTURES.md §6). Applies events in LSN order with
  * exact I/U/D + max-LSN semantics; duplicates are naturally idempotent
  * because (doc_id, lsn) re-application writes the same value.
  *
  * Mirrors the reference's oracle style — golden fixture + behavioural
  * assertion against a live store (/root/reference/grafter.repository/test/
  * grafter_2/rdf4j/repository_test.clj:62-76) — with the store replaced by
  * a Scala Map.
  */
object FoldOracle {

  def finalState(cfg: FeedConfig): Map[String, DocRow] = {
    val m = mutable.HashMap[String, (Long, DocRow)]() // doc_id -> (lsn, row)
    val tomb = mutable.HashMap[String, Long]()        // doc_id -> delete lsn
    var i = 0L
    while (i < cfg.numEvents) {
      apply(m, tomb, EventGen.event(cfg, i))
      i += 1
    }
    materialize(m, tomb)
  }

  def finalState(events: Iterable[ChangeEvent]): Map[String, DocRow] = {
    val m = mutable.HashMap[String, (Long, DocRow)]()
    val tomb = mutable.HashMap[String, Long]()
    events.foreach(e => apply(m, tomb, e))
    materialize(m, tomb)
  }

  private def apply(m: mutable.HashMap[String, (Long, DocRow)],
                    tomb: mutable.HashMap[String, Long], e: ChangeEvent): Unit = {
    e.op match {
      case "D" =>
        if (tomb.getOrElse(e.doc_id, Long.MinValue) < e.lsn) tomb(e.doc_id) = e.lsn
      case _ =>
        val cur = m.get(e.doc_id).map(_._1).getOrElse(Long.MinValue)
        if (e.lsn > cur)
          m(e.doc_id) = (e.lsn, DocRow(e.doc_id, e.tokens, e.n_tok, e.source))
    }
  }

  private def materialize(m: mutable.HashMap[String, (Long, DocRow)],
                          tomb: mutable.HashMap[String, Long]): Map[String, DocRow] =
    m.iterator.collect {
      case (k, (lsn, row)) if tomb.getOrElse(k, Long.MinValue) < lsn => k -> row
    }.toMap

  /** Per-row token-array equality of the merged table vs the oracle (THE
    * correctness invariant, BASELINE.json input_hint). Returns a list
    * of human-readable mismatches, empty = exact match.
    */
  def diff(actual: DataFrame, expected: Map[String, DocRow]): Seq[String] = {
    val errs = mutable.ArrayBuffer[String]()
    val rows = actual.select("doc_id", "tokens", "n_tok", "source").collect()
    if (rows.length != expected.size)
      errs += s"row count ${rows.length} != expected ${expected.size}"
    val seen = mutable.HashSet[String]()
    rows.foreach { r =>
      val id = r.getString(0)
      if (!seen.add(id)) errs += s"duplicate doc_id $id in table"
      expected.get(id) match {
        case None => errs += s"unexpected doc_id $id"
        case Some(exp) =>
          val toks: Seq[Int] = r.getSeq[Int](1)
          if (exp.tokens == null) {
            if (toks != null) errs += s"$id: expected null tokens"
          } else if (toks == null || !toks.sameElements(exp.tokens))
            errs += s"$id: token mismatch"
          val nTok = if (r.isNullAt(2)) -1 else r.getInt(2)
          if (nTok != exp.n_tok) errs += s"$id: n_tok $nTok != ${exp.n_tok}"
          if (r.getString(3) != exp.source) errs += s"$id: source mismatch"
      }
    }
    expected.keys.foreach(k => if (!seen.contains(k)) errs += s"missing doc_id $k")
    errs.toSeq
  }
}
