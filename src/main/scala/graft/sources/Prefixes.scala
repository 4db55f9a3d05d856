package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CURIE prefix expansion/compaction over statement columns — the
  * data-plane recast of the reference's prefix handling (PREFIX header
  * block built from a prefix map, /root/reference/grafter.repository/src/
  * clj/grafter_2/rdf4j/repository.clj:670-673; prefix maps written as
  * file headers, io.clj:500-582). The reference splices prefixes into
  * SPARQL text; a lake engine's statements are columns, so the operation
  * becomes a pure Column rewrite: `foo:bar ⇄ <http://…/bar>`.
  *
  * Both directions are chained `when` expressions over the ORIGINAL
  * value — one codegen'd pass, no UDFs. Values matching no mapping pass
  * through unchanged (the reference's unknown-datatype passthrough
  * philosophy, io.clj:176-181). `expand ∘ compact = id` on mapped values
  * is spec-pinned; compaction matches the LONGEST namespace first so
  * nested namespaces (e.g. `/doc/` inside `/`) compact deterministically.
  */
object Prefixes {

  /** `prefix:local` → `<namespace>local` for every mapping; first match
    * wins (prefix names are unique keys, so order only needs to be
    * deterministic: sorted by prefix).
    */
  def expand(c: Column, prefixes: Map[String, String]): Column =
    prefixes.toSeq.sortBy(_._1).foldRight(c) { case ((p, ns), els) =>
      when(c.startsWith(s"$p:"),
        concat(lit(ns), c.substr(lit(p.length + 2), length(c))))
        .otherwise(els)
    }

  /** `<namespace>local` → `prefix:local`, longest namespace first. */
  def compact(c: Column, prefixes: Map[String, String]): Column =
    prefixes.toSeq.sortBy { case (p, ns) => (-ns.length, p) }
      .foldRight(c) { case ((p, ns), els) =>
        when(c.startsWith(ns),
          concat(lit(s"$p:"), c.substr(lit(ns.length + 1), length(c))))
          .otherwise(els)
      }
}
