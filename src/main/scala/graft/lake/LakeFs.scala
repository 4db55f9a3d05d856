package graft.lake

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

/** The filesystem seam for ALL lake metadata and file-layout IO
  * ([[LakeTable]], [[graft.cdc.Quarantine]], the lineage log). Bulk data
  * bytes do NOT go through this trait — parquet reads/writes already run
  * through Spark's Hadoop FileSystem layer, which is object-store-capable
  * on its own (s3a/gs/abfs). What needs a seam is the METADATA plane,
  * whose local implementation leans on POSIX primitives that object
  * stores don't have.
  *
  * Contract per operation, and what an object-store implementation would
  * do instead (S3/GCS semantics per their public docs — conditional
  * writes via `If-None-Match: *` / `x-goog-if-generation-match: 0`):
  *
  *  - [[LakeFs.putStringAtomic]] with `createOnly = true` is the COMMIT
  *    primitive: publish-all-or-nothing AND fail if the name exists, in
  *    one atomic step — two racing writers of `snap-N.json` must serialize
  *    with exactly one winner. Local: write a temp file, then hard-link it
  *    to the final name (`link(2)` fails atomically on an existing
  *    target). Object store: a single conditional PUT — no rename exists,
  *    none is needed.
  *  - `createOnly = false` (checkpoints, hints, table.json): atomic
  *    replace. Local: temp + `ATOMIC_MOVE`+`REPLACE_EXISTING`; object
  *    store: plain PUT (single-key PUTs are atomic).
  *  - [[LakeFs.rename]]: data-file placement (stage → final). Local:
  *    `ATOMIC_MOVE`. Object store: copy + delete — NOT atomic, which is
  *    safe here because visibility is manifest-driven: no reader ever
  *    lists the data tree ([[ManifestFileIndex]] plans from the snapshot
  *    log), so a half-moved file is simply unreferenced garbage until its
  *    snapshot commits via the `createOnly` PUT above.
  *  - [[LakeFs.list]] is used only for `meta/` (bounded by
  *    checkpoint-interval roll-up + [[LakeTable.expireSnapshots]]) and for
  *    staging dirs (bounded by bucket count) — never a full data-tree
  *    listing, so object-store LIST latency/limits are not on any hot
  *    path.
  *
  * Everything takes plain String paths: `java.nio.file.Path` cannot carry
  * an `s3://bucket/key` name, and the lake already composes paths
  * textually (`$root/meta/...`).
  */
trait LakeFs {
  def exists(p: String): Boolean

  def isDirectory(p: String): Boolean

  def readString(p: String): String

  /** Atomically publish `content` at `dst` (see trait doc). Returns false
    * iff `createOnly` and `dst` already exists — the loser of a commit
    * race; every other failure throws.
    */
  def putStringAtomic(dst: String, content: String, createOnly: Boolean): Boolean

  /** Immediate children of `dir` as absolute paths (empty when `dir` does
    * not exist). Metadata/staging dirs only — bounded listings.
    */
  def list(dir: String): Seq[String]

  def size(p: String): Long

  /** Move a data file or staging directory into place; replaces nothing
    * (targets are UUID- or snapshot-unique by construction).
    */
  def rename(src: String, dst: String): Unit

  def createDirectories(dir: String): Unit

  def deleteIfExists(p: String): Boolean

  def deleteRecursively(p: String): Unit
}

object LakeFs {
  def fileName(p: String): String = p.substring(p.lastIndexOf('/') + 1)

  def parent(p: String): String = {
    val i = p.lastIndexOf('/')
    require(i > 0, s"no parent: $p")
    p.substring(0, i)
  }

  /** Scheme → implementation registry (the format-registry pattern of
    * [[graft.sources.Codecs]] applied to storage): deployments register
    * an object-store impl once and every `LakeTable.create/load` — and
    * therefore the CDC streaming source, which loads tables by root
    * string — resolves it from the table path. Schemeless and `file:`
    * roots resolve to [[LocalFs]] (plain `java.nio` paths).
    */
  private val registry = scala.collection.concurrent.TrieMap[String, String => LakeFs]()

  def register(scheme: String, make: String => LakeFs): Unit =
    registry.put(scheme.toLowerCase, make)

  def forRoot(root: String): LakeFs = {
    val i = root.indexOf("://")
    if (i < 0) LocalFs
    else {
      val scheme = root.substring(0, i).toLowerCase
      registry.get(scheme).map(_(root)).getOrElse(throw new IllegalArgumentException(
        s"no LakeFs registered for scheme '$scheme' — LakeFs.register it " +
          "(schemeless local paths need no registration)"))
    }
  }
}

/** Local-filesystem implementation: the POSIX semantics the lake's specs
  * pin (rename atomicity, `link(2)` create-only CAS). This is the sandbox
  * and NFS/ext4 path; an object-store implementation supplies the same
  * contract from conditional PUTs (trait doc).
  */
object LocalFs extends LakeFs {
  private val nonAtomicWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def path(p: String): Path = Paths.get(p)

  override def exists(p: String): Boolean = Files.exists(path(p))

  override def isDirectory(p: String): Boolean = Files.isDirectory(path(p))

  override def readString(p: String): String = Files.readString(path(p))

  override def putStringAtomic(dst: String, content: String,
                               createOnly: Boolean): Boolean = {
    val target = path(dst)
    val tmp = target.resolveSibling(s".tmp-${UUID.randomUUID()}")
    try {
      Files.writeString(tmp, content)
      if (createOnly) {
        // link(2) fails atomically when the target exists — a true CAS,
        // unlike exists-check-then-rename (rename(2) silently replaces)
        try { Files.createLink(target, tmp); true }
        catch {
          case _: FileAlreadyExistsException => false
          case e: UnsupportedOperationException =>
            // no hard links on this mount: exists-check-then-move is NOT a
            // CAS (two racing writers can both "win" a snapshot commit,
            // voiding the optimistic multi-writer serialization), so the
            // degraded mode must be an EXPLICIT opt-in for known
            // single-writer deployments — never a silent downgrade
            if (!sys.props.get("graft.lake.allowNonAtomicCommit").contains("true"))
              throw new UnsupportedOperationException(
                "this filesystem does not support hard links, so the " +
                  "create-only commit CAS cannot be atomic; if (and only " +
                  "if) exactly one writer will ever commit to tables on " +
                  "this mount, opt in with " +
                  "-Dgraft.lake.allowNonAtomicCommit=true", e)
            if (!nonAtomicWarned.getAndSet(true))
              System.err.println("[LakeFs] WARNING: hard links unsupported " +
                "— commits degrade to exists-check-then-move, which is " +
                "single-writer-safe ONLY (opted in via " +
                "graft.lake.allowNonAtomicCommit)")
            if (Files.exists(target)) false
            else { Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE); true }
        }
      } else {
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        true
      }
    } finally Files.deleteIfExists(tmp) // loser/crash paths never litter
  }

  override def list(dir: String): Seq[String] = {
    val d = path(dir)
    if (!Files.exists(d)) return Seq.empty
    val s = Files.list(d)
    try s.iterator().asScala.map(_.toString).toSeq
    finally s.close()
  }

  override def size(p: String): Long = Files.size(path(p))

  override def rename(src: String, dst: String): Unit =
    Files.move(path(src), path(dst), StandardCopyOption.ATOMIC_MOVE)

  override def createDirectories(dir: String): Unit =
    Files.createDirectories(path(dir))

  override def deleteIfExists(p: String): Boolean = Files.deleteIfExists(path(p))

  override def deleteRecursively(p: String): Unit = {
    val root = path(p)
    if (!Files.exists(root)) return
    val s = Files.walk(root)
    try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
