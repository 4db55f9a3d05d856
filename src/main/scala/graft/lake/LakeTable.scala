package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Field of a table schema, identified by a stable numeric id so columns can
  * be renamed/added/widened without rewriting data files (Iceberg-style
  * column mapping; see the Iceberg spec, iceberg.apache.org/spec).
  */
final case class LakeField(id: Int, name: String, dataType: DataType, nullable: Boolean) {
  def sparkField: StructField = StructField(name, dataType, nullable)
}

final case class LakeSchema(schemaId: Int, fields: Seq[LakeField]) {
  def sparkSchema: StructType = StructType(fields.map(_.sparkField))
  def byId: Map[Int, LakeField] = fields.map(f => f.id -> f).toMap
}

/** One parquet file tracked by a snapshot. `schemaId` records the schema the
  * file was written with (read-time column mapping resolves it to the
  * current schema by field id).
  */
final case class FileEntry(path: String, bucket: Int, bytes: Long, schemaId: Int)

/** An atomic table version. The log of snapshots IS the table state:
  * live files = fold of added − removed over snapshots 0..N.
  *
  * `epochId` fuses the Structured Streaming checkpoint with the table
  * commit: a batch is applied iff `epochId > lastCommittedEpoch`, which
  * makes foreachBatch re-delivery after a crash idempotent (exactly-once;
  * the CDC recast of grafter's transaction-per-unit semantics,
  * /root/reference/grafter.repository/src/clj/grafter_2/rdf4j/
  * repository.clj:421-453 — a rolled-back transaction here is simply a
  * never-renamed snapshot file).
  */
final case class Snapshot(
    snapshotId: Long,
    parentId: Long,
    epochId: Long,
    addedData: Seq[FileEntry],
    addedDeletes: Seq[FileEntry],
    removedData: Set[String],
    removedDeletes: Set[String],
    summary: Map[String, String])

/** A from-scratch Iceberg-style lake table: parquet data files + parquet
  * equality-delete files + a JSON snapshot log with atomic commits.
  *
  * Layout:
  * {{{
  *   root/meta/schema-<id>.json         field-id'd schemas
  *   root/meta/snap-<%012d id>.json     snapshot log (atomic rename commit)
  *   root/data/snap-<id>/bucket=<b>/part.parquet   rows + hidden _lsn column
  *   root/deletes/snap-<id>/bucket=<b>/part.parquet   (doc_id, _lsn) keys
  * }}}
  *
  * Merge-on-read LWW semantics: every upsert batch writes, per key, an
  * equality-delete `(doc_id, lsn_w)` and (unless the winning op is a
  * delete) a data row carrying `_lsn = lsn_w`. A data row is visible iff no
  * delete exists with the same `doc_id` and strictly greater lsn. Because
  * max-LSN is the global order, the visible set is exactly the
  * last-writer-wins state regardless of batch arrival order — the MERGE
  * condition "WHEN MATCHED AND source.lsn > target.lsn" holds by
  * construction, with no read-modify-write of the target.
  *
  * Scale design: data and deletes are co-bucketed by
  * `pmod(xxhash64(doc_id), numBuckets)`, so the read-side anti-join and
  * compaction are bucket-local — on a real cluster each bucket is an
  * independent unit of work and the delete-application join never needs an
  * all-to-all shuffle wider than a bucket. Commits are O(files) driver-side
  * JSON; compaction bounds both file count and delete debt.
  *
  * Single-writer: commit conflicts (a snapshot file that already exists)
  * throw; a production deployment would CAS through a catalog service.
  */
class LakeTable private (
    val spark: SparkSession,
    val root: String,
    val keyCol: String,
    val numBuckets: Int) {

  import LakeTable._

  private def metaDir: Path = Paths.get(root, "meta")

  // ---- metadata (driver-side, small) ----

  def schemas: Seq[LakeSchema] =
    listFiles(metaDir, "schema-").map(p => readSchema(p)).sortBy(_.schemaId)

  def currentSchema: LakeSchema = schemas.last

  def snapshots: Seq[Snapshot] =
    listFiles(metaDir, "snap-").map(p => readSnapshot(p)).sortBy(_.snapshotId)

  def currentSnapshotId: Long = snapshots.lastOption.map(_.snapshotId).getOrElse(-1L)

  def lastCommittedEpoch: Long = snapshots.lastOption.map(_.epochId).getOrElse(-1L)

  /** Live (data, delete) files as of snapshot `asOf` (latest if None). */
  def liveFiles(asOf: Option[Long] = None): (Seq[FileEntry], Seq[FileEntry]) = {
    val snaps = asOf match {
      case Some(id) => snapshots.takeWhile(_.snapshotId <= id)
      case None     => snapshots
    }
    val data = scala.collection.mutable.LinkedHashMap[String, FileEntry]()
    val dels = scala.collection.mutable.LinkedHashMap[String, FileEntry]()
    snaps.foreach { s =>
      s.addedData.foreach(f => data(f.path) = f)
      s.addedDeletes.foreach(f => dels(f.path) = f)
      s.removedData.foreach(data.remove)
      s.removedDeletes.foreach(dels.remove)
    }
    (data.values.toSeq, dels.values.toSeq)
  }

  // ---- read path ----

  /** Current merged table state (hidden columns dropped). */
  def read(): DataFrame = readAt(None)

  /** Time travel: merged state as of `snapshotId`. */
  def readAt(snapshotId: Long): DataFrame = readAt(Some(snapshotId))

  private def readAt(asOf: Option[Long]): DataFrame =
    readWithLsn(asOf).drop(LsnCol)

  /** Merged state including the `_lsn` version column. */
  def readWithLsn(asOf: Option[Long] = None): DataFrame = {
    val (dataFiles, delFiles) = liveFiles(asOf)
    val schema = asOf match {
      case None => currentSchema
      case Some(_) =>
        val maxSid = (dataFiles.map(_.schemaId) ++ Seq(0)).max
        schemas.find(_.schemaId == maxSid).getOrElse(currentSchema)
    }
    val data = readDataFiles(dataFiles, schema)
    if (delFiles.isEmpty) data
    else {
      val delBytes = delFiles.map(_.bytes).sum
      val delsRaw = spark.read.schema(deleteSchema).parquet(delFiles.map(abs): _*)
        .withColumnRenamed(keyCol, DelKeyCol)
      // Equality-delete application: broadcast when the delete set is small
      // (the common steady state after compaction), else a co-partitioned
      // anti-join on the bucket key.
      val dels = if (delBytes <= BroadcastDeleteBytes) broadcast(delsRaw) else delsRaw
      data.join(
        dels,
        data(keyCol) === dels(DelKeyCol) && dels(LsnCol) > data(LsnCol),
        "left_anti")
    }
  }

  /** Read a heterogeneous-schema set of data files, mapping each file's
    * columns to the current schema by field id (nulls for added columns,
    * `cast` for legal widenings).
    */
  private def readDataFiles(files: Seq[FileEntry], target: LakeSchema): DataFrame = {
    if (files.isEmpty) {
      val s = StructType(target.sparkSchema.fields :+ StructField(LsnCol, LongType, nullable = false))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    }
    val byId = schemas.map(s => s.schemaId -> s).toMap
    files.groupBy(_.schemaId).map { case (sid, group) =>
      val fileSchema = byId(sid)
      val nameById = fileSchema.fields.map(f => f.id -> f.name).toMap
      val readSchema = StructType(
        fileSchema.sparkSchema.fields :+ StructField(LsnCol, LongType, nullable = false))
      val df = spark.read.schema(readSchema).parquet(group.map(abs): _*)
      val cols: Seq[Column] = target.fields.map { tf =>
        nameById.get(tf.id) match {
          case Some(oldName) => col(oldName).cast(tf.dataType).as(tf.name)
          case None          => lit(null).cast(tf.dataType).as(tf.name)
        }
      } :+ col(LsnCol)
      df.select(cols: _*)
    }.reduce(_ unionByName _)
  }

  // ---- write path ----

  /** Apply one deduped, LWW-reduced change batch.
    *
    * `batch` columns: `op` ("I"|"U"|"D"), `lsn`, plus payload columns
    * matched to the current schema by NAME (missing → null, widenable types
    * cast). At most one row per key (enforce upstream via [[graft.cdc.Lww]]).
    *
    * Returns None (and writes nothing) when `epochId` was already
    * committed — the exactly-once re-delivery check.
    */
  def upsert(batch: DataFrame, epochId: Long,
             summary: Map[String, String] = Map.empty): Option[Snapshot] = {
    if (epochId <= lastCommittedEpoch) return None
    val snapId = currentSnapshotId + 1
    val schema = currentSchema

    val withBucket = batch.withColumn(BucketCol, bucketOf(col(keyCol)))
    // every change (incl. deletes) contributes an equality-delete key
    val delDir = s"deletes/snap-$snapId"
    val delDf = withBucket.select(col(keyCol), col("lsn").as(LsnCol), col(BucketCol))
    val delEntries = writeBucketed(delDf, delDir, schema.schemaId)

    // upserts contribute a data row aligned to the current schema
    val dataDir = s"data/snap-$snapId"
    val dataCols: Seq[Column] = schema.fields.map { f =>
      if (batch.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } ++ Seq(col("lsn").as(LsnCol), col(BucketCol))
    val dataDf = withBucket.filter(col("op") =!= "D").select(dataCols: _*)
    val dataEntries = writeBucketed(dataDf, dataDir, schema.schemaId)

    val snap = Snapshot(snapId, snapId - 1, epochId, dataEntries, delEntries,
      Set.empty, Set.empty, summary + ("operation" -> "upsert"))
    commit(snap)
    Some(snap)
  }

  /** Rewrite every bucket to a single merged data file and drop all delete
    * files — bounds read amplification. Bucket-local: no cross-bucket
    * shuffle beyond the per-bucket merge join.
    */
  def compact(summary: Map[String, String] = Map.empty): Snapshot = {
    val (dataFiles, delFiles) = liveFiles()
    val snapId = currentSnapshotId + 1
    val merged = readWithLsn().withColumn(BucketCol, bucketOf(col(keyCol)))
    val entries = writeBucketed(merged, s"data/snap-$snapId", currentSchema.schemaId)
    val snap = Snapshot(snapId, snapId - 1, lastCommittedEpoch, entries, Seq.empty,
      dataFiles.map(_.path).toSet, delFiles.map(_.path).toSet,
      summary + ("operation" -> "compact"))
    commit(snap)
    snap
  }

  /** Evolve the table schema: new columns get fresh field ids; same-name
    * columns keep their id; `int→long` / `float→double` widenings are the
    * legal type changes. Old files keep their bytes and are re-mapped at
    * read time.
    */
  def evolveSchema(newSpark: StructType): LakeSchema = {
    val cur = currentSchema
    val byName = cur.fields.map(f => f.name -> f).toMap
    var nextId = (schemas.flatMap(_.fields.map(_.id)) :+ 0).max + 1
    val fields = newSpark.fields.toSeq.map { sf =>
      byName.get(sf.name) match {
        case Some(old) =>
          require(sameType(old.dataType, sf.dataType) || widenable(old.dataType, sf.dataType),
            s"illegal type change for ${sf.name}: ${old.dataType} -> ${sf.dataType}")
          old.copy(dataType = sf.dataType, nullable = sf.nullable || old.nullable)
        case None =>
          val f = LakeField(nextId, sf.name, sf.dataType, nullable = true)
          nextId += 1
          f
      }
    }
    val evolved = LakeSchema(cur.schemaId + 1, fields)
    writeSchemaFile(metaDir, evolved)
    evolved
  }

  // ---- internals ----

  private def bucketOf(key: Column): Column =
    pmod(xxhash64(key), lit(numBuckets)).cast(IntegerType)

  private def deleteSchema = StructType(Seq(
    StructField(keyCol, StringType, nullable = false),
    StructField(LsnCol, LongType, nullable = false)))

  /** Write `df` (which carries a `_bucket` column) under root/`relDir`,
    * one file per non-empty bucket, and return the tracked entries.
    */
  private def writeBucketed(df: DataFrame, relDir: String, schemaId: Int): Seq[FileEntry] = {
    val out = s"$root/$relDir"
    df.repartition(numBuckets, col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(out)
    // enumerate what we just wrote (driver-side, O(files))
    val written = scala.collection.mutable.ArrayBuffer[FileEntry]()
    val base = Paths.get(out)
    if (Files.exists(base)) {
      Files.list(base).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(s"$BucketCol="))
        .foreach { bdir =>
          val b = bdir.getFileName.toString.stripPrefix(s"$BucketCol=").toInt
          Files.list(bdir).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .foreach { f =>
              val rel = Paths.get(root).relativize(f).toString
              written += FileEntry(rel, b, Files.size(f), schemaId)
            }
        }
    }
    written.toSeq
  }

  private def abs(f: FileEntry): String = s"$root/${f.path}"

  private def commit(s: Snapshot): Unit = {
    val tmp = metaDir.resolve(s"snap-.tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, snapshotJson(s))
    val target = metaDir.resolve(f"snap-${s.snapshotId}%012d.json")
    if (Files.exists(target)) {
      Files.delete(tmp)
      throw new IllegalStateException(
        s"commit conflict: snapshot ${s.snapshotId} already exists (concurrent writer?)")
    }
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }
}

object LakeTable {
  val LsnCol = "_lsn"
  val BucketCol = "_bucket"
  private val DelKeyCol = "_del_key"
  /** Broadcast the delete side of the read join below this many bytes. */
  var BroadcastDeleteBytes: Long = 64L * 1024 * 1024

  private val mapper = new ObjectMapper()

  def widenable(from: DataType, to: DataType): Boolean = (from, to) match {
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (ShortType, IntegerType | LongType) => true
    case _ => false
  }

  /** Structural type equality ignoring nullability flags — schema JSON
    * round-trips through DDL text, which does not carry containsNull.
    */
  def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ea, _), ArrayType(eb, _)) => sameType(ea, eb)
    case (MapType(ka, va, _), MapType(kb, vb, _)) => sameType(ka, kb) && sameType(va, vb)
    case (StructType(fa), StructType(fb)) =>
      fa.length == fb.length && fa.zip(fb).forall { case (x, y) =>
        x.name == y.name && sameType(x.dataType, y.dataType)
      }
    case _ => a == b
  }

  def create(spark: SparkSession, root: String, schema: StructType,
             keyCol: String = "doc_id", numBuckets: Int = 16): LakeTable = {
    val meta = Paths.get(root, "meta")
    require(!Files.exists(meta) || listFiles(meta, "schema-").isEmpty,
      s"table already exists at $root")
    Files.createDirectories(meta)
    val fields = schema.fields.toSeq.zipWithIndex.map { case (sf, i) =>
      LakeField(i + 1, sf.name, sf.dataType, sf.nullable)
    }
    writeSchemaFile(meta, LakeSchema(0, fields))
    new LakeTable(spark, root, keyCol, numBuckets)
  }

  def load(spark: SparkSession, root: String,
           keyCol: String = "doc_id", numBuckets: Int = 16): LakeTable = {
    require(Files.exists(Paths.get(root, "meta")), s"no table at $root")
    new LakeTable(spark, root, keyCol, numBuckets)
  }

  private def listFiles(dir: Path, prefix: String): Seq[Path] = {
    if (!Files.exists(dir)) return Seq.empty
    Files.list(dir).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith(prefix) && n.endsWith(".json")
      }
      .toSeq.sortBy(_.getFileName.toString)
  }

  // ---- JSON codecs (Jackson tree model; hand-rolled = no reflection) ----

  private def writeSchemaFile(meta: Path, s: LakeSchema): Unit = {
    val o = mapper.createObjectNode()
    o.put("schemaId", s.schemaId)
    val arr = o.putArray("fields")
    s.fields.foreach { f =>
      val fo = arr.addObject()
      fo.put("id", f.id); fo.put("name", f.name)
      fo.put("type", f.dataType.sql); fo.put("nullable", f.nullable)
    }
    Files.writeString(meta.resolve(f"schema-${s.schemaId}%04d.json"), o.toPrettyString)
  }

  private def readSchema(p: Path): LakeSchema = {
    val n = mapper.readTree(Files.readString(p))
    val fields = n.get("fields").elements().asScala.map { f =>
      LakeField(f.get("id").asInt(), f.get("name").asText(),
        parseType(f.get("type").asText()), f.get("nullable").asBoolean())
    }.toSeq
    LakeSchema(n.get("schemaId").asInt(), fields)
  }

  private def parseType(sql: String): DataType =
    StructType.fromDDL(s"`c` $sql").fields(0).dataType

  private def snapshotJson(s: Snapshot): String = {
    val o = mapper.createObjectNode()
    o.put("snapshotId", s.snapshotId)
    o.put("parentId", s.parentId)
    o.put("epochId", s.epochId)
    def files(name: String, fs: Seq[FileEntry]): Unit = {
      val arr = o.putArray(name)
      fs.foreach { f =>
        val fo = arr.addObject()
        fo.put("path", f.path); fo.put("bucket", f.bucket)
        fo.put("bytes", f.bytes); fo.put("schemaId", f.schemaId)
      }
    }
    files("addedData", s.addedData)
    files("addedDeletes", s.addedDeletes)
    def strs(name: String, xs: Set[String]): Unit = {
      val arr = o.putArray(name); xs.toSeq.sorted.foreach(arr.add)
    }
    strs("removedData", s.removedData)
    strs("removedDeletes", s.removedDeletes)
    val sum = o.putObject("summary")
    s.summary.toSeq.sortBy(_._1).foreach { case (k, v) => sum.put(k, v) }
    o.toPrettyString
  }

  private def readSnapshot(p: Path): Snapshot = {
    val n = mapper.readTree(Files.readString(p))
    def files(name: String): Seq[FileEntry] =
      n.get(name).elements().asScala.map { f =>
        FileEntry(f.get("path").asText(), f.get("bucket").asInt(),
          f.get("bytes").asLong(), f.get("schemaId").asInt())
      }.toSeq
    def strs(name: String): Set[String] =
      n.get(name).elements().asScala.map(_.asText()).toSet
    val summary = n.get("summary").properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap
    Snapshot(n.get("snapshotId").asLong(), n.get("parentId").asLong(),
      n.get("epochId").asLong(), files("addedData"), files("addedDeletes"),
      strs("removedData"), strs("removedDeletes"), summary)
  }
}
