package graft.lake

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

/** CDC-out stream driven by the SNAPSHOT LOG: the streaming offset is the
  * committed snapshot id, and each micro-batch plans exactly the delta
  * files the snapshots in (start, end] added — the streaming twin of
  * [[LakeTable.changesBetween]].
  *
  * Why not a file-glob stream (the previous design): Spark's file source
  * re-lists the whole matching tree every trigger and keeps an in-memory
  * seen-files map — O(all-files-ever) driver work and unbounded state at
  * thousands of snapshots — and it emits data files the moment the staged
  * delta dir is renamed, BEFORE the snapshot JSON commits, so a crash
  * between the two leaked phantom uncommitted rows to downstream
  * consumers. Here visibility follows the COMMIT by construction, planning
  * is O(new snapshots) manifest reads (dense snapshot ids → direct file
  * probes, no directory listing), and replay from any checkpointed offset
  * re-reads exactly the same committed snapshots — deterministic, like the
  * rest of the engine. This is the lazy bounded-memory pull iteration of
  * the reference's read path (/root/reference/grafter.io/src/grafter_2/
  * rdf4j/io.clj:649-678) recast over the table log.
  *
  * Backpressure: `maxSnapshotsPerTrigger` caps how many snapshots one
  * micro-batch consumes, applied through the admission-control contract
  * ([[SupportsAdmissionControl.latestOffset]] receives the engine's start
  * offset, so the cap can never regress a restart offset), and
  * [[SupportsTriggerAvailableNow]] pins the drain ceiling at stream start
  * — the same pair Spark's own file source implements.
  */
class LakeCdcSource(sqlContext: SQLContext, root: String,
    maxSnapshotsPerTrigger: Int, startingSnapshotId: Option[String]) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val table = LakeTable.load(sqlContext.sparkSession, root)

  /** Offset floor for a stream with no checkpoint yet: the batch range is
    * (floor, end]. Resolved once at source creation (= stream start); on a
    * restart the engine supplies the checkpointed offset, which wins.
    * `latest` skips all existing history; `earliest` begins at the oldest
    * SURVIVING snapshot — the escape hatch that lets a NEW consumer start
    * on a table whose early history was expired (a fresh offset of −1
    * would probe snap-0 and throw forever).
    */
  private val startFloor: Long = startingSnapshotId match {
    case None             => -1L
    case Some("latest")   => table.currentSnapshotId
    case Some("earliest") => math.max(-1L, table.oldestSnapshotId - 1L)
    case Some(n)          => n.toLong
  }

  // Trigger.AvailableNow ceiling: snapshots committed after stream start
  // wait for the next run. Option (not a −1 sentinel): an AvailableNow
  // drain started against an EMPTY table pins a ceiling of −1 and emits
  // nothing, instead of racing commits that land mid-drain.
  private var availableCeiling: Option[Long] = None

  // schema version pinned at stream start: a mid-stream evolution must
  // not change this source's output shape (the engine binds attributes
  // once); batches map newer files onto it by field id, and a RESTART
  // picks the evolved schema up
  private val pinnedSchema = table.currentSchema

  override val schema: StructType = LakeCdcSource.schemaFor(table)

  private def longOf(o: OffsetV2): Long = o match {
    case LongOffset(v) => v
    case other         => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def prepareForTriggerAvailableNow(): Unit = {
    table.refresh()
    availableCeiling = Some(table.currentSnapshotId)
  }

  override def reportLatestOffset(): OffsetV2 = {
    val id = table.currentSnapshotId
    if (id < 0) null else LongOffset(id)
  }

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val start = Option(startOffset).map(longOf).getOrElse(startFloor)
    table.refresh() // incremental: parses only snapshots since last look
    val ceiling = availableCeiling
      .fold(table.currentSnapshotId)(math.min(_, table.currentSnapshotId))
    val end = math.max(start, math.min(ceiling, start + maxSnapshotsPerTrigger))
    if (end < 0) null else LongOffset(end)
  }

  /** Legacy un-rate-limited path (engines that ignore admission control). */
  override def getOffset: Option[Offset] = {
    table.refresh()
    val id = table.currentSnapshotId
    if (id < 0) None else Some(LongOffset(id))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val s = start.map(o => longOf(o)).getOrElse(startFloor)
    val e = longOf(end)
    table.refresh()
    val batch = org.apache.spark.sql.graftshim.StreamingFrameShim
      .asStreaming(table.changesBetweenAs(s, e, pinnedSchema))
    // an empty range has no file relation to re-tag — swap in an empty
    // streaming local relation of the same shape
    if (batch.isStreaming) batch
    else org.apache.spark.sql.graftshim.StreamingFrameShim
      .emptyStreaming(sqlContext.sparkSession, batch.schema)
  }

  override def stop(): Unit = ()
}

object LakeCdcSource {
  val RootOption = "tableRoot"
  val MaxSnapshotsOption = "maxSnapshotsPerTrigger"

  /** Where a stream WITHOUT a checkpoint begins: absent = from genesis
    * (snapshot 0), `latest` = only commits after stream start, `earliest`
    * = oldest surviving snapshot (required to start a new consumer on a
    * table whose history prefix was expired), or an explicit snapshot id.
    * Ignored once the stream has a checkpointed offset.
    */
  val StartingSnapshotOption = "startingSnapshotId"

  /** Stream schema: the table's current schema plus the `_lsn` version and
    * `_tomb` delete-flag columns, everything nullable (tombstone rows
    * carry null payloads; the parquet read path forces nullable anyway).
    * Pinned at stream start; files written under older schema versions
    * surface added columns as null and widen legally at read time.
    */
  private[lake] def schemaFor(table: LakeTable): StructType = {
    val hidden = Seq(
      StructField(LakeTable.LsnCol, LongType, nullable = true),
      StructField(LakeTable.TombCol, BooleanType, nullable = true))
    StructType(
      table.currentSchema.sparkSchema.fields.toSeq.map(_.copy(nullable = true)) ++
        hidden)
  }
}

/** Registration shim: `spark.readStream.format(<this class name>)` — the
  * DSv1 StreamSourceProvider route, the same public extension surface
  * Spark's own file stream source uses.
  */
class LakeCdcSourceProvider extends StreamSourceProvider with DataSourceRegister {

  import LakeCdcSource.StartingSnapshotOption

  override def shortName(): String = "graft-lake-cdc"

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse(LakeCdcSource.RootOption,
      throw new IllegalArgumentException(
        s"${LakeCdcSource.RootOption} option is required"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      LakeCdcSource.schemaFor(
        LakeTable.load(sqlContext.sparkSession, root(parameters)))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new LakeCdcSource(sqlContext, root(parameters),
      parameters.get(LakeCdcSource.MaxSnapshotsOption).map(_.toInt).getOrElse(8),
      parameters.get(StartingSnapshotOption))
}
