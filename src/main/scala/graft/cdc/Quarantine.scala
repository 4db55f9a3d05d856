package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.lake.LakeTable

/** Bad-record quarantine — the recast of the reference's error enrichment,
  * which attaches the offending quad to every conversion failure instead
  * of dropping or crashing (/root/reference/grafter.io/src/grafter_2/
  * rdf4j/io.clj:185-209, test io_test.clj:238-260). A CDC engine gets the
  * same contract as a side output: rows that cannot be coerced to the
  * table schema (or lack key/lsn) are routed to `<table>/badrecords/`
  * as JSONL with full lineage (epoch, offending columns, original row),
  * and the clean remainder proceeds through the normal upsert. Nothing is
  * silently nulled, nothing crashes the stream.
  */
object Quarantine {

  /** Predicate marking rows that cannot be applied: a non-null payload
    * value whose cast to the table schema fails (try_cast null-out), a
    * null key, or a null lsn. Returns (badRowCondition, perColumnFailures).
    */
  private def checks(table: LakeTable, batch: DataFrame): Seq[(String, Column)] = {
    val schema = table.currentSchema
    val castChecks = schema.fields
      .filter(f => batch.columns.contains(f.name))
      .flatMap { f =>
        val src = batch.schema(f.name).dataType
        if (LakeTable.sameType(src, f.dataType)) None
        else Some(f.name -> (col(f.name).isNotNull &&
          expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})").isNull))
      }
    val structural = Seq(
      table.keyCol -> col(table.keyCol).isNull,
      "lsn" -> (if (batch.columns.contains("lsn")) col("lsn").isNull else lit(true)))
    castChecks ++ structural
  }

  /** Both sides of a split batch, backed by ONE cached evaluation of the
    * source: `clean` and `bad` are filters over the same persisted tagged
    * frame, so a quarantined batch costs one pass over the un-cached
    * source (plus the cache read), not two. Callers MUST [[release]] once
    * both sides are consumed.
    */
  final case class Split(clean: DataFrame, bad: DataFrame, private val tagged: DataFrame) {
    def release(): Unit = { tagged.unpersist(); () }
  }

  /** Split a batch into (clean, bad). The bad side carries `_bad_cols`
    * (the offending column names) — the "enriched error" of the
    * reference, as data instead of an exception. Single-pass: the check
    * columns are evaluated once into a persisted tagged frame
    * (MEMORY_AND_DISK — a micro-batch may exceed executor memory and must
    * spill, never recompute the source twice).
    */
  def split(table: LakeTable, batch: DataFrame): Split = {
    val cs = checks(table, batch)
    val badCols = array_compact(array(cs.map { case (n, c) =>
      when(c, lit(n)).otherwise(lit(null).cast("string"))
    }: _*))
    val tagged = batch.withColumn("_bad_cols", badCols)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Split(
      clean = tagged.filter(size(col("_bad_cols")) === 0).drop("_bad_cols"),
      bad = tagged.filter(size(col("_bad_cols")) > 0),
      tagged = tagged)
  }

  /** Persist quarantined rows under `<table>/badrecords/epoch-N/` as JSON
    * lines: the full offending row plus `_bad_cols` and `_epoch`. A
    * distributed write (no driver collect) — the quarantine can be as big
    * as the batch. Emptiness is detected from the WRITTEN output (one
    * pass, no extra isEmpty job): an all-empty epoch dir is removed so a
    * clean feed accretes nothing. Returns whether anything was quarantined.
    */
  def write(table: LakeTable, bad: DataFrame, epochId: Long): Boolean = {
    val dir = f"${table.root}/badrecords/epoch-$epochId%012d"
    bad.withColumn("_epoch", lit(epochId))
      .write.mode("overwrite").json(dir)
    val fs = table.fs
    val hasData = fs.exists(dir) && fs.list(dir).exists { f =>
      graft.lake.LakeFs.fileName(f).startsWith("part-") && fs.size(f) > 0
    }
    if (!hasData) fs.deleteRecursively(dir)
    hasData
  }

  /** Read back the quarantine as a DataFrame (schema inferred per read —
    * quarantined rows are by definition schema-divergent).
    */
  def read(table: LakeTable): DataFrame = {
    val dir = s"${table.root}/badrecords"
    val epochs = table.fs.list(dir).filter(table.fs.isDirectory).sorted
    require(epochs.nonEmpty, s"no quarantined batches under $dir")
    table.spark.read.json(epochs: _*)
  }
}
