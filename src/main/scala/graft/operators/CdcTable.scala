package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A Hudi-MoR-style upsertable lake table (SURVEY K10/S6/ST9; ref
  * `hudi/debezium_hudi_demo/`): a compacted, hive-partitioned parquet
  * **base** plus an append-only parquet **log** of pending change images.
  *
  *  - [[upsert]] appends a change batch to the log — the cheap write path,
  *    Hudi's delta commit; it is the `foreachBatch` body for a streaming
  *    CDC sink (wired in CdcLakeSpec).
  *  - [[readOptimized]] (`_ro`) reads the base only: stale until the next
  *    compaction, exactly the Hudi read-optimized contract.
  *  - [[realTime]] (`_rt`) merges base ∪ log at read with the W3
  *    last-write-wins window — the Hudi real-time contract.
  *  - [[compact]] folds the log into a rewritten base and clears it.
  *
  * Storage keeps Debezium *rewrite-mode* images: tombstones stay as rows
  * flagged `__deleted='true'` (the reference demos query them:
  * `moma_debezium_hudi_demo.ipynb` cells 17-20); readers choose
  * [[CdcMerge.Drop]] when they want hard-delete visibility.
  *
  * Scale notes: the merge shuffles once, globally, on the record key —
  * GLOBAL_BLOOM semantics (`deltastreamer_artists_file_based_schema
  * .properties:25-31`), so a change that moves a row across storage
  * partitions (`update.partition.path`) collapses to the single latest
  * image with no special casing. At 100 TB the base would be bucketed by
  * the key so compaction rewrites only touched buckets; the log stays
  * small relative to base between compactions, which is what keeps `_rt`
  * reads cheap.
  */
class CdcTable(
    spark: SparkSession,
    root: String,
    keyCols: Seq[String],
    orderingCols: Seq[String],
    partitionCol: String) {

  private val baseDir = s"$root/base"
  private val logDir = s"$root/log"

  private def merge(df: DataFrame, mode: CdcMerge.DeleteMode): DataFrame =
    CdcMerge.mergeByKey(keyCols, orderingCols, deleteMode = mode)(df)

  private def hasLog: Boolean = {
    val p = Paths.get(logDir)
    Files.exists(p) && {
      val st = Files.list(p)
      try st.anyMatch(f => f.toString.endsWith(".parquet"))
      finally st.close() // Files.list holds a directory fd until closed
    }
  }

  /** Initial bulk load (ref `deltastreamer_jobs_bulk.sh` `--op BULK_INSERT`
    * `--filter-dupes`): pre-merged so the base starts clean. Resets the
    * table: any pending log from a previous incarnation is discarded.
    */
  def bulkInsert(changelog: DataFrame): Unit = {
    deleteRecursively(Paths.get(logDir))
    merge(changelog, CdcMerge.Rewrite).write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(baseDir)
  }

  /** Append a change batch to the log (delta commit / `--op UPSERT
    * --continuous` per-trigger write). O(batch) I/O, no base rewrite.
    *
    * Additive schema evolution (the Hudi DeltaStreamer contract this
    * table models: schema-provider indirection lets successive runs carry
    * evolved schemas — ref `hudi/debezium_hudi_demo/deltastreamer_artists_
    * file_based_schema.properties:21-24`): a batch may carry MORE columns
    * than the base (new columns null-back-fill old rows at read) or FEWER
    * (a dropped column reads as null for the batch's images). Only the
    * merge-critical columns are mandatory — key, ordering, and partition
    * columns must be present in every change image.
    */
  def upsert(batch: DataFrame): Unit = {
    val required = (keyCols ++ orderingCols :+ partitionCol).distinct
    val missing = required.filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"change batch is missing merge-critical column(s) ${missing.mkString(",")}")
    batch.write.mode(SaveMode.Append).parquet(logDir)
  }

  /** `_ro` view: the compacted base only — fast, possibly stale. */
  def readOptimized: DataFrame = spark.read.parquet(baseDir)

  /** `_rt` view: base ∪ pending log merged at read, latest image per key.
    *
    * Schema = base ∪ log columns: the log is read with `mergeSchema` (log
    * batches may themselves have evolved between commits) and unioned by
    * NAME with null back-fill on both sides, so a column added by a later
    * change batch surfaces immediately with nulls on not-yet-touched rows
    * — the same read-side union Hudi's real-time view performs. The
    * column ORDER is the base's, with evolved columns appended.
    */
  def realTime(mode: CdcMerge.DeleteMode = CdcMerge.Rewrite): DataFrame = {
    val base = readOptimized
    val all =
      if (hasLog)
        base.unionByName(
          spark.read.option("mergeSchema", "true").parquet(logDir),
          allowMissingColumns = true)
      else base
    merge(all, mode)
  }

  /** Fold the log into the base (Hudi compaction): after this,
    * `_ro == _rt`. Writes to a scratch dir first, then swaps via rename —
    * the old base is moved aside BEFORE the new one moves in and deleted
    * only after, so a crash at any point leaves either the old table
    * (+ log) or the new one readable, never a missing base.
    */
  def compact(): Unit = {
    if (!hasLog) return
    val tmp = s"$root/base_compacting"
    val old = s"$root/base_old"
    realTime(CdcMerge.Rewrite).write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(tmp)
    deleteRecursively(Paths.get(old)) // leftover from a prior crash
    Files.move(Paths.get(baseDir), Paths.get(old))
    Files.move(Paths.get(tmp), Paths.get(baseDir))
    deleteRecursively(Paths.get(old))
    deleteRecursively(Paths.get(logDir))
  }

  /** Register the Hudi-style `<name>_ro` / `<name>_rt` temp view pair
    * (ref `demonstration_notes.md` "Preview Hive Database").
    */
  def registerViews(name: String): Unit = {
    readOptimized.createOrReplaceTempView(s"${name}_ro")
    realTime().createOrReplaceTempView(s"${name}_rt")
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally st.close()
    }
}
