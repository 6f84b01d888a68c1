package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{CdcMerge, CdcTable}

/** End-to-end CDC lake queries over [[graft.operators.CdcTable]] — the
  * bulk-insert → incremental-upsert → merged-snapshot lifecycle the
  * reference drives with DeltaStreamer (SURVEY K10/S6/ST9).
  */
object CdcQueries {

  private def scratch(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_scratch/$name"

  /** Wipe a gate's scratch root so every run stages a FRESH table (and,
    * for the streaming gates, a fresh checkpoint): a surviving dir would
    * re-seat the timeline (a re-staged bulkInsert's fold point advances
    * past the previous run's deltas) or mark incoming-file offsets as
    * already committed.
    */
  private def freshDir(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val st = java.nio.file.Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach((f: java.nio.file.Path) => java.nio.file.Files.delete(f))
      finally st.close()
    }
  }

  /** q24 — CDC lake upsert lifecycle: the events-derived rewrite-mode
    * changelog (q12's lineage) is split into three deterministic batches;
    * batch 0 bulk-inserts the partitioned base, batches 1 and 2 land as
    * incremental upserts in the log, and the answer is the `_rt`
    * (real-time, base ∪ log) merged snapshot with hard-delete
    * visibility. The storage partition is `event_type`, which CHANGES
    * across a user's events — so the merge must collapse cross-partition
    * key moves (GLOBAL_BLOOM semantics) for the hash to match the
    * oracle's flat window merge over the full changelog.
    */
  def q24CdcLakeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = scratch(s"q24_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    val op = when($"event_type" === "signup", "c")
      .when($"event_type" === "error", "d")
      .otherwise("u")
    val changelog = Tables.events(s, dir).select(
      $"user_id", $"event_id", $"value",
      op.as("__op"),
      when(op === "d", "true").otherwise("false").as("__deleted"),
      unix_millis($"ts").as("__source_ts_ms"),
      $"event_type")
    val table = new CdcTable(s, path,
      keyCols = Seq("user_id"),
      orderingCols = Seq("__source_ts_ms", "event_id"),
      partitionCol = "event_type")
    table.bulkInsert(changelog.filter($"event_id" % 3 === 0))
    table.upsert(changelog.filter($"event_id" % 3 === 1))
    table.upsert(changelog.filter($"event_id" % 3 === 2))
    table.realTime(CdcMerge.Drop)
      .select($"user_id", $"event_id", $"value", $"__op")
      .orderBy($"user_id")
  }

  val q24Oracle: String =
    """SELECT user_id, event_id, value, __op FROM (
      |  SELECT user_id, event_id, value,
      |    CASE WHEN event_type='signup' THEN 'c'
      |         WHEN event_type='error'  THEN 'd' ELSE 'u' END AS __op,
      |    CASE WHEN event_type='error' THEN 'true' ELSE 'false' END AS __deleted,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 AND __deleted = 'false'
      |ORDER BY user_id""".stripMargin

  /** q33 — q24's lifecycle driven through Structured Streaming: the same
    * changelog thirds, but batches 1 and 2 arrive through a FILE STREAM
    * (the topic-dump stand-in: each third is appended to the incoming
    * directory as one file, and `maxFilesPerTrigger=1` makes each file
    * its own micro-batch) and land via the checkpointed
    * `foreachBatch → CdcTable.upsert` sink — the reference's continuous
    * DeltaStreamer model (`deltastreamer_jobs_bulk.sh --continuous`).
    * The answer is the same `_rt` snapshot, and the ORACLE IS q24's:
    * batch and streaming ingestion of the same changelog must converge
    * to the same table (the merge is micro-batch-boundary-invariant by
    * the CdcMerge laws). Fully distributed end to end — the incoming
    * thirds are written executor-side and re-enter through the real
    * FileStreamSource; no row ever passes through the driver. (The
    * per-third `coalesce(1)` only pins one file = one micro-batch for
    * the gate's determinism; production would stream the real topic.)
    */
  def q33CdcStreamUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val path = scratch(s"q33_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    // fresh table AND fresh checkpoint: a stale checkpoint would mark the
    // incoming files' offsets as already committed and skip batches
    freshDir(path)
    val op = when($"event_type" === "signup", "c")
      .when($"event_type" === "error", "d")
      .otherwise("u")
    val changelog = Tables.events(s, dir).select(
      $"user_id", $"event_id", $"value",
      op.as("__op"),
      when(op === "d", "true").otherwise("false").as("__deleted"),
      unix_millis($"ts").as("__source_ts_ms"),
      $"event_type")
    val table = new CdcTable(s, path,
      keyCols = Seq("user_id"),
      orderingCols = Seq("__source_ts_ms", "event_id"),
      partitionCol = "event_type")
    table.bulkInsert(changelog.filter($"event_id" % 3 === 0))
    // the incoming "topic": thirds 1 and 2 appended as one file each
    val incomingDir = s"$path/_incoming"
    changelog.filter($"event_id" % 3 === 1).coalesce(1)
      .write.mode("append").parquet(incomingDir)
    changelog.filter($"event_id" % 3 === 2).coalesce(1)
      .write.mode("append").parquet(incomingDir)
    val stream = s.readStream
      .schema(changelog.schema)
      .option("maxFilesPerTrigger", "1") // one incoming file = one micro-batch
      .parquet(incomingDir)
    val query = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$path/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) => table.upsert(batch) }
      .start()
    query.awaitTermination()
    // the gate's point is per-micro-batch ingestion: fail loudly if the
    // two incoming files ever collapse into one batch
    StreamGateQueries.requireMultiBatch(query, "q33", min = 2)
    table.realTime(CdcMerge.Drop)
      .select($"user_id", $"event_id", $"value", $"__op")
      .orderBy($"user_id")
  }

  /** q86 — the mid-batch crash applied to the TRANSACTIONAL-TABLE SINK:
    * q33's streaming CDC upsert pipeline, with the `foreachBatch` sink's
    * FIRST attempt of micro-batch 1 crashing AFTER `CdcTable.upsert` has
    * atomically published its delta but BEFORE the engine records the
    * batch commit — the DeltaStreamer production crash shape (process
    * dies between the table commit and the checkpoint acknowledgment).
    * This is a different exactly-once mechanism from the batch-keyed
    * parquet sinks the q70/q72/q76/q82/q83 gates crash: those are
    * idempotent by OVERWRITE (replay rewrites the same batch dir); an
    * append-only upsert log cannot overwrite — the restarted engine
    * replays batch 1 and the sink appends a SECOND delta carrying the
    * same row images. Idempotence here is SEMANTIC: the latest-wins
    * merge (CdcMerge, keyed on (user_id) ordered by (__source_ts_ms,
    * event_id)) collapses bit-identical duplicate images to one row, so
    * the `_rt` snapshot converges to the clean-run table — the
    * Hudi/DeltaStreamer crash-recovery argument, oracle-gated.
    *
    * Non-vacuity is REQUIRED three ways: run 1 must terminate
    * exceptionally with the injected message (the crash provably
    * fired), the log must hold THREE deltas afterwards (batch 0's,
    * batch 1's crashed-but-published attempt, and batch 1's replay —
    * the duplicate delta genuinely landed and the merge genuinely
    * collapsed it), and the final snapshot must meet q24's oracle
    * VERBATIM — a replay that skipped the batch would lose images, a
    * merge that failed to collapse duplicates would emit extra rows.
    */
  def q86CdcStreamUpsertCrash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val path = scratch(s"q86_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    freshDir(path)
    val op = when($"event_type" === "signup", "c")
      .when($"event_type" === "error", "d")
      .otherwise("u")
    val changelog = Tables.events(s, dir).select(
      $"user_id", $"event_id", $"value",
      op.as("__op"),
      when(op === "d", "true").otherwise("false").as("__deleted"),
      unix_millis($"ts").as("__source_ts_ms"),
      $"event_type")
    val table = new CdcTable(s, path,
      keyCols = Seq("user_id"),
      orderingCols = Seq("__source_ts_ms", "event_id"),
      partitionCol = "event_type")
    table.bulkInsert(changelog.filter($"event_id" % 3 === 0))
    val incomingDir = s"$path/_incoming"
    changelog.filter($"event_id" % 3 === 1).coalesce(1)
      .write.mode("append").parquet(incomingDir)
    changelog.filter($"event_id" % 3 === 2).coalesce(1)
      .write.mode("append").parquet(incomingDir)
    val failAt = 1L
    val injectedMsg = s"q86 injected mid-batch failure (first attempt of batch $failAt)"
    val failMarker = Paths.get(path, "_fail_injected")
    def runOnce() = s.readStream
      .schema(changelog.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(incomingDir)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$path/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the delta is durably PUBLISHED first: the crash lands between
        // the table commit and the engine's checkpoint acknowledgment
        table.upsert(batch)
        if (batchId == failAt && !Files.exists(failMarker)) {
          Files.createFile(failMarker)
          throw new RuntimeException(injectedMsg)
        }
      }
      .start()
    val run1 = runOnce()
    val err = try { run1.awaitTermination(); None } catch {
      case e: Throwable => Some(e)
    }
    val chain = err.iterator.flatMap(e =>
      Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null).take(10)).toSeq
    require(chain.exists(t => Option(t.getMessage).exists(_.contains(injectedMsg))),
      "q86 run 1 must terminate with the injected mid-batch failure, got: " +
        err.fold("clean termination")(_.toString))
    require(Files.exists(failMarker), "q86 fault injection did not fire")
    val run2 = runOnce()
    run2.awaitTermination()
    StreamGateQueries.requireMultiBatch(run2, "q86 run2", min = 1) // the replayed batch
    // the duplicate delta must have genuinely landed: batch 0's, the
    // crashed attempt's, and the replay's
    val deltas = Paths.get(path, "log").toFile.listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("delta_"))
    require(deltas == 3,
      s"q86 expects 3 published deltas (batch 0 + crashed attempt + replay), got $deltas")
    table.realTime(CdcMerge.Drop)
      .select($"user_id", $"event_id", $"value", $"__op")
      .orderBy($"user_id")
  }

  /** The q24 changelog + table staged fresh under `name` — the shared
    * lifecycle (bulk third 0, upsert thirds 1 and 2 as delta commits 1
    * and 2) the timeline-read gates travel over.
    */
  private def stagedLifecycle(s: SparkSession, dir: String, name: String): CdcTable = {
    import s.implicits._
    val path = scratch(s"${name}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    // fresh table: the gates' absolute instants 1 and 2 must name THESE
    // upserts' commits (see freshDir)
    freshDir(path)
    val op = when($"event_type" === "signup", "c")
      .when($"event_type" === "error", "d")
      .otherwise("u")
    val changelog = Tables.events(s, dir).select(
      $"user_id", $"event_id", $"value",
      op.as("__op"),
      when(op === "d", "true").otherwise("false").as("__deleted"),
      unix_millis($"ts").as("__source_ts_ms"),
      $"event_type")
    val table = new CdcTable(s, path,
      keyCols = Seq("user_id"),
      orderingCols = Seq("__source_ts_ms", "event_id"),
      partitionCol = "event_type")
    table.bulkInsert(changelog.filter($"event_id" % 3 === 0))
    table.upsert(changelog.filter($"event_id" % 3 === 1)) // delta commit 1
    table.upsert(changelog.filter($"event_id" % 3 === 2)) // delta commit 2
    table
  }

  /** q124 — INCREMENTAL PULL (the Hudi incremental query type; ref
    * `deltastreamer_jobs_cont_bkgd.sh` — a continuously-running
    * DeltaStreamer IS an incremental consumer, and chained Hudi
    * pipelines read each other this way): over q24's staged lifecycle
    * (bulk third 0; thirds 1 and 2 as delta commits 1 and 2), two pulls
    * are unioned under a `pull` tag — `(1, 2]` (a consumer checkpointed
    * at commit 1 sees ONLY commit 2's latest images) and `(0, 2]` (a
    * consumer from the timeline origin sees thirds 1 ∪ 2 merged
    * latest-wins, commit-2 images shadowing commit-1 images of the same
    * key). Rewrite mode keeps delete images as `__deleted='true'` rows —
    * the pull propagates deletes, so the oracle applies NO tombstone
    * filter. Each pull reads only its in-range delta commits — O(changes
    * since checkpoint), never O(table): the base is NEVER scanned, which
    * is the whole point of the read mode at 100 TB.
    */
  def q124CdcIncrementalPull(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val table = stagedLifecycle(s, dir, "q124")
    val until = table.latestCommit // 2: the consumer's next checkpoint
    def tagged(tag: String, pull: DataFrame): DataFrame =
      pull.select(lit(tag).as("pull"),
        $"user_id", $"event_id", $"value", $"__op", $"__deleted")
    tagged("pull_1_2", table.incremental(1, until))
      .unionByName(tagged("pull_0_2", table.incremental(0, until)))
      .orderBy($"pull", $"user_id")
  }

  /** The latest change image per key among the changelog thirds selected
    * by `residues` (DuckDB window merge — the flat oracle for a pull or
    * snapshot covering exactly those thirds).
    */
  private def lifecycleOracle(tag: String, residues: String, tombstones: Boolean): String =
    s"""SELECT '$tag' AS pull, user_id, event_id, value, __op, __deleted FROM (
       |  SELECT user_id, event_id, value,
       |    CASE WHEN event_type='signup' THEN 'c'
       |         WHEN event_type='error'  THEN 'd' ELSE 'u' END AS __op,
       |    CASE WHEN event_type='error' THEN 'true' ELSE 'false' END AS __deleted,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
       |  FROM events WHERE event_id % 3 IN ($residues)) t
       |WHERE rn = 1${if (tombstones) "" else " AND __deleted = 'false'"}""".stripMargin

  val q124Oracle: String =
    lifecycleOracle("pull_1_2", "2", tombstones = true) +
      "\nUNION ALL\n" +
      lifecycleOracle("pull_0_2", "1, 2", tombstones = true) +
      "\nORDER BY pull, user_id"

  /** q125 — TIME TRAVEL (the Hudi `as.of.instant` snapshot read): over
    * the same staged lifecycle, the merged table state at instant 1 (the
    * world BEFORE third 2's commit — thirds 0 ∪ 1 merged) and at instant
    * 2 (≡ `realTime`, q24's answer), unioned under an `asof` tag. Drop
    * mode, like q24: a snapshot read hides tombstoned keys. The two
    * snapshots resolve from the SAME live table — no rewind, no copy:
    * the timeline's immutable (base, delta) artifacts make any retained
    * instant reconstructible at read time.
    */
  def q125CdcTimeTravel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val table = stagedLifecycle(s, dir, "q125")
    def tagged(tag: String, snap: DataFrame): DataFrame =
      snap.select(lit(tag).as("pull"),
        $"user_id", $"event_id", $"value", $"__op", $"__deleted")
    tagged("asof_1", table.asOf(1, CdcMerge.Drop))
      .unionByName(tagged("asof_2", table.asOf(2, CdcMerge.Drop)))
      .orderBy($"pull", $"user_id")
  }

  val q125Oracle: String =
    lifecycleOracle("asof_1", "0, 1", tombstones = false) +
      "\nUNION ALL\n" +
      lifecycleOracle("asof_2", "0, 1, 2", tombstones = false) +
      "\nORDER BY pull, user_id"

  /** q126 — the CHAINED INCREMENTAL PIPELINE: a downstream lake table
    * maintained PURELY from the upstream table's timeline reads — seeded
    * with `asOf(0)` (the upstream snapshot at the consumer's start
    * checkpoint) and then advanced one `incremental(ckpt, ckpt+1)` pull
    * per upstream commit, each landed as a downstream upsert. This is
    * the production pattern the read modes exist for (a
    * continuously-running DeltaStreamer is an incremental consumer and
    * multi-hop Hudi lakes chain tables this way — ref
    * `deltastreamer_jobs_cont_bkgd.sh`): each hop moves O(changes) per
    * cycle, never O(table), so a 100 TB upstream costs the downstream
    * only its delta stream.
    *
    * The final pull is then delivered a SECOND time — the at-least-once
    * crash shape (consumer dies between its upsert and its checkpoint
    * write, then replays the pull; q86's crash geometry, here at the
    * pull boundary). Convergence is semantic idempotence: the replayed
    * images are bit-identical, so the latest-wins merge collapses them.
    *
    * The ORACLE IS q24's: a downstream maintained by seeded snapshot +
    * per-commit incremental pulls + a duplicated replay must converge to
    * the upstream's own merged snapshot — the timeline-read analogue of
    * the batch/streaming/crash-replay convergence the q24/q33/q86 trio
    * pins.
    */
  def q126CdcChainedPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val upstream = stagedLifecycle(s, dir, "q126up")
    val dnPath = scratch(s"q126dn_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    freshDir(dnPath)
    val downstream = new CdcTable(s, dnPath,
      keyCols = Seq("user_id"),
      orderingCols = Seq("__source_ts_ms", "event_id"),
      partitionCol = "event_type")
    downstream.bulkInsert(upstream.asOf(0))
    var ckpt = 0L // the consumer's durable position on the upstream timeline
    while (ckpt < upstream.latestCommit) {
      downstream.upsert(upstream.incremental(ckpt, ckpt + 1))
      ckpt += 1
    }
    // at-least-once replay of the final pull (crash before the
    // checkpoint write): the merge must collapse the duplicate images
    downstream.upsert(upstream.incremental(ckpt - 1, ckpt))
    downstream.realTime(CdcMerge.Drop)
      .select($"user_id", $"event_id", $"value", $"__op")
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_cdc_lake_upsert" -> (q24CdcLakeUpsert _),
    "q33_cdc_stream_upsert" -> (q33CdcStreamUpsert _),
    "q86_cdc_stream_upsert_crash" -> (q86CdcStreamUpsertCrash _),
    "q124_cdc_incremental_pull" -> (q124CdcIncrementalPull _),
    "q125_cdc_time_travel" -> (q125CdcTimeTravel _),
    "q126_cdc_chained_pipeline" -> (q126CdcChainedPipeline _))

  val oracles: Map[String, String] = Map(
    "q24_cdc_lake_upsert" -> q24Oracle,
    "q33_cdc_stream_upsert" -> q24Oracle,
    // batch ingestion, streaming ingestion, and CRASHED-AND-REPLAYED
    // streaming ingestion of the same changelog must converge to the
    // same table
    "q86_cdc_stream_upsert_crash" -> q24Oracle,
    "q124_cdc_incremental_pull" -> q124Oracle,
    "q125_cdc_time_travel" -> q125Oracle,
    // a downstream maintained by seeded snapshot + per-commit pulls +
    // a duplicated replay converges to the upstream's merged snapshot
    "q126_cdc_chained_pipeline" -> q24Oracle)
}
