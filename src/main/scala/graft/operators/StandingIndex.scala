package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned, SEGMENTED standing-index lake — the maintenance story for
  * the per-ingest admission family (q73/q75/q80): after a batch is
  * admitted, its index keys must FOLD INTO the standing index before the
  * next batch probes it, the analog of the reference's continuous
  * DeltaStreamer upsert loop (ref
  * `hudi/debezium_hudi_demo/demonstration_notes.md` "Run Hudi
  * DeltaStreamer Continuously", `deltastreamer_jobs_cont_bkgd.sh` — each
  * cycle upserts the new arrivals into the standing Hudi table that the
  * next cycle reads).
  *
  * Layout = LSM-style segments, NOT rewrite-on-fold: each fold writes the
  * delta as a NEW bucketed catalog table (bucketed by the probe key —
  * [[BucketedLake]]'s one-file-per-bucket discipline) and publishes it
  * with an atomic pointer-file rename ([[CdcTable]]'s `_meta`
  * linearization discipline: a reader resolves the pointer once and from
  * then on holds immutable segment tables). Rewriting the whole index per
  * ingest would be O(corpus) per batch — at 100 TB that's the wrong cost
  * class; appending a segment is O(batch).
  *
  * Each pointer entry carries three fields per segment:
  *
  *   - `table` — the physical catalog table (keyed folds use
  *     `<name>_seg<id>`, compaction generations `<name>_cmp<g>`, so a
  *     merged segment can never collide with a FUTURE keyed fold's id);
  *   - `cover` — the maximum fold id the segment SUBSUMES. A keyed fold
  *     at id `i` covers `i`; a compaction's merged segment covers the max
  *     cover of everything it merged. [[segmentsUpTo]] selects by cover,
  *     not by physical id, which is what lets compaction run BETWEEN
  *     micro-batches of a continuous keyed-fold ingest (q94): after a
  *     compact of segments covering 0..b+1, batch b+1's
  *     `segmentsUpTo(b+1)` probe still resolves the merged segment —
  *     Hudi's async compaction under DeltaStreamer `--continuous`, where
  *     an in-flight reader's view is decided by commit coverage, never
  *     by file names;
  *   - `maxEventMs` — the largest event time folded into the segment
  *     (`Long.MaxValue` when the caller tracks none). [[expire]] retires
  *     segments wholly beyond a dedup horizon, bounding index lifetime on
  *     an infinite stream the same way q61's horizon sizing rule bounds
  *     the streaming dedup operator's state: entries older than
  *     `watermark − horizon` can no longer block anything, so the
  *     segments holding only them are dead weight.
  *
  * Probing a segmented index is sound because candidate generation
  * DISTRIBUTES over segments: an equi-join of the probe frame against
  * `seg_0 ∪ … ∪ seg_N` equals the union of the per-segment joins, and
  * each per-segment join is zero-exchange on the index side (every
  * segment is bucketed by the join key — plan-verified in BucketingSpec).
  * The union is of CANDIDATES (probe-bounded, tiny), never of the index
  * itself, so no fold ever re-shuffles standing data. Segment count is
  * bounded by [[compact]] — the merge of all live segments into one
  * (Hudi's compaction), after which probes touch one table again.
  *
  * Superseded and expired segments get ONE CYCLE OF GRACE (CdcTable's
  * retain-one cleaner discipline): [[compact]]/[[expire]] move them to a
  * RETIRED list in the pointer instead of dropping them, and the next
  * mutating call ([[fold]]/[[foldAt]]/[[compact]]/[[expire]]) reclaims
  * the retired generation. A cross-JVM reader that resolved the
  * pre-compact pointer therefore still completes its scan — its tables
  * outlive the pointer swap by a full maintenance cycle.
  *
  * Single-writer, like CdcTable: folds are not concurrent, and a
  * violation is LOUD — segments publish via a staging table + catalog
  * rename, and a publish onto a table the POINTER references throws a
  * named collision rather than silently overwriting a concurrent
  * writer's delta (see [[publishSegment]]). A registered table the
  * pointer does NOT reference is reclaimed ONLY when it is provably
  * this INSTANCE's own crashed publish — each instance ledgers the
  * segment names it has attempted, so a crashed `fold()` does not
  * poison the instance while a racing writer's just-published delta
  * (registered, not yet pointer-committed, absent from OUR ledger)
  * still collides by name instead of being silently dropped. Scoped to
  * one SparkSession's catalog + warehouse (segments are catalog tables);
  * the pointer file lives under the warehouse dir so index state and
  * data share a root.
  */
class StandingIndex(
    spark: SparkSession,
    name: String,
    buckets: Int,
    keys: Seq[String]) {

  require(!name.contains('.') && name.nonEmpty,
    s"StandingIndex takes an unqualified catalog-safe name, got '$name'")
  require(keys.nonEmpty, "StandingIndex needs at least one bucket key")

  /** One pointer entry — see class doc for the three fields. */
  private case class Seg(table: String, cover: Long, maxEventMs: Long)

  // pointer IO goes through Hadoop FS, not java.nio: index state and
  // segment data must share a root on ANY warehouse scheme (file:,
  // hdfs:, s3a: with an atomic-rename layer), and Hadoop's
  // FileContext.rename(OVERWRITE) is the atomic pointer swap there —
  // the same discipline BucketedLake uses for its location cleanup
  private val warehouse = spark.conf.get("spark.sql.warehouse.dir")
  private val warehousePath = new org.apache.hadoop.fs.Path(warehouse)
  private val fs = warehousePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val ptrPath = new org.apache.hadoop.fs.Path(warehousePath, s"_${name}_segments")

  private def segTable(i: Long): String = s"${name}_seg$i"
  private def cmpTable(g: Long): String = s"${name}_cmp$g"

  /** (live segments, retired tables pending reclaim); both empty =
    * index not initialized. Pointer format: line 1 = live entries
    * `table|cover|maxEventMs` comma-separated; line 2 (optional) =
    * retired tables comma-separated. A pre-coverage pointer (bare
    * numeric ids) parses as `cover = id`, `maxEventMs = ∞` — the exact
    * semantics those segments were written under.
    */
  private def state: (Seq[Seg], Seq[String]) =
    if (fs.exists(ptrPath)) {
      val in = fs.open(ptrPath)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val lines = s.split("\n", -1)
      val live = lines(0).trim.split(",").filter(_.nonEmpty).toSeq.map { tok =>
        tok.split('|') match {
          case Array(t, c, m) => Seg(t, c.toLong, m.toLong)
          case Array(id)      => Seg(segTable(id.toLong), id.toLong, Long.MaxValue)
          case _ => throw new IllegalStateException(
            s"StandingIndex '$name' pointer entry unparseable: '$tok'")
        }
      }
      val retired =
        if (lines.length > 1) lines(1).trim.split(",").filter(_.nonEmpty).toSeq
        else Seq.empty
      (live, retired)
    } else (Seq.empty, Seq.empty)

  /** Atomic pointer commit — the fold/compact linearization point. */
  private def commit(live: Seq[Seg], retired: Seq[String]): Unit = {
    fs.mkdirs(warehousePath)
    val tmp = new org.apache.hadoop.fs.Path(warehousePath, s"_${name}_segments.tmp")
    val body = live.map(s => s"${s.table}|${s.cover}|${s.maxEventMs}")
      .mkString(",") + "\n" + retired.mkString(",")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(warehousePath.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, ptrPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def writeSegment(df: DataFrame, table: String): Unit =
    BucketedLake.writeBucketed(df, table, buckets, keys.head, keys.tail: _*)

  /** Drop a segment's catalog entry AND its warehouse location — the
    * in-memory catalog forgets tables when the session ends while the
    * directory persists, so a later JVM must clean both or orphaned
    * locations accumulate and block renames (writeBucketed's own
    * orphan-location rationale).
    */
  private def dropSegment(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      warehouse, table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Segment names THIS instance has attempted to publish — the ledger
    * that makes "provably our own crashed publish" literally provable: a
    * registered-but-unreferenced destination is reclaimable iff WE
    * previously attempted it (our rename happened, our pointer commit
    * did not). Without the ledger, ANY registered-unreferenced table
    * would be classified as a crash leftover — including a racing
    * writer's freshly-renamed, not-yet-committed delta, which a reclaim
    * would silently destroy (the silent-overwrite outcome the loud
    * collision contract exists to prevent).
    */
  private val attempted = scala.collection.mutable.Set.empty[String]

  /** Reclaim the RETIRED generation — the deferred half of
    * [[compact]]/[[expire]]'s retain-one grace, run at the head of every
    * mutating call: tables a pre-swap reader may still be scanning get
    * exactly one maintenance cycle before their bytes go away. Returns
    * the live entries it read, so callers don't re-read the pointer.
    */
  private def reclaimRetired(): Seq[Seg] = {
    val (live, retired) = state
    if (retired.nonEmpty) {
      retired.foreach(dropSegment)
      commit(live, Seq.empty)
    }
    live
  }

  /** Publish a new segment through a STAGING table + catalog rename —
    * CdcTable's commitDelta discipline ported to catalog tables: the
    * rename is the segment's linearization point. Publishing onto a
    * table the POINTER references (live or retired) throws — that table
    * is committed state, so a same-name publish can only be a
    * single-writer violation and must surface loudly, never as a silent
    * overwrite. A catalog-REGISTERED table the pointer does not
    * reference is reclaimed in place ONLY when the [[attempted]] ledger
    * proves it is this instance's own crashed publish (renamed, died
    * before the pointer commit); the contested path re-reads the
    * pointer first so a racing writer's commit that landed after our
    * caller's read still collides loudly. A catalog-unregistered
    * leftover at the segment's LOCATION is a dead JVM's orphan (the
    * catalog is in-memory) and is reclaimed — CdcTable's orphan-vs-live
    * staging distinction. Synchronized: two threads racing through one
    * instance serialize here instead of interleaving drop/rename.
    */
  private def publishSegment(
      df: DataFrame, table: String, referenced: Set[String]): Unit = this.synchronized {
    def collision(cause: Throwable) = new IllegalStateException(
      s"StandingIndex '$name' publish collision on '$table': folds are " +
        "single-writer (see class doc); this delta was NOT published", cause)
    if (spark.catalog.tableExists(table)) {
      if (referenced.contains(table)) throw collision(null)
      // registered but unreferenced per the caller's read: re-read the
      // pointer (the caller's snapshot may predate a racing commit),
      // then reclaim only our own provable crash leftover
      val (liveNow, retiredNow) = state
      if ((liveNow.map(_.table) ++ retiredNow).contains(table) ||
          !attempted.contains(table))
        throw collision(null)
    }
    attempted += table
    // reclaims our own crashed publish's registered table or a dead
    // JVM's orphaned location (no-op otherwise) — see scaladoc
    dropSegment(table)
    val stg = s"${table}_stg"
    BucketedLake.writeBucketed(df, stg, buckets, keys.head, keys.tail: _*)
    try spark.sql(s"ALTER TABLE `$stg` RENAME TO `$table`")
    catch { case e: Throwable =>
      spark.sql(s"DROP TABLE IF EXISTS `$stg`")
      throw collision(e)
    }
    spark.catalog.refreshTable(table) // no stale relation under the new name
  }

  /** Initial index build (the corpus-ingest bulk load). Resets the
    * index: prior segments — live, retired, and this session's crashed
    * leftovers alike — are superseded and dropped.
    */
  def init(df: DataFrame, maxEventMs: Long = Long.MaxValue): Unit = {
    val (prevLive, prevRetired) = state
    writeSegment(df, segTable(0L))
    commit(Seq(Seg(segTable(0L), 0L, maxEventMs)), Seq.empty)
    (prevLive.map(_.table) ++ prevRetired).distinct
      .filter(_ != segTable(0L)).foreach(dropSegment)
  }

  /** Fold an admitted batch's index keys into the standing index: write
    * the delta as a new bucketed segment covering `max cover + 1`, then
    * atomically publish it. O(batch), never O(corpus) — standing
    * segments are untouched. `maxEventMs` feeds [[expire]]'s horizon
    * retirement; leave defaulted for an index with no event-time bound.
    */
  def fold(delta: DataFrame, maxEventMs: Long = Long.MaxValue): Unit = {
    val live = reclaimRetired()
    require(live.nonEmpty, s"StandingIndex '$name' must be init()-ed before fold()")
    val next = live.map(_.cover).max + 1
    publishSegment(delta, segTable(next), live.map(_.table).toSet)
    commit(live :+ Seg(segTable(next), next, maxEventMs), Seq.empty)
  }

  /** Replay-idempotent KEYED fold for streaming ingest: publish the
    * delta AT the caller-supplied segment id (e.g. `microBatchId + 1`),
    * OVERWRITING any previous publish at that id — the batch-keyed
    * idempotent-sink discipline lifted to the index: a replayed
    * micro-batch deterministically rewrites its own crashed fold
    * instead of colliding with it (contrast [[fold]]'s seq-allocated
    * collision-LOUD publish, which is right for a single-writer batch
    * pipeline where a same-id publish can only be a racing writer).
    * Callers own the id space above 0 (0 is init's corpus segment).
    * Folding at an id a compaction already subsumed is refused loudly:
    * the merged segment already carries that id's keys, so the refold
    * would double-count — compaction must only subsume COMMITTED batches
    * (see [[compact]]).
    */
  def foldAt(delta: DataFrame, id: Long, maxEventMs: Long = Long.MaxValue): Unit = {
    val live = reclaimRetired()
    require(live.nonEmpty, s"StandingIndex '$name' must be init()-ed before foldAt()")
    require(id > 0L, s"segment id 0 is init's corpus segment, got $id")
    val compactedCover = live.filter(_.table.startsWith(s"${name}_cmp"))
      .map(_.cover).maxOption.getOrElse(-1L)
    require(id > compactedCover,
      s"StandingIndex '$name' foldAt($id): a compaction generation already " +
        s"covers fold ids <= $compactedCover — refolding one would " +
        "double-count its keys (compact only after its batches commit)")
    writeSegment(delta, segTable(id)) // idempotent overwrite — replay-safe
    if (!live.exists(_.table == segTable(id)))
      commit((live :+ Seg(segTable(id), id, maxEventMs)).sortBy(_.cover), Seq.empty)
  }

  /** The live segments, pointer resolved once — probe each with a
    * bucket-colocated join and union the RESULTS (see class doc).
    */
  def segments: Seq[DataFrame] = {
    val (live, _) = state
    require(live.nonEmpty, s"StandingIndex '$name' must be init()-ed before reads")
    live.map(s => spark.table(s.table))
  }

  /** The live segments COVERING fold ids ≤ `maxId` — the keyed-fold
    * reader's probe set. Selection is by COVERAGE, not physical id, so
    * a compaction between micro-batches stays invisible to in-flight
    * probes (class doc; q94's gate). Resolves ONLY the tables it
    * returns: a replayed batch must not even resolve its own crashed
    * fold's segment, or the catalog caches that doomed incarnation's
    * file listing in the window before the idempotent rewrite and a
    * later batch's probe reads dead files. An empty selection is
    * refused LOUDLY: it can only mean a compaction subsumed ids beyond
    * `maxId` while that batch was in flight — silently probing zero
    * segments would admit every doc unprobed.
    */
  def segmentsUpTo(maxId: Long): Seq[DataFrame] = {
    val (live, _) = state
    require(live.nonEmpty, s"StandingIndex '$name' must be init()-ed before reads")
    val sel = live.filter(_.cover <= maxId)
    require(sel.nonEmpty,
      s"StandingIndex '$name' segmentsUpTo($maxId) selected no segments " +
        s"(live covers: ${live.map(_.cover).mkString(",")}) — either a " +
        "compaction subsumed fold ids beyond this batch (compact only " +
        "covers of committed batches, e.g. compact(coverAtMost)) or a " +
        "horizon expiry retired every low-cover segment while this batch " +
        "replayed; every in-flight probe must keep a covering segment")
    sel.map(s => spark.table(s.table))
  }

  /** Segment merge (Hudi compaction): rewrite the live segments covering
    * fold ids ≤ `coverAtMost` as ONE bucketed generation table and
    * publish; later-covering segments stay live and untouched. The
    * merged segment COVERS the max fold id it subsumes, so
    * `segmentsUpTo` probes of already-committed batches keep resolving
    * it — compaction composes with a continuous keyed-fold ingest (q94)
    * exactly as Hudi's async compaction composes with DeltaStreamer
    * `--continuous`. Generation tables live in their own namespace
    * (`<name>_cmp<g>`), so a merged segment can never be overwritten by
    * a future keyed fold's idempotent same-id rewrite. Superseded
    * segments are RETIRED, not dropped — one maintenance cycle of grace
    * for cross-JVM readers holding the old pointer (class doc); the
    * next mutating call reclaims them.
    *
    * `coverAtMost` is how a CONTINUOUS pipeline compacts safely: Hudi's
    * compaction plans only COMMITTED file slices, and here the caller
    * passes the highest committed batch id — an in-flight batch's
    * (possibly crashed, to-be-replayed) fold at a higher cover is never
    * subsumed, so the replay's `foldAt` and `segmentsUpTo` keep working,
    * and re-running the SAME bounded compact on replay is idempotent
    * (it merges the previous generation into a new one with identical
    * content). The unbounded default is the quiesced/batch-pipeline
    * spelling (q93): everything is committed, merge it all.
    *
    * Refuses to merge segments with DIFFERING `maxEventMs` stamps:
    * stamps are segment-granular, so merging a batch-3 fold with a
    * batch-5 fold would give batch 3's entries batch 5's lifetime and
    * [[expire]]'s horizon contract ("stops blocking H batches after it
    * folded") would silently stretch. An expiring deployment compacts
    * stamp-homogeneous prefixes (or expires first); entry-level stamps
    * are the production extension if finer compaction is needed.
    */
  def compact(coverAtMost: Long = Long.MaxValue): Unit = {
    val live = reclaimRetired()
    require(live.nonEmpty, s"StandingIndex '$name' must be init()-ed before compact()")
    val (sel, keep) = live.partition(_.cover <= coverAtMost)
    require(sel.nonEmpty,
      s"StandingIndex '$name' compact($coverAtMost): no live segment covers " +
        s"<= $coverAtMost (live covers: ${live.map(_.cover).mkString(",")})")
    require(sel.map(_.maxEventMs).distinct.size == 1,
      s"StandingIndex '$name' compact($coverAtMost) would merge segments " +
        s"with differing maxEventMs stamps " +
        s"(${sel.map(_.maxEventMs).distinct.sorted.mkString(",")}) — the " +
        "merged segment's stamp would stretch older entries' expire() " +
        "horizon; compact stamp-homogeneous segments or expire first")
    val gen = live.map(_.table).collect {
      case t if t.startsWith(s"${name}_cmp") => t.stripPrefix(s"${name}_cmp").toLong
    }.maxOption.getOrElse(0L) + 1
    val merged = Seg(cmpTable(gen), sel.map(_.cover).max, sel.head.maxEventMs)
    publishSegment(
      sel.map(s => spark.table(s.table)).reduce(_ unionByName _),
      merged.table, live.map(_.table).toSet)
    commit((keep :+ merged).sortBy(_.cover), retired = sel.map(_.table))
  }

  /** Horizon-scoped segment retirement — the index-lifetime bound an
    * infinite stream needs (q61's dedup-horizon sizing rule, lifted from
    * operator state to the standing index): a segment whose
    * `maxEventMs < expireBeforeMs` holds only entries that can no longer
    * block any in-tolerance arrival, so it is retired (retain-one grace,
    * like [[compact]]'s supersession) and stops being probed; the next
    * mutating call reclaims its bytes. Callers pass
    * `watermarkMs − horizonMs`. Segments without event-time metadata
    * (`maxEventMs = ∞` — e.g. init's corpus segment unless the caller
    * stamped it) never expire. Refuses to expire the LAST live segment:
    * an initialized index must keep ≥ 1 segment (every read path
    * requires it), and a fully-expired index is a reset — use [[init]].
    */
  def expire(expireBeforeMs: Long): Unit = {
    val live = reclaimRetired()
    require(live.nonEmpty, s"StandingIndex '$name' must be init()-ed before expire()")
    val (dead, keep) = live.partition(_.maxEventMs < expireBeforeMs)
    if (dead.nonEmpty) {
      require(keep.nonEmpty,
        s"StandingIndex '$name' expire($expireBeforeMs) would retire every " +
          "live segment; an initialized index keeps >= 1 — reset with init()")
      commit(keep, retired = dead.map(_.table))
    }
  }
}
