package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.Confs.withConf
import graft.streaming.StreamJobs

/** Driver-gated streaming queries: the append-mode watermark path run
  * through the REAL streaming engine (MicroBatchExecution + StateStore),
  * not the batch-plan parity shortcut. q05 pins the window arithmetic in
  * batch; StreamingSpec pins eviction semantics in-process; this gate
  * makes the append path driver-visible — the result is hash-compared
  * against a DuckDB oracle that independently reproduces the
  * watermark-closed-window set.
  */
object StreamGateQueries {

  /** q49 — watermarked sliding-window aggregation under APPEND output
    * mode with `Trigger.AvailableNow` over the events topic dump
    * (ref `05_streaming_read_kafka_console_window.py:77-82` declares
    * exactly this watermark+window pair but runs it in complete mode,
    * where the watermark is inert and state grows forever — SURVEY ST1).
    * Append is the 100 TB path: the StateStore holds only OPEN windows,
    * each window is emitted exactly once when the watermark passes its
    * end, and closed state is evicted. The streaming engine executes the
    * file source in one data micro-batch, advances the watermark to
    * `max(ts) - 10 min` (floored to ms), then runs a no-data batch that
    * flushes every window with `window.end <= watermark` to the parquet
    * sink. The oracle recomputes that exact set: each event lands in its
    * two overlapping 10-minute windows, and only windows whose end is at
    * or before `max(ts) - 10 min` are kept — late-open windows (the last
    * 10 minutes of the stream) stay in state and are correctly absent
    * from both sides.
    */
  def q49AppendWindowSales(s: SparkSession, dir: String): DataFrame = withConf(s,
    // events.ts is parquet TIMESTAMP(NANOS) (see Tables.events): the
    // streaming schema declares the nanos long and converts with an
    // integral div — ns-since-epoch exceeds double precision. Scoped:
    // the stream starts (and clones the conf) inside this block.
    "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
    import s.implicits._
    val raw = s.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", LongType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType))))
      // the topic dump is a bare parquet file. FileStreamSource force-sets
      // basePath to the source path when it is NOT a glob — and a file
      // basePath is rejected — so the path must stay a glob, with the
      // table directory supplied as the explicit basePath
      .option("basePath", dir)
      .parquet(s"$dir/events*.parquet")
    val events = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val out = Files.createTempDirectory("graft-q49-out").toString
    val ck = Files.createTempDirectory("graft-q49-ck").toString
    val query = StreamJobs.slidingWindowSales(events)
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format($"window.end", "yyyy-MM-dd HH:mm:ss").as("window_end"),
        $"event_type", $"sales", $"orders")
      .writeStream
      .queryName("q49_append_window_sales")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .start(out)
    query.awaitTermination()
    s.read.parquet(out).orderBy($"window_start", $"event_type")
  }

  /** q05's oracle restricted to watermark-closed windows: the stream's
    * final watermark is `max(ts) - 10 min` and append emits windows with
    * `end <= watermark`. (Spark floors the watermark to whole
    * milliseconds; window ends are whole seconds, so the ms floor can
    * never flip the comparison and plain interval arithmetic is exact.)
    */
  val q49Oracle: String =
    """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
      |  strftime(ws + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_end,
      |  event_type,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sales,
      |  count(*) AS orders
      |FROM (
      |  SELECT unnest([tb, tb - INTERVAL 5 MINUTE]) AS ws, event_type, value
      |  FROM (SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS tb,
      |               event_type, value FROM events) raw) t,
      |  (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events) m
      |WHERE ws + INTERVAL 10 MINUTE <= mx - INTERVAL 10 MINUTE
      |GROUP BY ws, event_type
      |ORDER BY window_start, event_type""".stripMargin

  /** q52 — watermarked stream–stream interval join through the REAL
    * streaming engine (`StreamingSymmetricHashJoin`), gating
    * [[StreamJobs.streamStreamCorrelate]] (whose state-eviction law lives
    * in StreamingSpec): every `purchase` is correlated with each same-user
    * `click` in the preceding 10 minutes. The reference only ever joins
    * stream-to-static (ref `08_streaming_read_kafka_join_window.py:94`);
    * correlating two live streams is the generalization a 100 TB
    * event pipeline needs (impression→conversion attribution).
    *
    * Harness: both sides are file streams over the events topic dump
    * (q49's pattern), all data arrives in the single AvailableNow
    * micro-batch, and inner-join matches emit in that same batch — so
    * the gated result equals the batch interval join, which is exactly
    * the DuckDB oracle. The interval bound (`r_ts ∈ [l_ts, l_ts+10m]`)
    * plus both watermarks is what lets the join compute per-side state
    * watermarks and EVICT buffered rows — bounded state independent of
    * stream length, pinned separately by StreamingSpec's eviction law.
    *
    * Oracle parity: Spark reads the TIMESTAMP(NANOS) parquet as ns longs
    * and truncates to micros; the oracle mirrors by CASTing to DuckDB's
    * µs TIMESTAMP before any comparison, so boundary pairs landing in
    * the same microsecond agree bit-exactly on both sides.
    */
  def q52StreamStreamJoin(s: SparkSession, dir: String): DataFrame = withConf(s,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
    import s.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    def side(kind: String, p: String): DataFrame = s.readStream
      .schema(schema)
      .option("basePath", dir)
      .parquet(s"$dir/events*.parquet")
      .filter($"event_type" === kind)
      .select(
        $"event_id".as(s"${p}_id"),
        $"user_id".as(s"${p}_k"),
        timestamp_micros(expr("ts div 1000")).as(s"${p}_ts"))
    val joined = StreamJobs.streamStreamCorrelate(
      side("click", "l"), side("purchase", "r"),
      window = "10 minutes", delay = "10 minutes")
    val out = Files.createTempDirectory("graft-q52-out").toString
    val ck = Files.createTempDirectory("graft-q52-ck").toString
    val query = joined
      .select(
        $"l_id".as("click_id"), $"r_id".as("purchase_id"),
        $"l_k".as("user_id"),
        date_format($"l_ts", "yyyy-MM-dd HH:mm:ss").as("click_time"),
        date_format($"r_ts", "yyyy-MM-dd HH:mm:ss").as("purchase_time"))
      .writeStream
      .queryName("q52_stream_stream_join")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .start(out)
    query.awaitTermination()
    s.read.parquet(out).orderBy($"click_id", $"purchase_id")
  }

  val q52Oracle: String =
    """SELECT a.event_id AS click_id, b.event_id AS purchase_id,
      |  a.user_id AS user_id,
      |  strftime(CAST(a.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS click_time,
      |  strftime(CAST(b.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS purchase_time
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
      | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
      |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
      |ORDER BY click_id, purchase_id""".stripMargin

  /** q54 — q52's LEFT-OUTER twin: every click, converted or not. Outer
    * emission timing is the interesting semantics (pinned in-process by
    * StreamingSpec's outer-emission law): an unmatched click emits
    * null-padded only when the watermark proves no purchase can still
    * match, i.e. `l_ts + window <= final watermark`. The global
    * watermark is the MIN over both input watermarks — each side
    * advances to its own `max(side ts) - delay`, so under the
    * AvailableNow harness the final watermark is
    * `least(max click ts, max purchase ts) - delay` (at sf0.001 the
    * click side lags the purchase side by ~4 h and is the binding one).
    * The gated set is: all inner matches, plus null-padded rows exactly
    * for unmatched clicks whose interval closed — later clicks stay
    * withheld in state, correctly absent from both sides. The oracle
    * reproduces that set with a plain LEFT JOIN filtered by the same
    * boundary arithmetic (the q49 pattern lifted to joins).
    */
  def q54StreamStreamLeftOuter(s: SparkSession, dir: String): DataFrame = withConf(s,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
    import s.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    def side(kind: String, p: String): DataFrame = s.readStream
      .schema(schema)
      .option("basePath", dir)
      .parquet(s"$dir/events*.parquet")
      .filter($"event_type" === kind)
      .select(
        $"event_id".as(s"${p}_id"),
        $"user_id".as(s"${p}_k"),
        timestamp_micros(expr("ts div 1000")).as(s"${p}_ts"))
    val joined = StreamJobs.streamStreamCorrelate(
      side("click", "l"), side("purchase", "r"),
      window = "10 minutes", delay = "10 minutes", joinType = "left_outer")
    val out = Files.createTempDirectory("graft-q54-out").toString
    val ck = Files.createTempDirectory("graft-q54-ck").toString
    val query = joined
      .select(
        $"l_id".as("click_id"), $"r_id".as("purchase_id"),
        $"l_k".as("user_id"),
        date_format($"l_ts", "yyyy-MM-dd HH:mm:ss").as("click_time"))
      .writeStream
      .queryName("q54_stream_stream_left_outer")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .start(out)
    query.awaitTermination()
    s.read.parquet(out).orderBy($"click_id", $"purchase_id")
  }

  /** Matched rows always emit; null-padded rows only for clicks whose
    * interval is closed by the final GLOBAL watermark — the min of the
    * two per-side watermarks, `least(max click, max purchase) - 10 min`.
    */
  val q54Oracle: String =
    """SELECT a.event_id AS click_id, b.event_id AS purchase_id,
      |  a.user_id AS user_id,
      |  strftime(CAST(a.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS click_time
      |FROM (SELECT * FROM events WHERE event_type = 'click') a
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id
      | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
      | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 10 MINUTE,
      |  (SELECT least(
      |     max(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END),
      |     max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END))
      |     AS wm_base FROM events) m
      |WHERE b.event_id IS NOT NULL
      |   OR CAST(a.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
      |      <= m.wm_base - INTERVAL 10 MINUTE
      |ORDER BY click_id, purchase_id""".stripMargin

  /** q55 — the FULL-outer stream–stream interval join: every click and
    * every purchase, matched where possible. Pins BOTH eviction
    * boundaries at once (q54 pins only the left's): an unmatched click
    * emits null-padded when `l_ts + window <= watermark` (no future
    * purchase can land inside its interval), an unmatched purchase when
    * `r_ts <= watermark` (any future click would carry `l_ts >
    * watermark > r_ts` and the join needs `r_ts >= l_ts`). Watermark =
    * min of the per-side watermarks, as q54 established. Output order
    * coalesces the nullable ids (Spark sorts NULLS FIRST, DuckDB NULLS
    * LAST — never ORDER BY a nullable column in a gate).
    */
  def q55StreamStreamFullOuter(s: SparkSession, dir: String): DataFrame = withConf(s,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
    import s.implicits._
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    def side(kind: String, p: String): DataFrame = s.readStream
      .schema(schema)
      .option("basePath", dir)
      .parquet(s"$dir/events*.parquet")
      .filter($"event_type" === kind)
      .select(
        $"event_id".as(s"${p}_id"),
        $"user_id".as(s"${p}_k"),
        timestamp_micros(expr("ts div 1000")).as(s"${p}_ts"))
    val joined = StreamJobs.streamStreamCorrelate(
      side("click", "l"), side("purchase", "r"),
      window = "10 minutes", delay = "10 minutes", joinType = "full_outer")
    val out = Files.createTempDirectory("graft-q55-out").toString
    val ck = Files.createTempDirectory("graft-q55-ck").toString
    val query = joined
      .select(
        $"l_id".as("click_id"), $"r_id".as("purchase_id"),
        coalesce($"l_k", $"r_k").as("user_id"))
      .writeStream
      .queryName("q55_stream_stream_full_outer")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .start(out)
    query.awaitTermination()
    s.read.parquet(out)
      .orderBy(coalesce($"click_id", lit(-1L)), coalesce($"purchase_id", lit(-1L)))
  }

  val q55Oracle: String =
    """SELECT a.event_id AS click_id, b.event_id AS purchase_id,
      |  coalesce(a.user_id, b.user_id) AS user_id
      |FROM (SELECT * FROM events WHERE event_type = 'click') a
      |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id
      | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
      | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 10 MINUTE,
      |  (SELECT least(
      |     max(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END),
      |     max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END))
      |     AS wm_base FROM events) m
      |WHERE (a.event_id IS NOT NULL AND b.event_id IS NOT NULL)
      |   OR (b.event_id IS NULL
      |       AND CAST(a.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
      |           <= m.wm_base - INTERVAL 10 MINUTE)
      |   OR (a.event_id IS NULL
      |       AND CAST(b.ts AS TIMESTAMP) <= m.wm_base - INTERVAL 10 MINUTE)
      |ORDER BY coalesce(click_id, -1), coalesce(purchase_id, -1)""".stripMargin

  /** The events topic-dump schema shared by every gate here (the ts
    * column is the raw TIMESTAMP(NANOS) long — see q49's scaladoc).
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream over the events dump with ts normalized to µs. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame =
    s.readStream
      .schema(eventsSchema)
      .option("basePath", dir)
      .parquet(s"$dir/events*.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** q58 — custom-state streaming sessionization through the REAL engine
    * (`FlatMapGroupsWithStateExec` + event-time timeout), gating
    * [[StreamJobs.sessionize]] — the one stateful operator whose
    * streaming path previously met only an in-process law (StreamingSpec;
    * the gated q35 covers batch `session_window`, a different code path).
    *
    * Emission model under the AvailableNow harness: all events arrive in
    * the single data micro-batch, so each user's events are processed
    * ts-sorted in one group call — every session CLOSED BY A GAP (a later
    * in-batch event > 6 h after it) emits immediately; the user's final
    * session stays in state with an event-time timeout at `last + gap`.
    * The watermark then advances to `max(ts) − 10 min` (ms-floored) and
    * the no-data batch fires timeouts STRICTLY below it (Spark evicts on
    * `timeoutTimestamp < watermark`), closing final sessions with
    * `last + gap < watermark`; later final sessions stay open in state,
    * correctly absent from both sides. The oracle reproduces exactly
    * that set with gaps-and-islands SQL: every non-final island, plus
    * final islands whose timeout the watermark passed.
    *
    * Precision: [[StreamJobs.UserSession]] bounds are `java.sql.Timestamp`
    * built from `getTime` (whole ms), and the timeout clock is ms too, so
    * the oracle works entirely in `epoch_ms` — the same ns→µs→ms floor on
    * both sides.
    */
  def q58StreamingSessionize(s: SparkSession, dir: String): DataFrame = withConf(s,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
    import s.implicits._
    val events = eventsStream(s, dir)
      .select($"user_id", $"ts", $"value")
      .withWatermark("ts", "10 minutes")
    val sessions = StreamJobs.sessionize(events, gapMinutes = 360)
    val out = Files.createTempDirectory("graft-q58-out").toString
    val ck = Files.createTempDirectory("graft-q58-ck").toString
    val query = sessions.toDF()
      .select($"user_id",
        unix_millis($"session_start").as("session_start_ms"),
        unix_millis($"session_end").as("session_end_ms"),
        $"events".as("n_events"))
      .writeStream
      .queryName("q58_streaming_sessionize")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .start(out)
    query.awaitTermination()
    s.read.parquet(out).orderBy($"user_id", $"session_start_ms")
  }

  private val GapMs = 360L * 60000    // 6-hour session gap
  private val DelayMs = 10L * 60000   // watermark delay

  val q58Oracle: String =
    s"""WITH e AS (
      |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
      |m AS (
      |  SELECT user_id, ms,
      |    CASE WHEN lag(ms) OVER w IS NULL
      |           OR ms - lag(ms) OVER w > $GapMs THEN 1 ELSE 0 END AS brk
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
      |sess AS (
      |  SELECT user_id, ms,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m),
      |g AS (
      |  SELECT user_id, sid,
      |    min(ms) AS session_start_ms, max(ms) AS session_end_ms,
      |    count(*) AS n_events,
      |    max(sid) OVER (PARTITION BY user_id) AS last_sid
      |  FROM sess GROUP BY user_id, sid),
      |w AS (SELECT max(epoch_ms(CAST(ts AS TIMESTAMP))) - $DelayMs AS wm FROM events)
      |SELECT user_id, session_start_ms, session_end_ms, n_events
      |FROM g, w
      |WHERE sid < last_sid OR session_end_ms + $GapMs < wm
      |ORDER BY user_id, session_start_ms""".stripMargin

  /** q62 — q58's sessionization re-run through Spark 4's arbitrary-state
    * v2 engine path: `transformWithState` (`TransformWithStateExec`,
    * explicit event-time timers) on the RocksDB state store provider —
    * the memory-bounded, changelog-checkpointed backend a 100 TB
    * deployment would run, and the provider TWS requires. Same oracle as
    * q58: two independent state APIs and two state backends must land on
    * byte-identical session sets, or one of them is wrong. Expired-timer
    * semantics pinned in passing: TWS timers fire strictly below the
    * eviction watermark, matching `GroupStateTimeout`'s boundary.
    */
  def q62SessionizeTws(s: SparkSession, dir: String): DataFrame = withConf(s,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
    import s.implicits._
    val events = eventsStream(s, dir)
      .select($"user_id", $"ts", $"value")
      .withWatermark("ts", "10 minutes")
    val sessions = StreamJobs.sessionizeTws(events, gapMinutes = 360)
    val out = Files.createTempDirectory("graft-q62-out").toString
    val ck = Files.createTempDirectory("graft-q62-ck").toString
    val query = sessions.toDF()
      .select($"user_id",
        unix_millis($"session_start").as("session_start_ms"),
        unix_millis($"session_end").as("session_end_ms"),
        $"events".as("n_events"))
      .writeStream
      .queryName("q62_sessionize_tws")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .start(out)
    query.awaitTermination()
    s.read.parquet(out).orderBy($"user_id", $"session_start_ms")
  }

  /** q59 — the RIGHT-outer stream–stream interval join, completing the
    * join-mode quartet (inner q52, left q54, full q55): every purchase,
    * attributed or not. An unmatched purchase emits null-padded when
    * `r_ts <= watermark` — any future click carries `l_ts > watermark ≥
    * r_ts` and the join needs `r_ts >= l_ts`, so no partner can still
    * arrive (the boundary q55 pinned on its right side, now isolated).
    * Watermark = min of the per-side watermarks, as q54 established.
    */
  def q59StreamStreamRightOuter(s: SparkSession, dir: String): DataFrame = withConf(s,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
    import s.implicits._
    def side(kind: String, p: String): DataFrame = eventsStream(s, dir)
      .filter($"event_type" === kind)
      .select(
        $"event_id".as(s"${p}_id"),
        $"user_id".as(s"${p}_k"),
        $"ts".as(s"${p}_ts"))
    val joined = StreamJobs.streamStreamCorrelate(
      side("click", "l"), side("purchase", "r"),
      window = "10 minutes", delay = "10 minutes", joinType = "right_outer")
    val out = Files.createTempDirectory("graft-q59-out").toString
    val ck = Files.createTempDirectory("graft-q59-ck").toString
    val query = joined
      .select(
        $"l_id".as("click_id"), $"r_id".as("purchase_id"),
        $"r_k".as("user_id"),
        date_format($"r_ts", "yyyy-MM-dd HH:mm:ss").as("purchase_time"))
      .writeStream
      .queryName("q59_stream_stream_right_outer")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .start(out)
    query.awaitTermination()
    s.read.parquet(out)
      .orderBy(coalesce($"click_id", lit(-1L)), $"purchase_id")
  }

  /** Matched rows always emit; null-padded rows only for purchases at or
    * below the final global watermark (q55's right-side clause, mirrored
    * from q54's left-side one).
    */
  val q59Oracle: String =
    """SELECT a.event_id AS click_id, b.event_id AS purchase_id,
      |  b.user_id AS user_id,
      |  strftime(CAST(b.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS purchase_time
      |FROM (SELECT * FROM events WHERE event_type = 'click') a
      |RIGHT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id
      | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
      | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 10 MINUTE,
      |  (SELECT least(
      |     max(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END),
      |     max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END))
      |     AS wm_base FROM events) m
      |WHERE a.event_id IS NOT NULL
      |   OR CAST(b.ts AS TIMESTAMP) <= m.wm_base - INTERVAL 10 MINUTE
      |ORDER BY coalesce(click_id, -1), purchase_id""".stripMargin

  /** q60 — CHAINED stateful operators in one streaming query: the q52
    * interval join feeding a tumbling-window aggregation, the shape of
    * every real attribution pipeline (correlate impression→conversion,
    * then aggregate conversions per window) and the composition nothing
    * previously exercised. Spark 3.4+ supports this in append mode via
    * per-operator watermark propagation: the join's OUTPUT watermark is
    * the min of its per-side state-eviction watermarks — here the left
    * side may buffer rows back to `wm − 10 min`, so the downstream agg
    * sees `wm − 10 min` and closes windows with
    * `end <= least(max click, max purchase) − 10 min − 10 min`. The
    * oracle reproduces that boundary; the gate additionally requires the
    * runtime to report BOTH stateful operators (symmetric hash join +
    * streaming agg) in the executed query's progress.
    */
  def q60JoinThenWindow(s: SparkSession, dir: String): DataFrame = withConf(s,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
    import s.implicits._
    def side(kind: String, p: String, extra: Column*): DataFrame = eventsStream(s, dir)
      .filter($"event_type" === kind)
      .select(Seq(
        $"event_id".as(s"${p}_id"),
        $"user_id".as(s"${p}_k"),
        $"ts".as(s"${p}_ts")) ++ extra: _*)
    val joined = StreamJobs.streamStreamCorrelate(
      side("click", "l"),
      side("purchase", "r", $"value".as("r_value")),
      window = "10 minutes", delay = "10 minutes")
    val agg = joined
      .groupBy(window($"r_ts", "10 minutes"))
      .agg(
        count(lit(1)).as("n_attributed"),
        sum($"r_value".cast(DecimalType(12, 2))).cast("double").as("attributed_value"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format($"window.end", "yyyy-MM-dd HH:mm:ss").as("window_end"),
        $"n_attributed", $"attributed_value")
    val out = Files.createTempDirectory("graft-q60-out").toString
    val ck = Files.createTempDirectory("graft-q60-ck").toString
    val query = agg.writeStream
      .queryName("q60_join_then_window")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .start(out)
    query.awaitTermination()
    val stateful = Option(query.lastProgress)
      .map(_.stateOperators.map(_.operatorName).toSeq).getOrElse(Seq.empty)
    require(stateful.size == 2,
      s"q60 must execute two chained stateful operators, got $stateful")
    s.read.parquet(out).orderBy($"window_start")
  }

  val q60Oracle: String =
    """WITH j AS (
      |  SELECT b.ts AS r_ts, b.value AS r_value
      |  FROM (SELECT * FROM events WHERE event_type = 'click') a
      |  JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |    ON a.user_id = b.user_id
      |   AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
      |   AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 10 MINUTE),
      |m AS (SELECT least(
      |    max(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END),
      |    max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END))
      |    AS wm_base FROM events)
      |SELECT strftime(tb, '%Y-%m-%d %H:%M:%S') AS window_start,
      |  strftime(tb + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_end,
      |  count(*) AS n_attributed,
      |  CAST(sum(CAST(r_value AS DECIMAL(12,2))) AS DOUBLE) AS attributed_value
      |FROM (SELECT time_bucket(INTERVAL '10 minutes', CAST(r_ts AS TIMESTAMP)) AS tb,
      |             r_value FROM j) t, m
      |WHERE tb + INTERVAL 10 MINUTE <= m.wm_base - INTERVAL 20 MINUTE
      |GROUP BY tb
      |ORDER BY window_start""".stripMargin

  /** q63 — THREE chained stateful operators in one append-mode query:
    * at-least-once ingest dedup (`dropDuplicatesWithinWatermark` on the
    * purchase id) → stream–stream interval join → tumbling-window
    * aggregation. This is the canonical shape of a production
    * attribution pipeline (dedup re-deliveries at ingest, correlate,
    * aggregate) and extends q60's two-operator composition to the full
    * chain. On the driver's exactly-once topic dump the dedup stage is a
    * SEMANTIC no-op (event ids are unique), which is precisely what
    * makes the oracle expressible: the result must equal q60's — while
    * the runtime must now report all THREE stateful operators, and the
    * dedup's output watermark must propagate through the join unchanged
    * (dedup adds no event-time delay, so the q60 window boundary holds
    * verbatim; a propagation bug shifts the closed-window set and fails
    * the hash).
    */
  def q63DedupJoinWindow(s: SparkSession, dir: String): DataFrame = withConf(s,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
    import s.implicits._
    def side(kind: String, p: String, extra: Column*): DataFrame = eventsStream(s, dir)
      .filter($"event_type" === kind)
      .select(Seq(
        $"event_id".as(s"${p}_id"),
        $"user_id".as(s"${p}_k"),
        $"ts".as(s"${p}_ts")) ++ extra: _*)
    val clicks = side("click", "l").withWatermark("l_ts", "10 minutes")
    val purchases = side("purchase", "r", $"value".as("r_value"))
      .withWatermark("r_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("r_id") // stateful op 1: ingest dedup
    val joined = clicks.join(purchases, expr( // stateful op 2: interval join
      "l_k = r_k AND r_ts >= l_ts AND r_ts <= l_ts + INTERVAL 10 minutes"))
    val agg = joined // stateful op 3: windowed aggregation
      .groupBy(window($"r_ts", "10 minutes"))
      .agg(
        count(lit(1)).as("n_attributed"),
        sum($"r_value".cast(DecimalType(12, 2))).cast("double").as("attributed_value"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format($"window.end", "yyyy-MM-dd HH:mm:ss").as("window_end"),
        $"n_attributed", $"attributed_value")
    val out = Files.createTempDirectory("graft-q63-out").toString
    val ck = Files.createTempDirectory("graft-q63-ck").toString
    val query = agg.writeStream
      .queryName("q63_dedup_join_window")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .start(out)
    query.awaitTermination()
    val stateful = Option(query.lastProgress)
      .map(_.stateOperators.map(_.operatorName).toSeq).getOrElse(Seq.empty)
    require(stateful.size == 3,
      s"q63 must execute three chained stateful operators, got $stateful")
    s.read.parquet(out).orderBy($"window_start")
  }

  /** q61 — streaming ingest dedup via `dropDuplicatesWithinWatermark`
    * (ST7's streaming-NATIVE form: the reference dedups downstream with
    * the W3 latest-wins window over a batch read — ref
    * `07_batch_read_kafka_kafka_dedupe.py:65-75` — which re-reads the
    * whole topic; the streaming form keeps one state row per key inside
    * the watermark horizon and drops re-deliveries at ingest, the right
    * shape for at-least-once sources at 100 TB). Each distinct key emits
    * exactly once per state lifetime; with all data in one AvailableNow
    * batch the gated set is exactly the distinct keys. Only the KEY
    * columns are projected: which physical row emits first is
    * arrival-order-dependent, the key itself is not. The state-EVICTION
    * boundary (a duplicate arriving after the watermark passed its key's
    * horizon is NOT suppressed) is pinned in-process by StreamingSpec,
    * where a second batch can be delivered after the watermark moves.
    */
  def q61StreamDedup(s: SparkSession, dir: String): DataFrame = withConf(s,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
    import s.implicits._
    val deduped = eventsStream(s, dir)
      .select($"user_id", $"event_type", $"ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select($"user_id", $"event_type")
    val out = Files.createTempDirectory("graft-q61-out").toString
    val ck = Files.createTempDirectory("graft-q61-ck").toString
    val query = deduped.writeStream
      .queryName("q61_stream_dedup")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .start(out)
    query.awaitTermination()
    s.read.parquet(out).orderBy($"user_id", $"event_type")
  }

  val q61Oracle: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** q64 — the MapState/ListState profile processor ([[StreamJobs
    * .profileTws]]) driver-gated, so every arbitrary-state v2 primitive
    * is oracle-checked (q62 covers ValueState + timers): per-user
    * event-type counts from `MapState` and running top-3 values from
    * `ListState`, on RocksDB. Update-mode output can't hit the parquet
    * sink directly, so the gate writes through `foreachBatch` (the
    * topic-sink pattern); under AvailableNow all data lands in one
    * batch, so each user emits exactly one snapshot — the final profile
    * — which the oracle recomputes with plain grouped SQL. The map
    * explodes to (event_type, n_type) rows and the top-k list flattens
    * to columns, keeping the comparison in exact scalar types.
    */
  def q64UserProfile(s: SparkSession, dir: String): DataFrame = withConf(s,
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
    import s.implicits._
    val events = eventsStream(s, dir)
      .select($"user_id", $"event_type", $"value")
    val profiles = StreamJobs.profileTws(events)
    val out = Files.createTempDirectory("graft-q64-out").toString
    val ck = Files.createTempDirectory("graft-q64-ck").toString
    val query = profiles.toDF().writeStream
      .queryName("q64_user_profile")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .select($"user_id", $"n_events",
            explode($"type_counts").as(Seq("event_type", "n_type")),
            element_at($"top_values", 1).as("top1"),
            element_at($"top_values", 2).as("top2"),
            element_at($"top_values", 3).as("top3"))
          .write.mode("append").parquet(out)
      }
      .start()
    query.awaitTermination()
    s.read.parquet(out)
      .select($"user_id", $"event_type", $"n_type", $"n_events",
        $"top1", $"top2", $"top3")
      .orderBy($"user_id", $"event_type")
  }

  val q64Oracle: String =
    """WITH tv AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    (array_agg(value ORDER BY value DESC))[1] AS top1,
      |    (array_agg(value ORDER BY value DESC))[2] AS top2,
      |    (array_agg(value ORDER BY value DESC))[3] AS top3
      |  FROM events GROUP BY user_id),
      |tc AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_type
      |  FROM events GROUP BY user_id, event_type)
      |SELECT tc.user_id, tc.event_type, tc.n_type, tv.n_events,
      |  tv.top1, tv.top2, tv.top3
      |FROM tc JOIN tv ON tv.user_id = tc.user_id
      |ORDER BY tc.user_id, tc.event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_append_window_sales" -> (q49AppendWindowSales _),
    "q52_stream_stream_join" -> (q52StreamStreamJoin _),
    "q54_stream_stream_left_outer" -> (q54StreamStreamLeftOuter _),
    "q55_stream_stream_full_outer" -> (q55StreamStreamFullOuter _),
    "q58_streaming_sessionize" -> (q58StreamingSessionize _),
    "q59_stream_stream_right_outer" -> (q59StreamStreamRightOuter _),
    "q60_join_then_window" -> (q60JoinThenWindow _),
    "q61_stream_dedup" -> (q61StreamDedup _),
    "q62_sessionize_tws" -> (q62SessionizeTws _),
    "q63_dedup_join_window" -> (q63DedupJoinWindow _),
    "q64_user_profile" -> (q64UserProfile _))

  val oracles: Map[String, String] = Map(
    "q49_append_window_sales" -> q49Oracle,
    "q52_stream_stream_join" -> q52Oracle,
    "q54_stream_stream_left_outer" -> q54Oracle,
    "q55_stream_stream_full_outer" -> q55Oracle,
    "q58_streaming_sessionize" -> q58Oracle,
    "q59_stream_stream_right_outer" -> q59Oracle,
    "q60_join_then_window" -> q60Oracle,
    "q61_stream_dedup" -> q61Oracle,
    // two state APIs (FMGWS v1 / TWS v2) + two backends must agree
    "q62_sessionize_tws" -> q58Oracle,
    // dedup on unique ids is a no-op and adds no event-time delay: the
    // 3-op chain must reproduce the 2-op chain's result exactly
    "q63_dedup_join_window" -> q60Oracle,
    "q64_user_profile" -> q64Oracle)
}
