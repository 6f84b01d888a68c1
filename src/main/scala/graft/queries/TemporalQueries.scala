package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOf

/** Temporal analytics the reference's event pipelines stop short of:
  * as-of enrichment and session windows. Both run on the `events` table
  * and are exact against gaps-and-islands / carry-forward DuckDB oracles.
  * All time arithmetic is in MICROseconds (`unix_micros` / `epoch_us`) —
  * Spark timestamps are µs-precision, and a milliseconds oracle would
  * mis-bucket pairs whose gap straddles a millisecond boundary.
  */
object TemporalQueries {

  // ---------------------------------------------------------------- q34

  /** q34 — as-of join ([[graft.operators.AsOf]]): every event is
    * decorated with the user's latest `signup` event at-or-before its
    * timestamp (the "attribute activity to its originating signup"
    * enrich; events before the first signup keep nulls). One shuffle on
    * `user_id`, one ordered window pass — see the operator's scaladoc for
    * why this is the scale-sane distributed as-of plan.
    */
  def q34AsofEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val left = ev.select($"user_id", $"ts", $"event_id", $"event_type")
    val right = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id",
        $"event_id".as("signup_event_id"),
        unix_micros($"ts").as("signup_us"))
    AsOf.joinLatest(left, right,
        keys = Seq("user_id"), tsCol = "ts", seqCol = "event_id",
        payloadCols = Seq("signup_event_id", "signup_us"))
      .select($"user_id", $"event_id", $"event_type", $"signup_event_id",
        (unix_micros($"ts") - $"signup_us").as("us_since_signup"))
      .orderBy($"user_id", $"event_id")
  }

  val q34Oracle: String =
    """WITH fr AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, 1 AS side,
      |    event_id, event_type,
      |    NULL::BIGINT AS signup_event_id, NULL::BIGINT AS signup_us
      |  FROM events
      |  UNION ALL
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)), 0,
      |    event_id, event_type,
      |    event_id, epoch_us(CAST(ts AS TIMESTAMP))
      |  FROM events WHERE event_type = 'signup'),
      |c AS (
      |  SELECT user_id, ts_us, side, event_id, event_type,
      |    last_value(signup_event_id IGNORE NULLS) OVER w AS signup_event_id,
      |    last_value(signup_us IGNORE NULLS) OVER w AS signup_us
      |  FROM fr
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id, event_type, signup_event_id,
      |  ts_us - signup_us AS us_since_signup
      |FROM c WHERE side = 1
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q35

  private val GapUs = 6L * 3600 * 1000 * 1000 // 6-hour session gap

  /** q35 — session-window aggregation: `session_window(ts, 6h)` per user
    * (Spark's native session windows — batch here, and the same
    * expression runs under `groupBy` on a stream). A session's end is
    * `last event + gap`, and a new session starts when the inter-event
    * gap is ≥ the window gap — the oracle reproduces that with the
    * classic gaps-and-islands (lag → break flag → running sum → group).
    * Scale: sessionization is one shuffle on the user key; Spark's
    * implementation merges sessions after a partial local merge, the
    * same two-phase shape as the aggregates. Integer-only aggregate
    * outputs keep the hash comparison exact.
    */
  def q35SessionWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id", session_window($"ts", "6 hours"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"event_type").as("n_types"),
        max($"event_id").as("max_event_id"))
      .select($"user_id",
        unix_micros($"session_window.start").as("session_start_us"),
        unix_micros($"session_window.end").as("session_end_us"),
        $"n_events", $"n_types", $"max_event_id")
      .orderBy($"user_id", $"session_start_us")
  }

  val q35Oracle: String =
    s"""WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    event_type, event_id
      |  FROM events),
      |m AS (
      |  SELECT user_id, ts_us, event_type, event_id,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |           OR ts_us - lag(ts_us) OVER w >= $GapUs THEN 1 ELSE 0 END AS brk
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |sess AS (
      |  SELECT user_id, ts_us, event_type, event_id,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT user_id,
      |  min(ts_us) AS session_start_us,
      |  max(ts_us) + $GapUs AS session_end_us,
      |  count(*) AS n_events,
      |  count(DISTINCT event_type) AS n_types,
      |  max(event_id) AS max_event_id
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  // --------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_asof_enrich"    -> (q34AsofEnrich _),
    "q35_session_window" -> (q35SessionWindow _))

  val oracles: Map[String, String] = Map(
    "q34_asof_enrich"    -> q34Oracle,
    "q35_session_window" -> q35Oracle)
}
