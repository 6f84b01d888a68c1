package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Classic OLAP reshaping operators: pivot and rollup. Both are
  * single-shuffle grouped aggregations under the hood — the reshaping is
  * free at scale as long as the pivot's value list is pinned (no
  * values-discovery pre-job) and the rollup rides Spark's Expand +
  * two-phase aggregate.
  */
object OlapQueries {

  // ---------------------------------------------------------------- q38

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q38 — pivot: per-user event counts spread into one column per event
    * type. The value list is EXPLICIT — `pivot(col)` without values runs
    * a distinct-scan job first and bakes an unbounded column set into the
    * plan; pinning it keeps the plan static and the schema stable at any
    * scale (unknown types would need a pre-agreed vocabulary, which is
    * what a 100 TB pipeline has anyway). One shuffle on user_id; the
    * pivot is a CASE-dressed hash aggregate.
    */
  def q38PivotEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pivoted = Tables.events(s, dir)
      .groupBy($"user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    EventTypes.foldLeft(pivoted)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L))))
      .withColumn("total", EventTypes.map(col).reduce(_ + _))
      .orderBy($"user_id")
  }

  val q38Oracle: String = {
    val cases = EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
      .mkString(",\n      |  ")
    s"""SELECT user_id,
      |  $cases,
      |  CAST(count(*) AS BIGINT) AS total
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q39

  /** q39 — rollup with grouping indicators: order count and revenue by
    * (region, nation) plus per-region subtotals and the grand total.
    * `grouping_id()` is emitted so aggregated-out NULLs are
    * distinguishable from data NULLs, and the final sort keys on it with
    * coalesced names — Spark sorts NULLS FIRST ascending, DuckDB NULLS
    * LAST, so the oracle must never sort on a nullable column directly.
    * Plan: join chain (broadcast dims, AQE-sized customer join) into one
    * Expand + two-phase hash aggregate — the rollup costs one extra
    * input replication per grouping set, not extra shuffles. Revenue
    * goes through DECIMAL(12,2) per the money-exactness recipe.
    */
  def q39RollupRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val joined = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
    joined
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("revenue"),
        grouping_id().as("gid"))
      .select($"r_name", $"n_name", $"gid", $"n_orders", $"revenue")
      .orderBy($"gid", coalesce($"r_name", lit("")), coalesce($"n_name", lit("")))
  }

  val q39Oracle: String =
    """SELECT r_name, n_name,
      |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY gid, coalesce(r_name, ''), coalesce(n_name, '')""".stripMargin

  // ---------------------------------------------------------------- q41

  /** q41 — unpivot (melt): q38's wide per-user counts fold back into
    * (user_id, event_type, n_events) rows via Spark's native `unpivot`,
    * zero-count cells dropped. The oracle is NOT a translation of this
    * pipeline — it is the plain `GROUP BY user_id, event_type` count, so
    * the gate verifies the algebraic law `unpivot(pivot(x)) = groupBy(x)`
    * end-to-end through two reshapes. Unpivot is a map-side Expand (one
    * output row per value column), no extra shuffle.
    */
  def q41UnpivotEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    q38PivotEvents(s, dir)
      .drop("total")
      .unpivot(Array($"user_id"), EventTypes.map(col).toArray,
        "event_type", "n_events")
      .filter($"n_events" > 0)
      .orderBy($"user_id", $"event_type")
  }

  val q41Oracle: String =
    """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events
      |FROM events
      |GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- q42

  private val Quantiles = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))

  /** q42 — exact discrete quantiles of `value` per event type: the
    * quantile is the element at sorted rank ⌈p·n⌉, computed with a
    * row_number window — no interpolation, so the emitted double is a
    * raw data value and parity needs no floating-point arithmetic at
    * all (engine `quantile`/`percentile` builtins differ in
    * interpolation and are unusable for exact gates). Ties in `value`
    * don't matter: whichever duplicate takes rank ⌈p·n⌉, the VALUE at a
    * rank is determined by the sorted multiset. One shuffle on the
    * group key; at 100 TB the same statistic comes from a fixed-depth
    * histogram/KLL pass instead of a full sort — this is the exact
    * small-group formulation.
    */
  def q42QuantileDisc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"value")
    val ranked = Tables.events(s, dir)
      .select($"event_type", $"value")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"event_type")))
    ranked.groupBy($"event_type")
      .agg(max($"n").as("n_rows"),
        Quantiles.map { case (name, p) =>
          max(when($"rn" === ceil(lit(p) * $"n"), $"value")).as(name)
        }: _*)
      .orderBy($"event_type")
  }

  val q42Oracle: String = {
    val qs = Quantiles.map { case (name, p) =>
      s"max(CASE WHEN rn = CAST(ceil($p * n) AS BIGINT) THEN value END) AS $name"
    }.mkString(",\n      |  ")
    s"""WITH ranked AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type, CAST(max(n) AS BIGINT) AS n_rows,
      |  $qs
      |FROM ranked
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------- q44

  /** q44 — the navigation/distribution window-function family over each
    * user's event timeline: lag/lead (previous/next event), ntile
    * quartiles, percent_rank, cume_dist. The ordering key (ts, event_id)
    * is a total order, so every output is deterministic, and the two
    * distribution doubles are exact integer ratios ((rank−1)/(n−1),
    * rank/n) that both engines compute identically in IEEE. One shuffle
    * on user_id, one per-partition sort — bounded keys, the canonical
    * analytic-window plan.
    */
  def q44WindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"ts")
      .withColumn("prev_event_id", lag($"event_id", 1).over(w))
      .withColumn("next_event_id", lead($"event_id", 1).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select($"user_id", $"event_id", $"prev_event_id", $"next_event_id",
        $"quartile", $"pr", $"cd")
      .orderBy($"user_id", $"event_id")
  }

  val q44Oracle: String =
    """SELECT user_id, event_id,
      |  lag(event_id, 1) OVER w AS prev_event_id,
      |  lead(event_id, 1) OVER w AS next_event_id,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q45

  /** q45 — set operations: purchasing users EXCEPT erroring users,
    * INTERSECT of the two, and their symmetric difference via
    * union-of-excepts, each tagged and unioned into one result. Spark
    * plans except/intersect as left-anti / left-semi joins over
    * distincts — shuffle-on-key, no materialized sets — which is exactly
    * the 100 TB shape (set membership is a join, never a collected
    * set). The reference has no set ops (§2h); this closes the family
    * alongside its `unionByName` fan-in.
    */
  def q45UserSetops(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    def users(t: String) =
      ev.filter($"event_type" === t).select($"user_id").distinct()
    val buyers = users("purchase")
    val errored = users("error")
    (buyers.except(errored).withColumn("tag", lit("only_purchase")))
      .unionByName(errored.except(buyers).withColumn("tag", lit("only_error")))
      .unionByName(buyers.intersect(errored).withColumn("tag", lit("both")))
      .select($"tag", $"user_id")
      .orderBy($"tag", $"user_id")
  }

  val q45Oracle: String =
    """WITH buyers AS (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      |errored AS (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
      |SELECT 'only_purchase' AS tag, user_id
      |FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errored)
      |UNION ALL
      |SELECT 'only_error', user_id
      |FROM (SELECT user_id FROM errored EXCEPT SELECT user_id FROM buyers)
      |UNION ALL
      |SELECT 'both', user_id
      |FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errored)
      |ORDER BY tag, user_id""".stripMargin

  // ---------------------------------------------------------------- q47

  /** q47 — JSON-path extraction from the semi-structured `props` column
    * without a declared schema: `get_json_object` (path probe) and
    * `json_tuple` (multi-field generator) both pull `$.k`, the values
    * must agree row-by-row (asserted in-plan: mismatches would change
    * `n_agree`), and the extracted ints aggregate per event type. This
    * is the schema-on-read path for payloads too irregular for
    * `from_json` + StructType (which q13 covers); extraction is pure
    * map-side scan work.
    */
  def q47JsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      // json_tuple is a generator: it must be a top-level select item,
      // so extract first and cast in a second projection
      .select($"event_type",
        get_json_object($"props", "$.k").as("s1"),
        json_tuple($"props", "k").as("s2"))
      .select($"event_type",
        $"s1".cast("long").as("k1"), $"s2".cast("long").as("k2"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"k1" === $"k2", 1L).otherwise(0L)).as("n_agree"),
        sum($"k1").cast("long").as("sum_k"),
        min($"k1").as("min_k"),
        max($"k1").as("max_k"),
        countDistinct($"k1").as("distinct_k"))
      .orderBy($"event_type")
  }

  val q47Oracle: String =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) AS BIGINT) AS n_agree,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  min(k) AS min_k, max(k) AS max_k,
      |  CAST(count(DISTINCT k) AS BIGINT) AS distinct_k
      |FROM (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events) t
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q48

  /** q48 — calendar-dimension aggregation: orders rolled up to
    * (year, quarter) with month cardinality, the month-truncated period
    * start, DECIMAL-exact revenue, weekend-order counts, and ISO-week
    * cardinality. Engine numbering conventions differ for day-of-week
    * (Spark `dayofweek` 1=Sunday, DuckDB 0=Sunday) and `weekofyear` is
    * locale-dependent, so both dims are computed from convention-free
    * integer arithmetic identical in the two engines:
    *  - `dow0 = (epoch_days + 4) % 7` (0=Sunday; 1970-01-01 was a
    *    Thursday, hence +4),
    *  - ISO week by the nearest-Thursday rule: shift the date to the
    *    Thursday of its ISO week (`d + (4 - isoDow)` days), then
    *    `week = (dayofyear(thursday) - 1) div 7 + 1` and the ISO year is
    *    that Thursday's calendar year — this IS ISO 8601's Jan-4 rule
    *    (week 1 contains Jan 4 ⟺ week 1's Thursday is in the new year).
    *    Validated against DuckDB's builtin isoyear/weekofyear over the
    *    full orders table. Derived columns are map-side; one two-phase
    *    aggregate on the (year, quarter) key.
    */
  def q48DateDims(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val epochDays = datediff($"o_orderdate", to_date(lit("1970-01-01")))
    val isoDow = pmod(epochDays + 3, lit(7)) + 1 // 1=Monday .. 7=Sunday
    val thu = date_add($"o_orderdate".cast("date"), lit(4) - isoDow)
    Tables.orders(s, dir)
      .select(
        year($"o_orderdate").as("y"),
        quarter($"o_orderdate").as("q"),
        month($"o_orderdate").as("m"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
        pmod(epochDays + 4, lit(7)).as("dow0"),
        (year(thu) * 100 + (floor((dayofyear(thu) - 1) / 7) + 1)).cast("int")
          .as("iso_yearweek"),
        $"o_totalprice")
      .groupBy($"y", $"q")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("revenue"),
        countDistinct($"m").as("n_months"),
        min($"month_start").as("first_month"),
        sum(when($"dow0" === 0 || $"dow0" === 6, 1L).otherwise(0L)).as("weekend_orders"),
        countDistinct($"iso_yearweek").as("n_iso_weeks"))
      .orderBy($"y", $"q")
  }

  val q48Oracle: String =
    """SELECT y, q,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  CAST(count(DISTINCT m) AS BIGINT) AS n_months,
      |  min(month_start) AS first_month,
      |  CAST(sum(CASE WHEN dow0 IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS weekend_orders,
      |  CAST(count(DISTINCT iso_yearweek) AS BIGINT) AS n_iso_weeks
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
      |    CAST(quarter(o_orderdate) AS INTEGER) AS q,
      |    CAST(month(o_orderdate) AS INTEGER) AS m,
      |    strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |    (ed + 4) % 7 AS dow0,
      |    CAST(year(thu) * 100
      |         + (CAST(floor((dayofyear(thu) - 1) / 7) AS INTEGER) + 1)
      |      AS INTEGER) AS iso_yearweek,
      |    o_totalprice
      |  FROM (
      |    SELECT o_orderdate, o_totalprice,
      |      (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS ed,
      |      CAST(o_orderdate AS DATE)
      |        + CAST(4 - ((CAST(o_orderdate AS DATE) - DATE '1970-01-01' + 3) % 7 + 1)
      |            AS INTEGER) AS thu
      |    FROM orders) raw) t
      |GROUP BY y, q
      |ORDER BY y, q""".stripMargin

  // --------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_pivot_events"   -> (q38PivotEvents _),
    "q39_rollup_revenue" -> (q39RollupRevenue _),
    "q41_unpivot_events" -> (q41UnpivotEvents _),
    "q42_quantile_disc"  -> (q42QuantileDisc _),
    "q44_window_analytics" -> (q44WindowAnalytics _),
    "q45_user_setops"    -> (q45UserSetops _),
    "q47_json_extract"   -> (q47JsonExtract _),
    "q48_date_dims"      -> (q48DateDims _))

  val oracles: Map[String, String] = Map(
    "q38_pivot_events"   -> q38Oracle,
    "q39_rollup_revenue" -> q39Oracle,
    "q41_unpivot_events" -> q41Oracle,
    "q42_quantile_disc"  -> q42Oracle,
    "q44_window_analytics" -> q44Oracle,
    "q45_user_setops"    -> q45Oracle,
    "q47_json_extract"   -> q47Oracle,
    "q48_date_dims"      -> q48Oracle)
}
