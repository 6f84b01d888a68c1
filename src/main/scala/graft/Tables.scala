package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * All tables are single parquet files under the per-scale-factor
  * testdata directories (e.g. `/root/testdata/sf0.01`).
  * Only the fixed-cardinality dims (`region`=5, `nation`=25) are safe to
  * broadcast unconditionally. `supplier`, `part`, and `customer` scale
  * linearly with SF (customer ≈ 150k×SF rows → billions at 100 TB), so
  * their join strategy is left to AQE; fact tables (`lineitem`, `orders`,
  * `events`, `documents`, `embeddings`) must always stay distributed.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 only
    * reads as a nanosecond LongType behind the legacy flag. Normalize to
    * TimestampType (microseconds) with integral `div` — ns-since-epoch
    * (~1.7e18) exceeds double precision, so the division must never go
    * through a float. DuckDB's CAST(ts AS TIMESTAMP) truncates ns→us the
    * same way, so oracles stay comparable.
    *
    * NOTE: `nanosAsLong` is session-global and the flag must be live when
    * the scan's schema is resolved, so it cannot be scoped per-read. Any
    * session that loads `events` therefore reads *other* TIMESTAMP(NANOS)
    * parquet as LongType too. None of the testdata tables besides `events`
    * carry nanos, so this is benign here, but long-lived sessions mixing
    * sources should set the flag at build time instead (Bench/Verify do).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Deterministic N× replica of the RAW events dump (ts stays the nanos
    * long — read under the session's `nanosAsLong`): event_id AND user_id
    * shift per shard, so DISTINCT USERS scale with the data — the
    * dimension that grows state for windows, sketches, sessions, and
    * state backends. Shared by ScaleProbe's fixture and StreamBench so
    * the two scale stories can never drift apart.
    */
  def shardedEvents(s: SparkSession, dir: String, shards: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val ev = apply(s, dir, "events")
    (0 until shards).map { k =>
      ev.withColumn("event_id", ev("event_id") + lit(k * 1000000000000L))
        .withColumn("user_id", ev("user_id") + lit(k * 100000000L))
    }.reduce(_ unionByName _)
  }

  /** Spread a CPU-bound per-row stage across cores when the scan
    * under-partitions (the testdata tables are single parquet splits, so
    * map-heavy chains would otherwise run one-core). Guarded: at
    * production scale inputs have plenty of splits and this is a no-op —
    * it never reshuffles data that is already parallel.
    */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
