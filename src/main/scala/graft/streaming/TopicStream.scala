package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A Kafka-wire-shaped record: what `spark.readStream.format("kafka")`
  * exposes, minus the broker-only columns. The build image has no Kafka
  * connector jar (SURVEY §7), so topics are modeled as anything that
  * yields these three columns — a `MemoryStream[TopicRecord]` in tests,
  * a parquet "topic dump" in batch. The decode/encode transforms below
  * are mode-agnostic: the same code path serves batch and streaming
  * DataFrames, which is how parity tests pin streaming semantics to the
  * batch oracle.
  */
case class TopicRecord(key: String, value: String, timestamp: java.sql.Timestamp)

/** JSON envelope codec for topic-shaped DataFrames (SURVEY F1/F2/F12/P1/P3;
  * ref `02_batch_read_kafka.py:80-82` decode, `06_streaming_read_kafka_kafka.py:98-104`
  * encode with the sha1-derived record key of `06:98`).
  */
object TopicStream {

  /** Event payload schema shared by the streaming jobs (mirrors the
    * `events` testdata table; SURVEY §1 "fixed, explicitly declared —
    * never inferred").
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** JSON timestamps carry microseconds end-to-end (the default ISO
    * millisecond format would silently truncate parquet-derived event
    * times and could move events across window boundaries).
    */
  val jsonOpts: Map[String, String] =
    Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Kafka-wire → typed rows: `CAST(value AS STRING)` + `from_json` +
    * `data.*` expansion, keeping the ingest `timestamp` column
    * (ref `02:80-82`, `03:74-76`).
    */
  def decodeJson(records: DataFrame, schema: StructType = eventSchema): DataFrame =
    records
      .selectExpr("CAST(value AS STRING) AS value", "timestamp")
      .select(from_json(col("value"), schema, jsonOpts).as("data"), col("timestamp"))
      .select("data.*", "timestamp")

  /** Typed rows → Kafka-wire (key, value): sha1 of the grouping column as
    * the stable record key, `to_json(struct(*))` as the value
    * (ref `06:98-104`: `sha1(country)` + `to_json(struct("*"))`).
    */
  def encodeJson(df: DataFrame, keyCol: Column): DataFrame =
    df.select(
      sha1(keyCol.cast("string")).as("key"),
      to_json(struct(df.columns.map(col): _*), jsonOpts).as("value"))
}
