package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Batch sinks mirroring the reference's Kafka-Connect S3 sinks and
  * console outputs (SURVEY K1/K3/K6/K7/K8).
  */
object Sinks {

  /** K8 — the S3 Parquet sink with field partitioning and gzip
    * (`kafka-connect-image/config/s3_sink_connector_02.json`:
    * `ParquetFormat` + `parquet.codec=gzip` + `FieldPartitioner` on
    * `country`): hive-style `col=value/` directories, so downstream
    * scans with a predicate on the partition column prune whole
    * directories — the partition-pruning story the lake layout exists
    * for. At 100 TB choose a partition column with bounded cardinality
    * (country-like, not key-like) so file counts stay manageable.
    */
  def parquetPartitioned(
      df: DataFrame, path: String, partitionCol: String,
      codec: String = "gzip"): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .option("compression", codec)
      .parquet(path)

  /** K7 — the S3 JSON sink (`s3_sink_connector_00.json`, `JsonFormat`). */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** K1 — topic-dump append: the batch Kafka producer modeled as an
    * append-only parquet dir of (key, value, timestamp) rows
    * (`01_seed_sales_kafka.py:74-80`; see also the streaming twin in
    * [[graft.streaming.StreamJobs.startTopicSink]]).
    */
  def topicAppend(records: DataFrame, path: String): Unit =
    records.write.mode(SaveMode.Append).parquet(path)

  /** K3/K6 — console inspection (`02_batch_read_kafka.py:93-98` numRows +
    * truncate=False; `13:28` show(100)).
    */
  def console(df: DataFrame, numRows: Int = 25): Unit =
    df.show(numRows, truncate = false)
}
