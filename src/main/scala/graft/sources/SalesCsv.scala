package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV source/sink for the reference's sales-record shape (SURVEY S1/S2/K5).
  *
  * Schemas are explicit, never inferred (SURVEY §1). The reference's seed
  * and incremental files spell the timestamp offset two ways —
  * `"2021-05-08 21:21:56.996577 +00:00"` (seed, space before offset,
  * `pyspark/data/sales_seed.csv:2`) vs `"...996577+00"` (incremental,
  * `sales_incremental_small.csv:2`; FIXTURES.md §1) — so the reader
  * parses `payment_date` with `try_to_timestamp` over both patterns and
  * takes the first hit. The writer fixes the reference's dead
  * `.mode("overwrite")`-after-`.csv()` bug (`02_batch_read_kafka.py:100-104`):
  * the mode is applied *before* the save.
  */
object SalesCsv {

  /** The 7-column sales record (`01_seed_sales_kafka.py:36-44`), with
    * payment_date kept as string at ingest exactly like the reference,
    * parsed to timestamp explicitly afterwards.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("payment_id", IntegerType),
    StructField("customer_id", IntegerType),
    StructField("amount", FloatType),
    StructField("payment_date", StringType),
    StructField("city", StringType),
    StructField("district", StringType),
    StructField("country", StringType)))

  /** Offset spellings, in observed-frequency order: seed then incremental. */
  val tsPatterns: Seq[String] = Seq(
    "yyyy-MM-dd HH:mm:ss.SSSSSS XXX", // "2021-05-08 21:21:56.996577 +00:00"
    "yyyy-MM-dd HH:mm:ss.SSSSSSX")    // "2021-05-08 21:21:56.996577+00"

  /** Read a sales CSV with header and the given separator; payment_date
    * is parsed against every known offset spelling (first match wins,
    * unparseable stays null rather than failing the scan).
    */
  def read(spark: SparkSession, path: String, sep: String = "|"): DataFrame = {
    val raw = spark.read
      .schema(rawSchema)
      .option("header", "true")
      .option("sep", sep)
      .csv(path)
    raw.withColumn("payment_date",
      coalesce(tsPatterns.map(p => try_to_timestamp(col("payment_date"), lit(p))): _*))
  }

  /** Write a CSV with header and separator, overwrite semantics applied
    * correctly (SaveMode before save — SURVEY K5's noted reference bug).
    */
  def write(df: DataFrame, path: String, sep: String = "|"): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("sep", sep)
      .csv(path)
}
