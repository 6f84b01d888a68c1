package graft.sinks

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.functions.AvroCodec

/** Avro object-container-file (OCF) sink/source (SURVEY K9; ref
  * `s3_sink_connector_debezium_avro_moma.json` `AvroFormat`,
  * `sink_connector_moma_kafka_s3.json` — the topic→Avro-files leg that
  * feeds DeltaStreamer). The spark-avro module is absent from the image,
  * so the container format is driven directly with Avro core's
  * `DataFileWriter`/`DataFileReader`, sharing the row⇄record conversion
  * with [[graft.functions.AvroCodec]].
  *
  * Scale notes: the write is `foreachPartition` — one container file per
  * partition, written executor-side in a single pass, no driver
  * involvement and no shuffle (mirror of `flush.size`-batched connector
  * files). The read lists files on the driver and parallelizes decode
  * one-file-per-task, the same granularity the connector produced. Local
  * filesystem paths only (this build has no object store), which is
  * exactly the reference's `store.url` swapped for `file://`.
  */
object AvroFiles {

  /** Write each partition as `part-NNNNN.avro` under `path`. */
  def write(df: DataFrame, path: String, avroSchemaJson: String): Unit = {
    new File(path).mkdirs()
    val schemaJson = avroSchemaJson
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val schema = new Schema.Parser().parse(schemaJson)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, new File(f"$path/part-$pid%05d.avro"))
        try rows.foreach(r => writer.append(AvroCodec.rowToRecord(r, schema)))
        finally writer.close()
      }
    }
  }

  /** Read every `*.avro` container under `path` back into a DataFrame,
    * one file per task.
    */
  def read(spark: SparkSession, path: String, avroSchemaJson: String): DataFrame = {
    val schemaJson = avroSchemaJson
    val sparkSchema: StructType = AvroCodec.structTypeFor(schemaJson)
    val files = Option(new File(path).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".avro"))
      .map(_.getAbsolutePath)
      .sorted
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .flatMap { f =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new DataFileReader[GenericRecord](
          new File(f), new GenericDatumReader[GenericRecord](schema))
        try reader.iterator().asScala.map(rec => AvroCodec.recordToRow(rec, schema)).toVector
        finally reader.close()
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
