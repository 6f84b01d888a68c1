package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-message-transform (SMT) library — the Kafka Connect transforms the
  * reference configures declaratively, re-expressed as composable
  * `DataFrame => DataFrame` functions (SURVEY.md §2c P9-P12).
  *
  * Each transform is a narrow projection: no shuffle, survives whole-stage
  * codegen, and composes with `Dataset.transform`. At 100 TB these run
  * map-side inside the scan stage for free.
  *
  * Reference evidence:
  *  - ValueToKey + ExtractField:
  *    `kafka-connect-image/config/jdbc_source_connector_postgresql_01.json`
  *    (`transforms.createKey`, `transforms.extractInt`)
  *  - InsertField (static + topic):
  *    same file (`InsertTopic`, `InsertSourceDetails`);
  *    `s3_sink_connector_02.json` (`insertStaticField1..3`)
  *  - ReplaceField rename: `s3_sink_connector_02.json`
  *    (`transforms.RenameField.renames`: `district:state_province`)
  *  - Debezium ExtractNewRecordState:
  *    `debezium_avro_source_connector_postgresql_06.json`
  *    (`transforms.unwrap.*`, `delete.handling.mode=rewrite`,
  *    `add.fields=op,db,table,schema,lsn,source.ts_ms`)
  */
object Smt {

  /** ValueToKey + ExtractField.Key: promote a value field to the record key
    * as a string (Kafka keys are strings/bytes on the wire).
    */
  def valueToKey(field: String, keyCol: String = "key")(df: DataFrame): DataFrame =
    df.withColumn(keyCol, col(field).cast("string"))

  /** InsertField SMT: inject static metadata fields (message_topic,
    * message_source, environment, ...).
    */
  def insertFields(fields: (String, String)*)(df: DataFrame): DataFrame =
    fields.foldLeft(df) { case (d, (name, value)) => d.withColumn(name, lit(value)) }

  /** ReplaceField SMT rename list (`old:new` pairs). */
  def renameFields(renames: (String, String)*)(df: DataFrame): DataFrame =
    df.withColumnsRenamed(renames.toMap)

  /** ReplaceField SMT exclude/include (field drop/projection). */
  def excludeFields(fields: String*)(df: DataFrame): DataFrame =
    df.drop(fields: _*)

  /** Debezium ExtractNewRecordState: unwrap a CDC envelope
    * `struct(before, after, source, op, ts_ms)` into a flat row carrying the
    * after-image plus `__`-prefixed metadata, with `delete.handling.mode =
    * rewrite` semantics (`__deleted` flag instead of dropping tombstones).
    * Delete events have `after = null`, so the flat columns come from
    * `before` for deletes — matching Debezium's rewrite mode, which emits the
    * last-known state with `__deleted=true`.
    */
  def debeziumUnwrap(envelope: Column = col("envelope"))(df: DataFrame): DataFrame = {
    val image = when(envelope("op") === "d", envelope("before"))
      .otherwise(envelope("after"))
    df.withColumn("__image", image)
      .withColumn("__op", envelope("op"))
      .withColumn("__source_ts_ms", envelope("ts_ms"))
      .withColumn("__deleted", when(envelope("op") === "d", lit("true")).otherwise(lit("false")))
      .select(col("__image.*"), col("__op"), col("__source_ts_ms"), col("__deleted"))
  }
}
