package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-based CDC: the Kafka Connect JDBC source's high-watermark
  * polling model (SURVEY S7; ref
  * `kafka-connect-image/config/jdbc_source_connector_postgresql_00.json`
  * `"mode":"timestamp"` on `last_update`, `_02.json`
  * `"mode":"timestamp+incrementing"` on (`last_update`, `address_id`)).
  *
  * Each [[poll]] emits exactly the rows strictly beyond the current
  * watermark and advances it to the max seen — the connector's offset
  * commit. `timestamp+incrementing` mode uses the (ts, id) lexicographic
  * pair, which is what makes the poll gap-free when many rows share one
  * timestamp: a crash between polls re-reads nothing and skips nothing,
  * because the watermark is the total-order position of the last emitted
  * row.
  *
  * Scale notes: the predicate is a plain column comparison, so it pushes
  * down to the store (PushedFilters against parquet here; a real JDBC
  * dialect turns it into the connector's `WHERE last_update > ?` — the
  * generated incremental scan reads only the tail, never the table.
  * State is one tiny watermark tuple, checkpointable anywhere.
  */
class IncrementalSource(
    load: () => DataFrame,
    tsCol: String,
    idCol: Option[String] = None) {

  /** (last ts value, last id) — the committed connector offset. The ts is
    * kept as the raw column value (Timestamp or LocalDateTime for NTZ)
    * so the poll predicate compares the column to a SAME-TYPE literal: a
    * function-wrapped column (`unix_micros(ts) > n`) or a cross-type
    * compare would defeat filter pushdown and turn every poll into a
    * full scan.
    */
  @volatile private var watermark: Option[(Any, Long)] = None

  def currentWatermark: Option[(Any, Long)] = watermark

  private def beyond(w: (Any, Long)): Column = {
    val ts = col(tsCol)
    idCol match {
      case Some(id) => // timestamp+incrementing: strict (ts, id) order
        (ts > lit(w._1)) || (ts === lit(w._1) && col(id) > w._2)
      case None => ts > lit(w._1)
    }
  }

  /** The incremental scan the next [[poll]] will materialize: source
    * filtered to rows strictly past the current watermark. Exposed
    * unexecuted so callers (and the spec) can verify the predicate
    * reaches the store (`PushedFilters`) — [[poll]] checkpoints it, so
    * its own returned plan is a snapshot scan.
    */
  def pendingBatch: DataFrame =
    watermark.map(w => load().filter(beyond(w))).getOrElse(load())

  /** One connector poll: rows strictly past the watermark, in order;
    * advances the watermark to the last emitted position.
    *
    * The batch is materialized exactly once (`localCheckpoint`) and both
    * the emitted rows and the committed watermark derive from that single
    * snapshot — if the underlying store grows between the plan and the
    * caller's action, the new rows belong to the NEXT poll. Running the
    * scan twice (once for the watermark, once lazily for the caller)
    * would let the two executions disagree and re-emit rows.
    */
  def poll(): DataFrame = {
    val batch = pendingBatch.localCheckpoint()
    val head = batch
      .select(col(tsCol).as("__ts"),
        idCol.map(col).getOrElse(lit(Long.MinValue)).cast("long").as("__id"))
      .orderBy(desc("__ts"), desc("__id"))
      .limit(1).collect()
    if (head.nonEmpty) watermark = Some((head(0).get(0), head(0).getLong(1)))
    batch
  }
}
