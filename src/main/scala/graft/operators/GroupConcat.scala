package graft.operators

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Postgres `group_concat`/`string_agg` as a typed `Aggregator` (SURVEY
  * A6/§2k; ref `sql-scripts/pagila-schema.sql:352-356` defines the custom
  * aggregate, `:483-519` use it in views). q11 covers the same semantics
  * with built-ins (`concat_ws(", ", collect_list(...))` — preferred at
  * scale, it stays codegen'd); this typed Aggregator exists for exact
  * source parity: single-pass partial aggregation (`reduce` map-side,
  * `merge` on shuffle), deterministic output via sort-before-join so the
  * result is independent of partial-merge order.
  */
class GroupConcat(sep: String)
  extends Aggregator[String, ListBuffer[String], String] with Serializable {

  override def zero: ListBuffer[String] = ListBuffer.empty[String]

  override def reduce(buf: ListBuffer[String], a: String): ListBuffer[String] = {
    if (a != null) buf += a
    buf
  }

  override def merge(x: ListBuffer[String], y: ListBuffer[String]): ListBuffer[String] = {
    x ++= y
    x
  }

  /** Sorted before joining: parallel partial aggregation makes arrival
    * order nondeterministic, and Postgres' group_concat is only
    * deterministic under an ORDER BY anyway.
    */
  override def finish(buf: ListBuffer[String]): String =
    buf.sorted.mkString(sep)

  override def bufferEncoder: Encoder[ListBuffer[String]] =
    Encoders.kryo[ListBuffer[String]]

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
