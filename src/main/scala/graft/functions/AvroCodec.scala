package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Row
import org.apache.spark.sql.api.java.{UDF1 => JUdf1}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Avro binary codec for the engine (SURVEY F3/F4/S5). The build image has
  * Avro core (`avro-1.12.1.jar`) but not the spark-avro module, so
  * `from_avro`/`to_avro` are provided as UDFs over
  * `GenericDatumWriter`/`GenericDatumReader` — the plan SURVEY §7 step 2
  * chose (ref `11_incremental_sales_avro.py:76-77`,
  * `12_streaming_enrichment_avro.py:70,110-111`), and
  * `structTypeFor` reproduces the registry-schema → StructType derivation
  * of `11:98-109` directly from the schema JSON instead of the
  * reference's empty-DataFrame round-trip.
  *
  * Scale note: the UDF pair here is the legacy/reference surface (kept
  * for the external-`Row` API the OCF sink shares); the hot path is
  * [[AvroExpressions]] — native Catalyst `AvroEncode`/`AvroDecode`
  * expressions that convert Avro values directly to and from Catalyst
  * internal representations and stay inside whole-stage codegen. All
  * query/stream call sites use the expressions.
  *
  * Type coverage (all the reference's schemas use): null unions,
  * boolean/int/long/float/double/string/bytes/enum, nested records,
  * arrays, and `timestamp-millis` logical longs ↔ Spark TimestampType.
  */
object AvroCodec {

  /** Avro schema JSON → Spark StructType (SURVEY S5). */
  def structTypeFor(avroJson: String): StructType = {
    val schema = new Schema.Parser().parse(avroJson)
    require(schema.getType == Schema.Type.RECORD, "top-level Avro schema must be a record")
    toStructType(schema)
  }

  private def toStructType(record: Schema): StructType =
    StructType(record.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)

  private def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported, got $s")
      val (dt, _) = toSparkType(nonNull.head)
      (dt, branches.size > nonNull.size)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis]) (TimestampType, false)
      else (LongType, false)
    case Schema.Type.FLOAT  => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.ENUM   => (StringType, false)
    case Schema.Type.BYTES  => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType)
      (ArrayType(et, en), false)
    case Schema.Type.RECORD => (toStructType(s), false)
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  // ------------------------------------------------------------------
  // Row ⇄ GenericRecord conversion (shared by the binary UDFs below and
  // the OCF container sink, graft.sinks.AvroFiles)

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Spark Row → Avro GenericRecord under `s` (field lookup by name). */
  def rowToRecord(row: Row, s: Schema): GenericRecord = {
    val rec = new GenericData.Record(s)
    s.getFields.asScala.foreach { f =>
      val idx = row.fieldIndex(f.name())
      val v = if (row.isNullAt(idx)) null else toAvroValue(row.get(idx), f.schema())
      rec.put(f.name(), v)
    }
    rec
  }

  private def toAvroValue(v: Any, s0: Schema): Any = {
    val s = nonNullBranch(s0)
    s.getType match {
      case Schema.Type.LONG if s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis] =>
        v match {
          // TimestampType / TIMESTAMP_NTZ / java8 datetime API all land here
          case t: java.sql.Timestamp => t.getTime
          case t: java.time.Instant => t.toEpochMilli
          case t: java.time.LocalDateTime =>
            t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          case other => throw new IllegalArgumentException(
            s"unsupported timestamp value class: ${other.getClass}")
        }
      case Schema.Type.RECORD => rowToRecord(v.asInstanceOf[Row], s)
      case Schema.Type.ARRAY =>
        v.asInstanceOf[Seq[Any]].map(e => toAvroValue(e, s.getElementType)).asJava
      case Schema.Type.BYTES => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.ENUM =>
        new GenericData.EnumSymbol(s, v.asInstanceOf[String])
      case _ => v
    }
  }

  /** Avro GenericRecord → Spark Row under `s` (schema field order). */
  def recordToRow(rec: GenericRecord, s: Schema): Row =
    Row.fromSeq(s.getFields.asScala.map { f =>
      fromAvroValue(rec.get(f.name()), f.schema())
    }.toSeq)

  private def fromAvroValue(v: Any, s0: Schema): Any = {
    if (v == null) return null
    val s = nonNullBranch(s0)
    s.getType match {
      case Schema.Type.LONG if s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis] =>
        new java.sql.Timestamp(v.asInstanceOf[Long])
      case Schema.Type.RECORD => recordToRow(v.asInstanceOf[GenericRecord], s)
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala
          .map(e => fromAvroValue(e, s.getElementType)).toSeq
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
      case Schema.Type.STRING | Schema.Type.ENUM =>
        v match { case u: Utf8 => u.toString; case other => other.toString }
      case _ => v
    }
  }

  /** Serializable per-executor codec; the Avro Schema is re-parsed lazily
    * on each executor from the captured JSON (Schema equality across JVMs
    * without relying on Java serialization of parser state).
    */
  private class Codec(json: String) extends Serializable {
    @transient private lazy val schema: Schema = new Schema.Parser().parse(json)
    @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
    // Encoder/decoder + output buffer reused per thread: a fresh
    // binaryEncoder allocates its internal buffer per call, which at
    // row granularity is one short-lived allocation per record — pure
    // GC pressure in the scan hot path.
    @transient private lazy val outTl =
      ThreadLocal.withInitial[ByteArrayOutputStream](() => new ByteArrayOutputStream())
    @transient private lazy val encTl =
      new ThreadLocal[org.apache.avro.io.BinaryEncoder]()
    @transient private lazy val decTl =
      new ThreadLocal[org.apache.avro.io.BinaryDecoder]()

    def encode(row: Row): Array[Byte] = {
      val out = outTl.get()
      out.reset()
      val enc = EncoderFactory.get().binaryEncoder(out, encTl.get())
      encTl.set(enc)
      writer.write(rowToRecord(row, schema), enc)
      enc.flush()
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Row = {
      val dec = DecoderFactory.get().binaryDecoder(bytes, decTl.get())
      decTl.set(dec)
      recordToRow(reader.read(null, dec), schema)
    }
  }

  /** `to_avro`-equivalent: a struct column → Avro binary (SURVEY F4).
    * Kept only as [[graft.AvroBench]]'s comparison baseline and a spec
    * subject — every engine query path uses the ~3.6× faster Catalyst
    * expression (pinned by AvroUdfRetirementSpec + the q20 plan
    * assertion).
    */
  @deprecated("use the codegen Catalyst expression AvroExpressions.toAvro; " +
    "this per-row UDF pair survives only as AvroBench's baseline", "round 7")
  def toAvroUdf(avroJson: String): UserDefinedFunction = {
    val codec = new Codec(avroJson)
    udf(new JUdf1[Row, Array[Byte]] {
      override def call(r: Row): Array[Byte] = if (r == null) null else codec.encode(r)
    }, BinaryType)
  }

  /** `from_avro`-equivalent: Avro binary → struct column (SURVEY F3).
    * `permissive = true` mirrors spark-avro's PERMISSIVE parse mode:
    * malformed records decode to null instead of failing the task —
    * the right default for 100 TB ingestion where one corrupt topic
    * record must not kill the job. Default is FAILFAST (strict), like
    * the reference's pipelines.
    *
    * Deprecated like [[toAvroUdf]]: engine paths use
    * [[AvroExpressions.fromAvro]] (codegen, no Row round trip).
    */
  @deprecated("use the codegen Catalyst expression AvroExpressions.fromAvro; " +
    "this per-row UDF pair survives only as AvroBench's baseline", "round 7")
  def fromAvroUdf(avroJson: String, permissive: Boolean = false): UserDefinedFunction = {
    val codec = new Codec(avroJson)
    udf(new JUdf1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row =
        if (b == null) null
        else if (permissive)
          try codec.decode(b) catch { case _: Exception => null }
        else codec.decode(b)
    }, structTypeFor(avroJson))
  }
}
