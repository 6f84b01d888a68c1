package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{AvroCodec, AvroExpressions}

/** Codec-boundary queries: the Avro binary round trip (the reference's
  * scripts 10-13 track) and the multimodal opaque-binary column pattern.
  */
object CodecQueries {

  /** Avro schema for the orders round trip — the registry-style JSON the
    * reference fetches from Apicurio (`10_create_schemas.py:21-33`,
    * `11_incremental_sales_avro.py:98-109`), including a nullable union
    * and a `timestamp-millis` logical long.
    */
  val orderAvroSchema: String =
    """{"type":"record","name":"Order","namespace":"graft","fields":[
      |{"name":"o_orderkey","type":"long"},
      |{"name":"o_custkey","type":["long","null"]},
      |{"name":"o_orderstatus","type":["string","null"]},
      |{"name":"o_totalprice","type":"double"},
      |{"name":"o_orderdate","type":{"type":"long","logicalType":"timestamp-millis"}},
      |{"name":"o_orderpriority","type":["string","null"]}]}""".stripMargin

  /** q20 — Avro round trip (SURVEY F3/F4/S5; ref `12_streaming_enrichment_avro.py:70,110-111`,
    * `13_batch_read_results_avro.py:66-67`): orders rows → `to_avro` binary →
    * `from_avro` struct (schema derived from the Avro JSON via
    * [[AvroCodec.structTypeFor]]) → `data.*` projection. Both codec
    * expressions must execute for any output column to exist, so a hash
    * match against the plain-projection oracle proves the codec is
    * lossless field-by-field. Uses the native Catalyst
    * [[AvroExpressions]] (no `ScalaUDF` in the plan — pinned by
    * AvroCodecSpec); the o_orderdate emits as a formatted string: the
    * logical type is millisecond-precision and the column is
    * day-precision, so the trip is exact. Scale: per-row codec inside
    * whole-stage codegen, no shuffle — scan-throughput bound.
    */
  def q20AvroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // per-row codec is CPU-bound; spread the single-split scan
    val o = Tables.spread(s, Tables.orders(s, dir))
    o.select(struct(o.columns.map(col): _*).as("r"))
      .select(AvroExpressions.fromAvro(
        AvroExpressions.toAvro($"r", orderAvroSchema), orderAvroSchema).as("data"))
      .select($"data.*")
      .select(
        $"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("o_orderdate"),
        $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  val q20Oracle: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
      |  o_orderpriority
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q21 — multimodal opaque-binary column pattern: media payloads are
    * `binary` columns with typed metadata, and the engine's job is byte
    * accounting, fingerprinting, container sniffing, and chunking — never
    * interpreting pixels. `text` cast to binary stands in for the payload
    * (the container ships no image/audio codecs, so the *decode* stage is
    * a deliberate deterministic STUB: `stub_w`/`stub_h` model a decoder's
    * metadata output as pure functions of the bytes; a real deployment
    * swaps only that expression for a native-library call inside the same
    * mapPartitions/expression slot). n_bytes/fingerprint/magic/chunks are
    * the real, portable plumbing. Scale: map-side only; the 256-byte
    * chunk count is the frame-sampling fan-out a video pipeline would
    * explode on, sized so chunk tasks stay within executor memory.
    */
  def q21MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("payload", $"text".cast("binary"))
      .select(
        $"doc_id",
        length($"payload").as("n_bytes"),
        md5($"payload").as("content_md5"),
        hex(substring($"text", 1, 4)).as("magic_hex"),
        ceil(length($"payload") / lit(256.0)).cast("long").as("n_chunks"),
        (length($"payload") % 640).as("stub_w"),
        (length($"payload") % 480).as("stub_h"))
      .orderBy($"doc_id")
  }

  val q21Oracle: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_md5,
      |  hex(substr(text, 1, 4)) AS magic_hex,
      |  CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks,
      |  octet_length(encode(text)) % 640 AS stub_w,
      |  octet_length(encode(text)) % 480 AS stub_h
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_avro_roundtrip"  -> (q20AvroRoundtrip _),
    "q21_multimodal_meta" -> (q21MultimodalMeta _))

  val oracles: Map[String, String] = Map(
    "q20_avro_roundtrip"  -> q20Oracle,
    "q21_multimodal_meta" -> q21Oracle)
}
