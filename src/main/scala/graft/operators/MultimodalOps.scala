package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Opaque-binary ("multimodal") column operators: media payloads are
  * `binary` columns with typed metadata; the engine's job is byte-level
  * plumbing — chunking/frame-sampling fan-out and batched decode — never
  * pixel interpretation (q21 covers the metadata pass; this file covers
  * the fan-out and the decode boundary).
  *
  * The decode stage is a deliberate deterministic STUB: this container
  * ships no image/audio codecs, so [[decodeStub]] models a decoder's
  * output as pure functions of the bytes. The batched `mapPartitions`
  * shape — accumulate a bounded batch, hand the whole batch across the
  * boundary, emit one row per input in order — is exactly the shape a
  * Pandas-UDF/`mapInPandas` or JNI decoder needs, so a real deployment
  * swaps only the body of `decodeBatch`.
  */
object MultimodalOps {

  /** Frame-sampling fan-out: explode a binary payload into fixed-size
    * chunks, `(chunk_idx, chunk)` per row. Pure map-side expression
    * (binary `substring` — no copy of the whole payload per chunk at the
    * codegen level); at 100 TB this is the row multiplier a video
    * pipeline shuffles on, so `chunkBytes` is the knob that bounds
    * per-task memory.
    */
  def chunk(payload: Column, chunkBytes: Int): Column =
    transform(
      sequence(lit(0), greatest(ceil(length(payload) / lit(chunkBytes.toDouble)).cast("int") - 1, lit(0))),
      i => struct(i.as("chunk_idx"),
        substring(payload, i * chunkBytes + 1, lit(chunkBytes)).as("chunk")))

  /** Explode a DataFrame's payload column into one row per chunk,
    * keeping the id column: (id, chunk_idx, chunk, n_chunks).
    */
  def chunked(df: DataFrame, idCol: String, payloadCol: String, chunkBytes: Int): DataFrame =
    df.select(col(idCol), posexplode_outer(chunk(col(payloadCol), chunkBytes)))
      .select(col(idCol), col("col.chunk_idx"), col("col.chunk"))
      .filter(col("chunk").isNotNull)

  /** The stubbed per-batch decoder: one output tuple per input payload,
    * in input order — (width, height, fnv64 checksum). Deterministic pure
    * function of the bytes; the swap-in point for a native decoder.
    */
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[(Int, Int, Long)] =
    payloads.map { bytes =>
      val ck = bytes.foldLeft(-3750763034362895579L)((h, b) => (h ^ (b & 0xffL)) * 1099511628211L)
      (bytes.length % 640, bytes.length % 480, ck)
    }

  /** Batched decode over (id, payload) rows: `mapPartitions` groups each
    * partition's rows into bounded batches (the `mapInPandas` batch
    * shape), crosses the decode boundary once per batch, and re-attaches
    * results positionally. Output preserves one-row-per-input and input
    * order within partitions; `batchSize` bounds the bytes held across
    * the boundary per task.
    */
  def decodeStub(
      ds: Dataset[(Long, Array[Byte])],
      batchSize: Int = 64): Dataset[(Long, Int, Int, Long)] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val metas = decodeBatch(batch.map(_._2))
        batch.lazyZip(metas).map { case ((id, _), (w, h, ck)) => (id, w, h, ck) }
      }
    }
  }
}
