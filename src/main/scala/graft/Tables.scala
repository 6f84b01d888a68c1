package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * All tables are single parquet files under the per-scale-factor
  * testdata directories (e.g. `/root/testdata/sf0.01`).
  * Only the fixed-cardinality dims (`region`=5, `nation`=25) are safe to
  * broadcast unconditionally. `supplier`, `part`, and `customer` scale
  * linearly with SF (customer ≈ 150k×SF rows → billions at 100 TB), so
  * their join strategy is left to AQE; fact tables (`lineitem`, `orders`,
  * `events`, `documents`, `embeddings`) must always stay distributed.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** Normalize an events-shaped frame's `ts` column to TimestampType
    * (µs, session-tz UTC) from whichever physical spelling the file
    * carries — the driver's testdata has shipped it two ways across
    * rounds, and self-written fixtures add a third:
    *  - parquet TIMESTAMP(NANOS), read as a nanosecond LongType behind
    *    `spark.sql.legacy.parquet.nanosAsLong`: integral `div` to µs —
    *    ns-since-epoch (~1.7e18) exceeds double precision, so the
    *    division must never go through a float;
    *  - TIMESTAMP_NTZ (isAdjustedToUTC=false µs, the current testdata):
    *    cast — under the UTC session the instant is unchanged;
    *  - TimestampType already (our own normalized fixture writes): no-op.
    * DuckDB's `CAST(ts AS TIMESTAMP)` lands on the same µs value for all
    * three, so oracles are spelling-invariant.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** NOTE: `nanosAsLong` is session-global and must be live when a
    * nanos-spelled scan's schema is resolved, so it cannot be scoped
    * per-read; it is inert for the µs spellings. Set defensively so a
    * legacy-spelled events file never aborts the read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(apply(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Deterministic N× replica of the events dump, ts normalized to
    * TimestampType ([[normalizeTs]] — fixture writes then carry plain µs
    * and read back spelling-stably): event_id AND user_id shift per
    * shard, so DISTINCT USERS scale with the data — the dimension that
    * grows state for windows, sketches, sessions, and state backends.
    * Shared by ScaleProbe's fixture and StreamBench so the two scale
    * stories can never drift apart.
    */
  def shardedEvents(s: SparkSession, dir: String, shards: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    // crossJoin against a shard range instead of an N-branch union: same
    // row set, but the plan stays CONSTANT-size, so a 1000× replica (the
    // recovery decade probe) doesn't stall the analyzer on a 1000-way
    // Union tree
    val ev = events(s, dir)
    val k = s.range(shards).select(col("id").as("_k"))
    ev.crossJoin(k)
      .withColumn("event_id", col("event_id") + col("_k") * lit(1000000000000L))
      .withColumn("user_id", col("user_id") + col("_k") * lit(100000000L))
      .drop("_k")
  }

  /** Deterministic N× replica of the documents table (seedless): doc_id
    * shifts per shard; TEXT is per-shard `translate`d through a
    * composite two-alphabet rotation — a bijective character map
    * preserves length, token boundaries, and the WITHIN-shard duplicate/
    * near-duplicate structure exactly, while making cross-shard copies
    * of the same document dissimilar, so dedup/near-dup work grows
    * linearly with data instead of every doc gaining N−1 artificial
    * near-dups (which would measure a quadratically harder problem, not
    * an N× bigger one). Distinct for every shard k < 100: "a..j" rotates
    * by k mod 10 and "k..t" by k/10, so no two shards share a mapping.
    * Shared by ScaleProbe's corpus fixtures and StreamBench's admission
    * subject so the two scale stories can never drift apart.
    */
  def shardedDocuments(s: SparkSession, dir: String, shards: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, translate}
    require(shards <= 100, "the composite rotation is distinct for k < 100")
    val a1 = "abcdefghij"; val a2 = "klmnopqrst"
    def rot(a: String, r: Int): String = a.drop(r % 10) + a.take(r % 10)
    val docs = documents(s, dir)
    (0 until shards).map { k =>
      docs.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        (if (k == 0) col("text")
         else translate(col("text"), a1 + a2, rot(a1, k % 10) + rot(a2, k / 10)))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
  }

  /** Deterministic N× replica of the embeddings table (seedless):
    * vec_id shifts per shard; each shard's VECTORS go through a
    * per-shard isometry — a cyclic rotation of the coordinates plus,
    * for odd shards, a global negation. Both preserve every pairwise
    * dot product and norm WITHIN a shard exactly (the same permutation/
    * sign applied to both operands cancels), so within-shard near-dup
    * structure is replicated bit-faithfully, while cross-shard copies
    * of the same vector decorrelate (different rotations) or invert
    * (negation) — semantic-dedup work grows linearly with data instead
    * of quadratically. The (negate, rotation) pair is distinct for
    * every shard k < 2·dim (dim = 64 ⇒ k < 128, above the 100-shard
    * cap the doc rotation already imposes).
    */
  def shardedEmbeddings(s: SparkSession, dir: String, shards: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    require(shards <= 100, "the (negate, rotation) isometry is distinct for k < 128")
    val emb = embeddings(s, dir)
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    (0 until shards).map { k =>
      val rot = (k / 2) % dim
      val rolled =
        if (rot == 0) col("embedding")
        else concat(
          slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), 1, rot))
      val vec = if (k % 2 == 1) transform(rolled, x => -x) else rolled
      emb.select(
        (col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        vec.as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
  }

  /** Spread a CPU-bound per-row stage across cores when the scan
    * under-partitions (the testdata tables are single parquet splits, so
    * map-heavy chains would otherwise run one-core). Guarded: at
    * production scale inputs have plenty of splits and this is a no-op —
    * it never reshuffles data that is already parallel.
    */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
