package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic token-budget packing — lay each document stream out in
  * id order and chunk it by CUMULATIVE token offset into fixed-budget
  * bins (the step between corpus prep and batch materialization in a
  * pretraining pipeline: "pack documents into ~N-token training rows").
  * Bin k holds the docs whose start offset falls in `[k·B, (k+1)·B)` —
  * a windowed-prefix-sum spelling of greedy packing that is a pure
  * function of the ordered stream: deterministic, reshard/retry-stable,
  * and expressible identically on DuckDB for the oracle (true first-fit
  * is a sequential recurrence no SQL engine runs in parallel).
  *
  * Scale/skew: the prefix sum serializes each stream through ONE task,
  * so the stream key must never be a whole dominant source — the common
  * 100 TB shape is one crawl holding most of the corpus, which would
  * funnel most of the data through a single window partition. The
  * [[shard]] column fans a source out across [[Shards]] deterministic
  * content-hash sub-streams (the skew operator's fan-out idea applied
  * to a window): bins become per-(stream, shard), which is equally
  * valid packing semantics — every bin is still a deterministic
  * function of content — while bounding any stream's serialized run to
  * ~1/[[Shards]] of its rows. The shard is [[Sampling.hash8]], the 8
  * md5 bits AFTER the 60 the train/val/test split consumes, so shard
  * and split decisions are decorrelated without a second digest. Cost
  * of sharding: ≤ one truncated (under-budget) final bin per
  * (stream, shard) instead of per stream — noise at training scale.
  * Sizing: 16 bounds a worst-case single-source corpus to 16-way
  * parallelism per split; a deployment expecting one source to hold
  * ≥ 1/16 of 100 TB sizes it like [[Skew.adaptiveBuckets]] — shards ≈
  * hottest-stream tokens / healthy-task tokens — but the count must be
  * FIXED per corpus version (it participates in bin identity), so it
  * is a build parameter here, not a runtime sketch.
  *
  * One data shuffle: the window partition on (stream cols, shard); the
  * per-bin groupBy's keys are a superset of the window partition key,
  * so its clustering requirement is met by the exchange already paid
  * (pinned in ExchangeBudgetSpec via q74). The whole operator shuffles
  * (id, source, split, shard, n_tokens) — never text.
  */
object TokenPacking {

  /** Default fan-out of [[shard]]; participates in bin identity, so
    * changing it is a corpus-version change, not a tuning knob.
    */
  val Shards: Int = 16

  /** Deterministic content-hash sub-stream id in `[0, shards)`. */
  def shard(content: Column, shards: Int = Shards): Column =
    Sampling.hash8(content) % shards

  /** DuckDB spelling of [[shard]] over a VARCHAR SQL expression. */
  def duckShard(sqlExpr: String, shards: Int = Shards): String =
    s"(${Sampling.duckHash8(sqlExpr)} % $shards)"

  /** Pack `docs` into fixed-budget bins per distinct `streamCols` value
    * (which should already include a [[shard]] column — see the skew
    * note above). `docs` needs `idCol` (unique, orders the stream) and
    * `tokensCol` (per-doc token count); both shuffle as scalars.
    */
  def pack(
      docs: DataFrame,
      budget: Int,
      streamCols: Seq[String],
      idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val parts = streamCols.map(col)
    val w = Window.partitionBy(parts: _*).orderBy(col(idCol))
    val startOffset = sum(col(tokensCol)).over(w) - col(tokensCol)
    docs
      .withColumn("bin", floor(startOffset / lit(budget)))
      .groupBy(parts :+ col("bin"): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("bin_tokens"),
        min(col(idCol)).as("min_doc_id"),
        max(col(idCol)).as("max_doc_id"))
  }
}
