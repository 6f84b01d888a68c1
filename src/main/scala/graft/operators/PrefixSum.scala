package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT per-key running total — the textbook two-phase
  * scan, spelled in DataFrames: a plain
  * `sum(v) over (partition by key order by ord)` funnels each key's
  * entire stream through ONE task, which is precisely the skew failure
  * mode a dominant key hits at 100 TB (one crawl holding most of a
  * corpus serializes the whole corpus). Here instead:
  *
  *  1. range-partition on `(key, ord)` — each key's stream is cut into
  *     contiguous runs across many tasks, a dominant key simply owning
  *     more of them;
  *  2. per-(physical partition, key) local prefix sums — parallel in
  *     the number of runs;
  *  3. a per-run totals frame (≤ partitions × keys rows — KILOBYTES,
  *     independent of data size), whose own prefix sum gives each run
  *     its starting offset;
  *  4. broadcast the offsets back and add.
  *
  * The result is exactly the per-key running total over the `(ord)`
  * order and — load-bearing for determinism — INDEPENDENT of where the
  * range boundaries fall: a running total over a strict total order is
  * invariant to how the order is cut into contiguous runs, so
  * re-shards, retries, and range-sampling differences can never change
  * a value. Callers must pass `orderCols` that are unique per row
  * within a key (append a unique id as the tiebreaker) — a non-strict
  * order would make "running" itself ill-defined under re-partitioning.
  *
  * Cost: two data shuffles (range + the window's hash on (run, key))
  * against the serial spelling's one — the classic latency-for-skew
  * trade, worth it exactly when a key can dominate. Everything
  * shuffled is scalar (key, ord, value); the totals/offsets side is
  * broadcast-joined, never a third data shuffle.
  */
object PrefixSum {

  /** Adds `outCol` = the inclusive per-`keyCols` running `sum(valueCol)`
    * over `orderCols` (which must form a strict total order per key).
    */
  def runningTotal(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      outCol: String = "running_total"): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "need key and order columns")
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val ranged = df
      .repartitionByRange(n, (keyCols ++ orderCols).map(col): _*)
      .withColumn("_run", spark_partition_id())
    val localW = Window
      .partitionBy(("_run" +: keyCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val local = ranged.withColumn("_local", sum(col(valueCol)).over(localW))
    // ≤ partitions × keys rows: the only cross-run coordination, and it
    // is data-size independent — the scan's "carry" in kilobyte space
    val offsetW = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_run"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(("_run" +: keyCols).map(col): _*)
      .agg(sum(col(valueCol)).as("_runTotal"))
      .withColumn("_offset", coalesce(sum(col("_runTotal")).over(offsetW), lit(0)))
      .select(("_run" +: keyCols).map(col) :+ col("_offset"): _*)
    local
      .join(broadcast(offsets), "_run" +: keyCols)
      .withColumn(outCol, col("_local") + col("_offset"))
      .drop("_run", "_local", "_offset")
  }
}
