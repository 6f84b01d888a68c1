package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal latest-at-or-before) join — the time-series enrich
  * operator Spark has no built-in for: every left row is decorated with
  * the payload of the latest right row whose timestamp is ≤ the left
  * row's, within the same key (nulls when no right row precedes it).
  *
  * Spark-first formulation: no per-row range probe and no join at all —
  * the two sides UNION into one frame (right rows sorting before left
  * rows at equal timestamps, so "at-or-before" is inclusive), one window
  * partitioned by key and ordered by (ts, side, seq) carries the last
  * non-null payload forward, and left rows are filtered back out. That is
  * one shuffle on the key and one ordered pass — the co-partitioned
  * merge every distributed as-of implementation reduces to. At 100 TB
  * the shuffle carries each side once (payload columns only on right
  * rows), there is no N×M candidate blow-up, and per-key skew behaves
  * exactly like the equivalent aggregation's.
  */
object AsOf {

  /** `left` enriched with `payloadCols` of the latest `right` row with
    * `right.tsCol <= left.tsCol` per `keys`.
    *
    * Requirements: both sides carry `keys`, `tsCol`, and `seqCol` (a
    * per-side tiebreaker making (ts, seq) a total order — among right
    * rows sharing a timestamp the highest `seqCol` wins); `payloadCols`
    * exist on `right` and collide with nothing on `left`.
    */
  def joinLatest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      seqCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightSchema = right.select(payloadCols.map(col): _*).schema
    val leftSide = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        payloadCols.zip(rightSchema).map { case (c, f) =>
          lit(null).cast(f.dataType).as(c)
        }: _*)
    val rightOnly = leftCols.filterNot(c =>
      keys.contains(c) || c == tsCol || c == seqCol)
    val rightSide = right
      .withColumn("__side", lit(0))
      .select((leftCols.map(c =>
        if (rightOnly.contains(c)) lit(null).cast(left.schema(c).dataType).as(c)
        else col(c)) :+ col("__side")) ++ payloadCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col(seqCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = leftSide.unionByName(rightSide)
      .select((leftCols.map(col) :+ col("__side")) ++
        payloadCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    carried.filter(col("__side") === 1).drop("__side")
  }
}
