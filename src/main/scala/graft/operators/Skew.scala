package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins — the manual fallback for the cases
  * AQE's runtime skew-join split cannot reach (streaming micro-batches,
  * skewed aggregations feeding a join, forced shuffle plans).
  *
  * Shape: the large (skewed) side gets a deterministic salt in
  * `[0, buckets)` derived from a caller-chosen discriminator column, so
  * one hot key fans out across `buckets` shuffle partitions; the small
  * side is replicated once per salt value. The join key becomes
  * (key..., salt), and the result is row-identical to the unsalted join
  * — replication × discrimination cancel exactly.
  *
  * Cost model at 100 TB: replication multiplies the small side by
  * `buckets` (keep it broadcast-small × a one-digit factor), and buys a
  * `buckets`-way split of the hot key's shuffle partition — choose
  * `buckets ≈ hot-key rows / healthy-partition rows`.
  */
object Skew {

  /** @param large      skewed fact side
    * @param small      dimension side (gets replicated `buckets`×)
    * @param keys       equi-join key column names
    * @param discriminator large-side column with per-row variety (a row
    *                      id, event id …) — hashed into the salt; must
    *                      NOT be constant within the hot key or the salt
    *                      does nothing
    * @param buckets    salt fan-out
    * @param joinType   inner or left_outer (right/full would need the
    *                   salt on the other side)
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      discriminator: Column,
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(joinType == "inner" || joinType == "left_outer",
      s"salt lives on the large side; $joinType is not supported")
    val l = large.withColumn("__salt", pmod(hash(discriminator), lit(buckets)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
