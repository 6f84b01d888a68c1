package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.{TopKColumnPruningRule, TopKMode, TopKPerKeyApi, TopKStrategy}

/** Native top-k-per-key — the engine's custom whole-operator Catalyst
  * extension (logical node + planner strategy + physical exec, see
  * [[org.apache.spark.sql.graftbridge.TopKPerKey]]).
  *
  * Semantics: `perKey(df, keys, order, k)` ≡
  * `df.withColumn("rn", row_number().over(Window.partitionBy(keys)
  * .orderBy(order))).filter($"rn" <= k).drop("rn")` — minus the rank
  * column, minus the full shuffle-and-sort. The window form moves every
  * candidate row to its key's partition and sorts it; the native form
  * truncates to k rows per key on the map side first (top-k is
  * associative), so the exchange input is bounded by k·partitions per
  * key and no sort ever happens. The per-partition state is one k-bounded
  * heap per locally-observed key — with a bounded key space (queries,
  * users, buckets) this is the plan that survives a 100× candidate
  * blow-up; with per-key candidate skew it also removes the single-key
  * straggler sort.
  *
  * Registered for SQL-less use through `graft.GraftExtensions`
  * (injectPlannerStrategy); [[perKey]] additionally self-registers the
  * strategy through the public `experimental.extraStrategies` hook so the
  * operator works in sessions built without the extension.
  */
object TopK {

  /** First k rows of each `keys` group under `order` (use `.desc`/`.asc`
    * column wrappers; bare columns sort ascending). Output order within a
    * key is unspecified — sequence downstream, as with any aggregate.
    */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    register(df)
    TopKPerKeyApi.topKPerKey(df, keys, order, k)
  }

  /** All rows whose `rank()` (ties share a rank, gaps after) — or
    * `dense_rank()` when `dense` — over the per-key order is ≤ k.
    * Boundary ties are KEPT, so group output size is data-dependent:
    * exactly the ranking functions' semantics, without the full
    * shuffle-and-sort window plan.
    */
  def rankPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
      dense: Boolean = false): DataFrame = {
    register(df)
    TopKPerKeyApi.topKPerKey(df, keys, order, k,
      if (dense) TopKMode.DenseRank else TopKMode.Rank)
  }

  private def register(df: DataFrame): Unit = {
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    // extraOptimizations run as a post-hoc batch (after the main operator
    // optimization), so in this self-registered path the pruning rule's
    // inserted Project reaches the scan only via PhysicalOperation when
    // the child is scan-adjacent; the GraftExtensions path interleaves
    // with ColumnPruning and pushes through arbitrary subtrees.
    if (!exp.extraOptimizations.contains(TopKColumnPruningRule))
      exp.extraOptimizations = exp.extraOptimizations :+ TopKColumnPruningRule
  }
}
