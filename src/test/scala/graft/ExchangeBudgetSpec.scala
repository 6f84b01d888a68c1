package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shuffle-budget fence: each pinned batch gate's physical plan carries
  * a MAXIMUM number of shuffle exchanges. Every `Exchange` is a full
  * network + disk round of the data — at 100 TB the difference between
  * 2 and 3 shuffles in a hot query is hours — so a future edit that
  * accidentally adds one (a lost bucketed layout, a dropped partial
  * aggregation, a join reorder that breaks co-partitioning) must fail
  * loudly by name, not surface as a silent slowdown in some later
  * round's bench.
  *
  * Budgets are pinned from the CURRENT audited plans (AQE off, broadcast
  * on auto — the static planner's shape; AQE can only merge/skip
  * exchanges at runtime, never add them). Queries with side-effecting
  * builders (table writes, eager iterative jobs) are left to their own
  * plan specs.
  */
class ExchangeBudgetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // fence the static plan
      .config("spark.ui.enabled", "false")
      .appName("exchange-budget-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // gate -> max shuffle exchanges in the static physical plan, pinned to
  // the EXACT measured counts of the current audited plans
  private val budgets: Seq[(String, Int)] = Seq(
    "q01_pricing_summary" -> 2,    // partial/final agg + output sort
    "q02_top_nation_revenue" -> 2, // joins all broadcast: agg + sort only
    "q03_latest_event_per_user" -> 2, // window partition + output sort
    "q05_sliding_window_sales" -> 2,  // windowed agg + output sort
    "q14_dedup_exact" -> 2,        // digest groupBy reused by survivor agg
    "q16_neardup_lsh" -> 4,        // (band,key) shuffle + candidate join + confirm
    "q27_simhash_neardup" -> 1,    // banded self-join broadcasts: one sort
    "q31_topk_native" -> 2,        // map-side-truncated top-k + output sort
    "q36_kmv_distinct" -> 5,       // distinct + top-k + sketch/exact join
    "q43_top_terms" -> 4)          // tf/df aggs + native top-k + sort

  test("no pinned gate's static plan exceeds its shuffle budget") {
    val over = budgets.flatMap { case (name, budget) =>
      val df = SparkEntry.queries(name)(spark, sf)
      val n = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }.size
      if (n > budget) Some(s"$name: $n exchanges > budget $budget") else None
    }
    assert(over.isEmpty, over.mkString("; "))
  }
}
