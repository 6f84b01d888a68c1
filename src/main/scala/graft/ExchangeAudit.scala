package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Shuffle-exchange audit: prints `gate -> static-plan shuffle count`
  * for every batch gate (streaming-harness gates excluded — their
  * builders run a full streaming query). The numbers feed
  * ExchangeBudgetSpec's pinned budgets: run this after a planner-visible
  * change, eyeball the diff, re-pin deliberately. AQE is off so the
  * count is the static planner's (AQE merges/skips exchanges at
  * runtime, never adds them).
  */
object ExchangeAudit {

  /** Builders that run a full streaming query on construction. */
  val streamingHarness: Set[String] =
    Set("q33_cdc_stream_upsert", "q49_append_window_sales",
      "q52_stream_stream_join", "q54_stream_stream_left_outer",
      "q55_stream_stream_full_outer", "q58_streaming_sessionize",
      "q59_stream_stream_right_outer", "q60_join_then_window",
      "q61_stream_dedup", "q62_sessionize_tws", "q63_dedup_join_window",
      "q64_user_profile", "q65_restart_sessionize",
      "q66_disordered_window_sales", "q67_disordered_attribution",
      "q68_disordered_sessionize", "q69_restart_sessionize_tws")

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, build) =>
      if (!streamingHarness(name)) {
        val n =
          try build(spark, sf).queryExecution.executedPlan.collect {
            case e: ShuffleExchangeLike => e
          }.size.toString
          catch { case e: Throwable => s"ERROR ${e.getMessage.take(60)}" }
        println(f"$name%-32s $n")
      }
    }
    spark.stop()
  }
}
