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
      if (!SparkEntry.streamingGates(name)) {
        val n =
          try build(spark, sf).queryExecution.executedPlan.collect {
            case e: ShuffleExchangeLike => e
          }.size.toString
          catch { case e: Throwable => s"ERROR ${e.toString.take(80)}" }
        println(f"$name%-32s $n")
      }
    }
    spark.stop()
  }
}
