package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool for the optimization rounds: write `.explain("formatted")`
  * output for a list of queries to `plans/<tag>/<query>_<suffix>.txt`
  * and print paired warm noop-sink timings (2 runs per query) so a
  * before/after change can be judged inside ONE JVM (the bench box's
  * co-tenant load makes cross-process absolute numbers unreadable —
  * BENCH_r05/r08 postmortems). Usage:
  * `runMain graft.PlanDump <tag> <suffix> <query> [query...]`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"plans/$tag"))
    // Bench's cpu-calibration probe (fixed in-memory codegen aggregation)
    // bracketing each query: under the box's co-tenant load the
    // normalized min (raw / bracket-avg calibration) is the comparable
    // number across runs taken hours apart.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 2000000000L, 1L, cpus.toInt)
        .selectExpr("sum(id % 7) AS s", "count(*) AS n")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // warm the probe's codegen
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/$tag/${name}_$suffix.txt"), txt)
      // warm twice so codegen/classloading lands outside the reported run
      val samples = (1 to 3).map { _ =>
        val c0 = calibrate()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        val c1 = calibrate()
        (t, t / ((c0 + c1) / 2.0))
      }
      val times = samples.map(_._1)
      val norms = samples.map(_._2)
      println(f"[plandump] $name $suffix: ${times.map(t => f"$t%.3f").mkString(" ")} " +
        f"(min ${times.min}%.3f, norm_min ${norms.min}%.3f)")
    }
    spark.stop()
  }
}
