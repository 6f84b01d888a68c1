package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the pinned headline queries on
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},...}`.
  * The driver runs this per-round at sf0.1 → BENCH_r{N}.json.
  *
  * Methodology (round-2 fixes per VERDICT "What's wrong" #2/#3):
  *  - every query materializes through the `noop` sink, which consumes every
  *    row of the final physical plan. Under the previous `.count()`
  *    action Catalyst legally deleted the benchmarked work itself
  *    (ColumnPruning dropped projection chains, EliminateSorts dropped
  *    every ORDER BY), so map-only queries timed parquet row-count
  *    metadata instead of the query.
  *  - A query that throws is reported as -1 in the per-query map, named
  *    in the "errors" array, and logged to stderr — a broken query can
  *    no longer read as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
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

    def materialize(name: String, dir: String): Either[Throwable, Unit] =
      try Right(SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save())
      catch { case e: Throwable => Left(e) }

    // JVM + codegen warm-up on the smallest SF so BENCH measures the
    // plan, not first-call classloading.
    SparkEntry.benchQueries.foreach(materialize(_, warmDir))

    val results = SparkEntry.benchQueries.map { name =>
      val t0 = System.nanoTime()
      val outcome = materialize(name, sfDir)
      val secs = (System.nanoTime() - t0) / 1e9
      outcome match {
        case Right(_) => (name, secs, None)
        case Left(e) =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          (name, -1.0, Some(name))
      }
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.flatMap(_._3).map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v, None) => v }.sum
    // 1-minute system load BEFORE this bench's own threads inflate it is
    // gone by now, so report the current one: co-tenant contention on the
    // bench box has been observed to move totals 3-5x between runs
    // minutes apart with identical code — the reader needs the context.
    val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"load_avg_1m":$load,"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
