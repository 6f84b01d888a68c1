package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.streaming.StreamJobs

/** Streaming-throughput micro-bench (TopKBench/AvroBench mold): rows/sec
  * through the custom-state SESSIONIZE operator, run through the real
  * streaming engine (file source → FlatMapGroupsWithStateExec /
  * TransformWithStateExec → noop sink, AvailableNow) on an events
  * fixture shard-replicated from SPARK_GRAFT_SF_DIR with per-shard
  * user_id shifts — distinct users (= state rows) scale with the data,
  * the dimension that matters for a state backend.
  *
  * Four variants, crossing the state API with the state backend:
  *   - fmgws_hdfs:    flatMapGroupsWithState on the default HDFS-backed
  *                    (in-memory + snapshot) provider
  *   - fmgws_rocksdb: the same operator on RocksDB
  *   - tws_rocksdb:   transformWithState + explicit timers on RocksDB
  *                    (the provider TWS requires — and the memory-bounded
  *                    backend a 100 TB streaming deployment actually runs)
  *   - tws_rocksdb_changelog: ditto with CHANGELOG checkpointing —
  *                    incremental changelog upload instead of full
  *                    snapshots, the recovery-cost strategy at large
  *                    state; its steady-state throughput cost is what
  *                    this variant prices
  *
  * Not a driver gate — run manually (`runMain graft.StreamBench`);
  * numbers are recorded in COVERAGE.md. Methodology follows Bench:
  * warm-up pass first, then `passes` timed passes per variant
  * (variant-major interleaved so a load spike hits all variants), report
  * per-variant median and min, rows/sec from the min (the least-noise
  * estimate of engine throughput). Each pass uses a fresh checkpoint so
  * every run replays the full input through empty state.
  */
object StreamBench {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shards = sys.env.getOrElse("SPARK_GRAFT_STREAM_SHARDS", "10").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // fixture: N shards of the events dump (shared builder — user_id
    // shifts per shard so state rows scale N×; ts stays the raw nanos
    // long, written back as plain int64)
    val fixture = s"target/streambench$shards"
    Tables.shardedEvents(spark, base, shards)
      .repartition(32).write.mode("overwrite").parquet(fixture)
    val rows = spark.read.parquet(fixture).count()

    val Hdfs =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val Rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

    def run(provider: String, tws: Boolean, changelog: Boolean = false): Double =
      Confs.withConf(spark,
        "spark.sql.streaming.stateStore.providerClass" -> provider,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
          changelog.toString) {
      val events = spark.readStream
        .schema(eventsSchema)
        .parquet(fixture)
        .select($"user_id",
          timestamp_micros(expr("ts div 1000")).as("ts"),
          $"value")
        .withWatermark("ts", "10 minutes")
      val sessions =
        if (tws) StreamJobs.sessionizeTws(events, gapMinutes = 360)
        else StreamJobs.sessionize(events, gapMinutes = 360)
      val ck = Files.createTempDirectory("graft-streambench-ck").toString
      val t0 = System.nanoTime()
      val query = sessions.toDF().writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .format("noop")
        .start()
      query.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    val variants = Seq(
      ("fmgws_hdfs", Hdfs, false, false),
      ("fmgws_rocksdb", Rocks, false, false),
      ("tws_rocksdb", Rocks, true, false),
      ("tws_rocksdb_changelog", Rocks, true, true))

    variants.foreach { case (_, p, t, c) => run(p, t, c) } // warm-up (codegen, classes)
    val samples = (1 to passes).map { _ =>
      variants.map { case (name, p, t, c) => name -> run(p, t, c) }
    }
    val out = variants.map { case (name, _, _, _) =>
      val ts = samples.map(_.find(_._1 == name).get._2).sorted
      (name, ts(ts.size / 2), ts.head)
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    out.foreach { case (name, med, mn) =>
      System.err.println(
        f"$name%-14s median=$med%6.2fs min=$mn%6.2fs ${rows / mn}%,.0f rows/s")
    }
    val med = out.map { case (k, m, _) => s""""$k":${f"$m%.3f"}""" }.mkString("{", ",", "}")
    val mn = out.map { case (k, _, m) => s""""$k":${f"$m%.3f"}""" }.mkString("{", ",", "}")
    val rps = out.map { case (k, _, m) => s""""$k":${(rows / m).toLong}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_sessionize","rows":$rows,"shards":$shards,"passes":$passes,"median_sec":$med,"min_sec":$mn,"rows_per_sec":$rps,"load_avg_1m":$load,"cpus":$cpus,"sf":"$base"}""")
    spark.stop()
  }
}
