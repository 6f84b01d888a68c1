package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool for the optimization rounds (PlanDump's sibling): time the
  * [[graft.operators.StandingIndex]] maintenance primitives (init /
  * fold / compact / segments-read) and the catalog/FS sub-steps a
  * publish is made of (DROP-missing, bucketed staging write, ALTER
  * RENAME, refreshTable), so the per-fold publish constant q89/q93 pay
  * can be apportioned before and after a change inside ONE JVM.
  * Usage: `runMain graft.SegmentProbe [reps]`.
  */
object SegmentProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(name: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[segprobe] $name%-28s med ${ts(ts.size / 2)}%.4f s  min ${ts.head}%.4f s  max ${ts.last}%.4f s")
    }

    val delta = spark.range(0, 200)
      .select($"id".as("doc_id"), ($"id" % 3).cast("int").as("band"),
        concat(lit("k"), $"id" % 37).as("bk"))
      .localCheckpoint()

    // --- raw sub-steps -------------------------------------------------
    timed("sql DROP-missing")(spark.sql("DROP TABLE IF EXISTS `segprobe_missing`"))
    timed("catalog.tableExists-miss") { spark.catalog.tableExists("segprobe_missing"); () }
    var n = 0
    timed("writeBucketed(tiny)") {
      n += 1
      graft.operators.BucketedLake.writeBucketed(delta, s"segprobe_w$n", 4, "band", "bk")
    }
    var m = 0
    timed("rename+refresh") {
      m += 1
      spark.sql(s"ALTER TABLE `segprobe_w$m` RENAME TO `segprobe_r$m`")
      spark.catalog.refreshTable(s"segprobe_r$m")
    }
    timed("refreshTable") (spark.catalog.refreshTable("segprobe_r1"))
    timed("noop-job(tiny)") (delta.write.format("noop").mode("overwrite").save())

    // --- index ops -----------------------------------------------------
    val ix = new graft.operators.StandingIndex(spark, "segprobe_ix", 4, Seq("band", "bk"))
    timed("ix.init")(ix.init(delta))
    timed("ix.fold")(ix.fold(delta))
    timed("ix.compact") { ix.compact(); () }
    timed("ix.segments-count") { ix.segments.size; () }
    timed("ix.segments-read") {
      ix.segments.map(_.count()).sum; ()
    }
    spark.stop()
  }
}
