package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool for the optimization rounds (PlanDump's sibling): adjudicate
  * q90_vector_index_maintenance's round-17 movement with a paired
  * SAME-JVM A/B — arm `head` is q90 exactly as declared (sign-LSH
  * projection through the LongVecDot codegen kernel), arm `r16` is the
  * same maintenance cycle with the round-16 interpreted
  * `aggregate(zip_with(...))` bucket spelling, alternating reps so box
  * drift hits both arms equally. Both arms produce identical rows (the
  * kernel is an exact rewrite), so the timing difference is the
  * spelling. Usage: `runMain graft.VecIndexProbe [reps]`.
  */
object VecIndexProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
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
    import spark.implicits._

    val planes = graft.operators.VectorOps.rademacherPlanes(4, 64)

    // round-16 spelling, verbatim (commit 563c760 VectorOps.scala)
    def bucketOld(v: Column): Column = concat(planes.map { plane =>
      val proj = aggregate(
        zip_with(v, typedLit(plane), (x, c) => x * c),
        lit(0L), (acc, x) => acc + x)
      when(proj > 0, lit("1")).otherwise(lit("0"))
    }: _*)

    def sketch(df: DataFrame, old: Boolean): DataFrame = {
      val base = df.select($"vec_id",
        graft.operators.VectorOps.scaled($"embedding").as("v"))
        .withColumn("nsq", graft.operators.VectorOps.normSqL($"v"))
      if (old) base.withColumn("bucket", bucketOld($"v"))
      else base.withColumn("bucket",
        graft.operators.VectorOps.signLshBucket($"v", planes))
    }

    // q90's declared body with the sketch spelling injected (and a
    // per-arm index name so the arms never share catalog state)
    def q90(old: Boolean, ixName: String): DataFrame = {
      val sv = sketch(Tables.embeddings(spark, sfDir), old).localCheckpoint()
      def u: Column = graft.operators.Sampling.uniform01($"vec_id")
      val corpus = sv.filter(u >= 0.3)
      val batch1 = sv.filter(u >= 0.15 && u < 0.3)
      val batch2 = sv.filter(u < 0.15)
      val ix = new graft.operators.StandingIndex(
        spark, ixName, buckets = 4, keys = Seq("bucket"))
      ix.init(queries.LlmQueries.vectorIndexRows(corpus))
      val admit1 = queries.LlmQueries.admitByVectorSegments(batch1, ix.segments)
        .localCheckpoint()
      val admitted1 = batch1.join(admit1.select($"vec_id"), "vec_id")
      ix.fold(queries.LlmQueries.vectorIndexRows(admitted1))
      val admit2 = queries.LlmQueries.admitByVectorSegments(batch2, ix.segments)
      admit1.withColumn("batch", lit(1))
        .unionByName(admit2.withColumn("batch", lit(2)))
        .select($"vec_id", $"batch", $"bucket")
        .orderBy($"vec_id")
    }

    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 2000000000L, 1L, cpus.toInt)
        .selectExpr("sum(id % 7) AS s", "count(*) AS n")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate()

    def run(old: Boolean): (Double, Double) = {
      val c0 = calibrate()
      val t0 = System.nanoTime()
      q90(old, if (old) "q90probe_r16" else "q90probe_head")
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      val c1 = calibrate()
      (t, t / ((c0 + c1) / 2.0))
    }
    // warm both arms (codegen/classloading outside the reported reps)
    run(old = false); run(old = true)
    val pairs = (1 to reps).map { i =>
      val (th, nh) = run(old = false)
      val (to, no) = run(old = true)
      println(f"[vecprobe] rep $i head ${th}%.3f s (norm $nh%.3f)  r16 ${to}%.3f s (norm $no%.3f)")
      (th, to)
    }
    println(f"[vecprobe] min head ${pairs.map(_._1).min}%.3f s  min r16 ${pairs.map(_._2).min}%.3f s")
    // sanity: identical rows from both arms
    val a = q90(old = false, "q90probe_head").collect().map(_.toString).toSeq
    val b = q90(old = true, "q90probe_r16").collect().map(_.toString).toSeq
    println(s"[vecprobe] rows_equal=${a == b} n=${a.size}")
    spark.stop()
  }
}
