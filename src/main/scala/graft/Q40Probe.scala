package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool for optimization round 18 (PlanDump's sibling): paired
  * SAME-JVM A/B/C of q40_dedup_clusters spellings, because the box's
  * co-tenant load makes the cross-JVM before/after PlanDump numbers for
  * this 2-3 s query unreadable. Arms:
  *   head — the declared q40 (node universe from the checkpointed base
  *          + labels localCheckpoint),
  *   nock — same node-universe fix but WITHOUT the labels checkpoint,
  *   r17  — the round-17 spelling (documents re-scan for the node
  *          universe, no labels checkpoint).
  * All arms produce identical rows. Usage: `runMain graft.Q40Probe [reps]`.
  */
object Q40Probe {
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

    // q16's confirm over minhashBands — LlmQueries.neardupPairs verbatim
    // (private there; replicated here for the probe only)
    def pairs(base: DataFrame): DataFrame = {
      val bands = queries.LlmQueries.minhashBands(base)
      val cand = bands.as("a")
        .join(bands.as("b"),
          $"a.band" === $"b.band" && $"a.bk" === $"b.bk" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .distinct()
      cand
        .join(base.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
        .join(base.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
        .withColumn("common_shingles", size(array_intersect($"sh_a", $"sh_b")))
        .withColumn("union_shingles", size($"sh_a") + size($"sh_b") - $"common_shingles")
        .withColumn("jaccard", $"common_shingles".cast("double") / $"union_shingles")
        .filter($"jaccard" >= 0.8)
        .select($"doc_a", $"doc_b")
    }

    def q40(nodesFromBase: Boolean, ckLabels: Boolean): DataFrame = {
      val base = Tables.spread(spark, Tables.documents(spark, sfDir))
        .select($"doc_id", graft.operators.TextOps.tokens(
          graft.operators.TextOps.normText($"text")).as("toks"))
        .select($"doc_id", graft.operators.TextOps.shingles($"toks", 3).as("sh"))
        .localCheckpoint()
      val nodes =
        if (nodesFromBase) base.select($"doc_id")
        else Tables.documents(spark, sfDir).select($"doc_id")
      val lbl0 = graft.operators.ConnectedComponents.labels(nodes, pairs(base))
      val labels = if (ckLabels) lbl0.localCheckpoint() else lbl0
      val sizes = labels.groupBy($"label".as("canonical_id"))
        .agg(count(lit(1)).as("cluster_size"))
      labels.select($"doc_id", $"label".as("canonical_id"))
        .join(sizes, "canonical_id")
        .select($"doc_id", $"canonical_id",
          when($"doc_id" === $"canonical_id", 1L).otherwise(0L).as("is_kept"),
          $"cluster_size")
        .orderBy($"doc_id")
    }

    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 2000000000L, 1L, cpus.toInt)
        .selectExpr("sum(id % 7) AS s", "count(*) AS n")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate()

    val arms = Seq(
      ("head", () => q40(nodesFromBase = true, ckLabels = true)),
      ("nock", () => q40(nodesFromBase = true, ckLabels = false)),
      ("r17 ", () => q40(nodesFromBase = false, ckLabels = false)))
    def run(mk: () => DataFrame): (Double, Double) = {
      val c0 = calibrate()
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      val c1 = calibrate()
      (t, t / ((c0 + c1) / 2.0))
    }
    arms.foreach { case (_, mk) => run(mk) } // warm
    val acc = scala.collection.mutable.Map.empty[String, List[(Double, Double)]]
    (1 to reps).foreach { i =>
      arms.foreach { case (name, mk) =>
        val (t, n) = run(mk)
        acc(name) = (t, n) :: acc.getOrElse(name, Nil)
        println(f"[q40probe] rep $i $name ${t}%.3f s (norm $n%.3f)")
      }
    }
    arms.foreach { case (name, _) =>
      val ts = acc(name)
      println(f"[q40probe] $name min ${ts.map(_._1).min}%.3f s  norm_min ${ts.map(_._2).min}%.3f")
    }
    val ref = q40(nodesFromBase = false, ckLabels = false).collect().map(_.toString).toSeq
    val hd = q40(nodesFromBase = true, ckLabels = true).collect().map(_.toString).toSeq
    println(s"[q40probe] rows_equal=${ref == hd} n=${ref.size}")
    spark.stop()
  }
}
