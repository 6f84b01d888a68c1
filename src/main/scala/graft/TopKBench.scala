package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Dev tool: measure the native top-k-per-key operator against the
  * window `row_number() <= k` spelling on a synthetic frame large enough
  * for the plan difference to dominate (default 5M rows, 1k keys, k=5).
  * Usage: `runMain graft.TopKBench [rows] [keys] [k]`. Prints one line
  * per variant; the native plan shuffles ≤ k·partitions rows per key and
  * never sorts, the window plan shuffles and sorts everything.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 5000000L
    val keys = if (args.length > 1) args(1).toInt else 1000
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic synthetic: key and score derived from the id
    val df = spark.range(rows)
      .select($"id",
        ($"id" % keys).as("key"),
        (($"id" * 2654435761L) % 1000003L).as("score"))
      .localCheckpoint() // exclude generation from both measurements

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[topk-bench] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    time("window row_number<=k") {
      df.withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
        .write.format("noop").mode("overwrite").save()
    }
    time("native TopK.perKey") {
      TopK.perKey(df, Seq($"key"), Seq($"score".desc, $"id".asc), k)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
