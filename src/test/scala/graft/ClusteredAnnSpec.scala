package graft

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.queries.LlmQueries

/** ANN recall on STRUCTURED vectors. The testdata embeddings are
  * structure-free random vectors, so the LlmQueriesSpec floors there are
  * honest but weak (0.167/0.400/0.300 — a 1.3–2.7× lift over the
  * probed-fraction baseline). This spec plants real cluster structure —
  * the regime ANN indexes exist for — and demands production-grade
  * recall, so a bucket-scheme regression (hash change, probe loss, plane
  * drift, cell-assignment bug) trips a wide margin instead of a thin one.
  *
  * Fixture (deterministic, seed 42, written once per JVM under target/):
  * 1000 × 64-dim float vectors in 16 Gaussian clusters
  * (member = center + 0.25·noise ⇒ within-cluster cosine ≈ 0.94,
  * cross-cluster ≈ 0). The 16 IVF centroid ids (vec_id % 64 == 0, the
  * q32 convention) are assigned one per cluster, so every cluster owns
  * exactly one cell and nprobe=1 should already capture a query's
  * same-cluster neighborhood; the 20 query ids (vec_id % 50 == 0) get
  * pseudo-random clusters. label = cluster id for debuggability.
  */
class ClusteredAnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val fixDir = Paths.get("target", "annfix").toAbsolutePath.toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("clustered-ann-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeFixture()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val N = 1000
  private val D = 64
  private val C = 16
  private val NoiseScale = 0.25f

  private def writeFixture(): Unit = {
    val ss = spark; import ss.implicits._
    val rng = new scala.util.Random(42)
    val centers = Array.fill(C, D)(rng.nextGaussian().toFloat)
    // one IVF centroid id per cluster: ids 0,64,…,960 → clusters 0..15
    val centroidCluster = (0 until N by 64).zipWithIndex.toMap
    def clusterOf(id: Int): Int = centroidCluster.getOrElse(id,
      (((id * 2654435761L) & 0x7fffffffL) % C).toInt)
    val rows = (0 until N).map { id =>
      val c = clusterOf(id)
      // per-id noise stream keyed off the shared rng is order-dependent
      // but deterministic: ids are generated in a fixed sequence
      val vec = Array.tabulate(D)(d =>
        centers(c)(d) + NoiseScale * rng.nextGaussian().toFloat)
      (id.toLong, vec, c)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$fixDir/embeddings.parquet")
  }

  test("planted clusters are real structure: within-cluster cosine dwarfs cross-cluster") {
    val ss = spark; import ss.implicits._
    val exact = LlmQueries.q18CosineTopK(spark, fixDir)
    // every exact top-5 neighbor of every query should be same-cluster
    val labels = spark.read.parquet(s"$fixDir/embeddings.parquet")
      .select($"vec_id", $"label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pairs = exact.select($"qid", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sameCluster = pairs.count { case (q, n) => labels(q) == labels(n) }
    assert(sameCluster.toDouble / pairs.length >= 0.99,
      s"fixture lost its structure: only $sameCluster/${pairs.length} exact neighbors share a cluster")
  }

  test("structured recall@3: multi-probe LSH and IVF nprobe=2 reach production-grade recall") {
    val ss = spark; import ss.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select($"qid", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(LlmQueries.q18CosineTopK(spark, fixDir).filter($"rank" <= 3))
    val single = pairs(LlmQueries.q19AnnLsh(spark, fixDir))
    val multi = pairs(LlmQueries.q30AnnMultiprobe(spark, fixDir))
    val ivf1 = pairs(LlmQueries.q32AnnIvf(spark, fixDir))
    val ivf2 = pairs(LlmQueries.annIvf(spark, fixDir, nprobe = 2))
    def recall(ann: Set[(Long, Long)]) = (ann & exact).size.toDouble / exact.size
    info(f"structured recall@3: single=${recall(single)}%.3f multi=${recall(multi)}%.3f " +
      f"ivf1=${recall(ivf1)}%.3f ivf2=${recall(ivf2)}%.3f")
    // dominance laws hold here too
    assert(recall(multi) >= recall(single))
    assert(recall(ivf2) >= recall(ivf1))
    // production-grade absolute floors on structured data (measured
    // values in COVERAGE.md; floors leave margin for honest refactors
    // while any bucket-scheme regression falls far below)
    assert(recall(multi) >= 0.8,
      f"multi-probe recall ${recall(multi)}%.3f below 0.8 on clustered vectors")
    assert(recall(ivf2) >= 0.8,
      f"IVF nprobe=2 recall ${recall(ivf2)}%.3f below 0.8 on clustered vectors")
  }
}
