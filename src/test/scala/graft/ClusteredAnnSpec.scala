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
      // the maintained-index law below publishes StandingIndex catalog
      // tables — keep them out of the repo's default warehouse
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("annwarehouse").toString)
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

  test("maintained-index ANN parity: the segmented standing vector index answers admission and top-k IDENTICALLY to its compacted form") {
    val ss = spark; import ss.implicits._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.operators.{StandingIndex, VectorOps}
    // q90's maintenance shape, pinned as a QUALITY law: after real
    // folds, the segmented index and its compact() must give the same
    // admissions and the same bucket-ANN top-k on structured vectors —
    // segmentation (and the compaction that bounds it) can never
    // silently degrade ANN answers. Recall against exhaustive truth is
    // computed for BOTH forms and must be equal (parity), with the
    // segmented candidates a superset check built in via set equality.
    val sv = LlmQueries.vectorSketch(
        spark.read.parquet(s"$fixDir/embeddings.parquet"))
      .join(spark.read.parquet(s"$fixDir/embeddings.parquet")
        .select($"vec_id", $"label"), "vec_id")
      .localCheckpoint()
    def asIndex(df: DataFrame): DataFrame = df.select($"bucket",
      $"vec_id".as("blocker"), $"v".as("bv"), $"nsq".as("bn"))
    // searchable corpus = clusters 0..13 minus a held-out probe slice;
    // the admission batch = that slice + clusters 14/15 ENTIRELY held
    // out of the index, so admission is non-vacuous both ways: slice
    // members near-duplicate their standing cluster (rejected via the
    // index), held-out clusters admit first-wins within the batch
    val corpus = sv.filter($"label" <= 13 && $"vec_id" % 31 =!= 0)
    val batch = sv.filter(($"label" <= 13 && $"vec_id" % 31 === 0) ||
      $"label" >= 14)
    val ix = new StandingIndex(spark, "ann_parity_ix", buckets = 4,
      keys = Seq("bucket"))
    ix.init(asIndex(corpus.filter($"vec_id" % 3 === 0)))
    ix.fold(asIndex(corpus.filter($"vec_id" % 3 === 1)))
    ix.fold(asIndex(corpus.filter($"vec_id" % 3 === 2)))
    assert(ix.segments.size == 3)

    def admission(segs: Seq[DataFrame]): Set[Long] =
      LlmQueries.admitByVectorSegments(batch, segs)
        .collect().map(_.getLong(0)).toSet
    def topk(segs: Seq[DataFrame]): Set[(Long, Long)] = {
      val q = sv.filter($"vec_id" % 50 === 0)
      segs.map(seg => q.join(seg, "bucket"))
        .reduce(_ unionByName _)
        .filter($"blocker" =!= $"vec_id")
        .withColumn("cosine",
          VectorOps.cosineFromParts(VectorOps.dotL($"v", $"bv"), $"nsq", $"bn"))
        .withColumn("rank", row_number().over(
          Window.partitionBy($"vec_id").orderBy($"cosine".desc, $"blocker")))
        .filter($"rank" <= 3)
        .select($"vec_id", $"blocker")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val admSeg = admission(ix.segments)
    val topSeg = topk(ix.segments)
    ix.compact()
    assert(ix.segments.size == 1)
    val admCmp = admission(ix.segments)
    val topCmp = topk(ix.segments)
    // non-vacuity: the batch genuinely splits
    val batchIds = batch.select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(admSeg.nonEmpty && admSeg.size < batchIds.size,
      s"fixture must admit some and reject some, got ${admSeg.size}/${batchIds.size}")
    assert(topSeg.nonEmpty)
    // the parity laws
    assert(admSeg === admCmp,
      "segmented and compacted indexes must admit the same vectors")
    assert(topSeg === topCmp,
      "segmented and compacted indexes must return the same ANN top-k")
    // and equal recall against exhaustive truth (a corollary of parity,
    // stated in the quality metric the index is judged by)
    val q = sv.filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"v", $"nsq")
    val exact = q.crossJoin(asIndex(corpus))
      .filter($"blocker" =!= $"vec_id")
      .withColumn("cosine",
        VectorOps.cosineFromParts(VectorOps.dotL($"v", $"bv"), $"nsq", $"bn"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cosine".desc, $"blocker")))
      .filter($"rank" <= 3)
      .select($"vec_id", $"blocker")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(ann: Set[(Long, Long)]) = (ann & exact).size.toDouble / exact.size
    info(f"maintained-index recall@3: segmented=${recall(topSeg)}%.3f " +
      f"compacted=${recall(topCmp)}%.3f")
    assert(recall(topSeg) === recall(topCmp),
      "segmentation must not change recall")
    assert(recall(topSeg) > 0.0)
  }

  test("expired-index ANN parity: after expire, admission and top-k equal a fresh index of only the surviving content") {
    val ss = spark; import ss.implicits._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.operators.{StandingIndex, VectorOps}
    // the expiry arm of the parity family (fold/compact parity above):
    // expire() moves WHOLE segments out of the live set, so the expired
    // index must answer admission and bucket-ANN top-k IDENTICALLY to an
    // index built from scratch over only the surviving content — expiry
    // can remove blockers (that is its contract) but can never corrupt
    // what remains. Segments are partitioned by CLUSTER so the expiry
    // provably flips admissions: a probe-slice vector whose standing
    // near-duplicates all lived in the expired segment must admit after
    // the horizon passes (q102's re-admission semantics at spec level).
    val sv = LlmQueries.vectorSketch(
        spark.read.parquet(s"$fixDir/embeddings.parquet"))
      .join(spark.read.parquet(s"$fixDir/embeddings.parquet")
        .select($"vec_id", $"label"), "vec_id")
      .localCheckpoint()
    def asIndex(df: DataFrame): DataFrame = df.select($"bucket",
      $"vec_id".as("blocker"), $"v".as("bv"), $"nsq".as("bn"))
    val corpus = sv.filter($"label" <= 13 && $"vec_id" % 31 =!= 0)
    val batch = sv.filter(($"label" <= 13 && $"vec_id" % 31 === 0) ||
      $"label" >= 14)
    val ix = new StandingIndex(spark, "ann_expire_ix", buckets = 4,
      keys = Seq("bucket"))
    ix.init(asIndex(corpus.filter($"label" <= 4)), maxEventMs = 10L)
    ix.fold(asIndex(corpus.filter($"label" >= 5 && $"label" <= 9)),
      maxEventMs = 20L)
    ix.fold(asIndex(corpus.filter($"label" >= 10)), maxEventMs = 30L)
    def admission(segs: Seq[DataFrame]): Set[Long] =
      LlmQueries.admitByVectorSegments(batch, segs)
        .collect().map(_.getLong(0)).toSet
    def topk(segs: Seq[DataFrame]): Set[(Long, Long)] = {
      val q = sv.filter($"vec_id" % 50 === 0)
      segs.map(seg => q.join(seg, "bucket"))
        .reduce(_ unionByName _)
        .filter($"blocker" =!= $"vec_id")
        .withColumn("cosine",
          VectorOps.cosineFromParts(VectorOps.dotL($"v", $"bv"), $"nsq", $"bn"))
        .withColumn("rank", row_number().over(
          Window.partitionBy($"vec_id").orderBy($"cosine".desc, $"blocker")))
        .filter($"rank" <= 3)
        .select($"vec_id", $"blocker")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val admFull = admission(ix.segments)
    ix.expire(expireBeforeMs = 15L) // horizon passed the cluster-0..4 segment
    assert(ix.segments.size == 2)
    val admExp = admission(ix.segments)
    val topExp = topk(ix.segments)
    // the fresh-index twin: only the surviving content, built from scratch
    val fresh = new StandingIndex(spark, "ann_expire_fresh_ix", buckets = 4,
      keys = Seq("bucket"))
    fresh.init(asIndex(corpus.filter($"label" >= 5 && $"label" <= 9)))
    fresh.fold(asIndex(corpus.filter($"label" >= 10)))
    assert(admExp === admission(fresh.segments),
      "the expired index must admit exactly what a fresh survivor index admits")
    assert(topExp === topk(fresh.segments),
      "the expired index must return exactly a fresh survivor index's top-k")
    // non-vacuity: the expiry re-opened admissions (q102's semantics) —
    // vectors blocked only by the expired clusters now admit
    assert(admFull.subsetOf(admExp),
      "expiry can only remove blockers, never add them")
    assert(admExp.size > admFull.size,
      s"expiry must re-open at least one admission, got ${admFull.size} -> ${admExp.size}")
  }
}
