package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.queries.LlmQueries
import graft.operators.{TextOps, VectorOps}

/** Semantic invariants of the LLM-data-pipeline operators (fixture-level
  * correctness lives in the DuckDB oracle gate; these pin the *laws*).
  */
class LlmQueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("llm-queries-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("exact dedup: fingerprints are unique in output and cover all docs") {
    val out = LlmQueries.q14DedupExact(spark, sf).cache()
    val n = out.count()
    assert(out.select("fingerprint").distinct().count() === n)
    val total = out.agg(sum("group_size")).head.getLong(0)
    assert(total === Tables.documents(spark, sf).count())
    out.unpersist()
  }

  test("bag dedup collapses token-shuffled copies but never loses docs") {
    val exact = LlmQueries.q14DedupExact(spark, sf).count()
    val bag = LlmQueries.q15DedupBag(spark, sf).cache()
    assert(bag.count() < exact) // corpus has planted shuffled duplicates
    assert(bag.agg(sum("group_size")).head.getLong(0) ===
      Tables.documents(spark, sf).count())
    bag.unpersist()
  }

  test("near-dup pairs are symmetric-free, above threshold, and Jaccard-consistent") {
    val rows = LlmQueries.q16NearDupLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (i, u, j) = (r.getInt(2), r.getInt(3), r.getDouble(4))
      assert(a < b)
      assert(j >= 0.8 && j <= 1.0)
      assert(math.abs(j - i.toDouble / u) < 1e-15)
    }
  }

  test("cosine top-k: ranks contiguous from 1, cosine non-increasing per query, self excluded") {
    val ss = spark; import ss.implicits._
    val rows = LlmQueries.q18CosineTopK(spark, sf)
      .select($"qid", $"rank", $"neighbor_id", $"cosine")
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length))
      assert(sorted.forall(_.getLong(2) != qid))
      val cs = sorted.map(_.getDouble(3)).toSeq
      assert(cs === cs.sorted.reverse)
      assert(cs.forall(c => c >= -1.0000001 && c <= 1.0000001))
    }
  }

  test("ANN buckets: every returned neighbor shares the query's bucket") {
    val ss = spark; import ss.implicits._
    val planes = VectorOps.rademacherPlanes(4, 64)
    val buckets = Tables.embeddings(spark, sf)
      .select($"vec_id", VectorOps.signLshBucket(
        VectorOps.scaled($"embedding"), planes).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = LlmQueries.q19AnnLsh(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (qid, bucket, nid) = (r.getLong(0), r.getString(1), r.getLong(3))
      assert(buckets(qid) === bucket)
      assert(buckets(nid) === bucket)
    }
  }

  test("ANN results are a subset-consistent projection of brute force within the bucket") {
    // For each query, q19's top-1 must have cosine <= q18's top-1 (brute
    // force searches a superset), and each q19 neighbor's cosine must
    // appear among the exact cosines of same-bucket vectors.
    val ss = spark; import ss.implicits._
    val bf = LlmQueries.q18CosineTopK(spark, sf)
      .filter($"rank" === 1).select($"qid", $"cosine")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = LlmQueries.q19AnnLsh(spark, sf)
      .filter($"rank" === 1).select($"qid", $"cosine")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach { case (qid, c) => assert(c <= bf(qid) + 1e-12) }
  }

  test("multi-probe ANN recall dominates single-probe against exact top-k") {
    val ss = spark; import ss.implicits._
    def hits(df: org.apache.spark.sql.DataFrame) = df
      .filter($"rank" <= 3).select($"qid", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = LlmQueries.q18CosineTopK(spark, sf)
      .filter($"rank" <= 3).select($"qid", $"neighbor_id".as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = hits(LlmQueries.q19AnnLsh(spark, sf))
    val multi = hits(LlmQueries.q30AnnMultiprobe(spark, sf))
    val rSingle = (single & exact).size.toDouble / exact.size
    val rMulti = (multi & exact).size.toDouble / exact.size
    assert(rMulti >= rSingle) // probing Hamming-1 buckets never loses recall
    assert(multi.size >= single.size) // candidate superset -> >= results
  }

  test("text stats: ratios bounded, quality in [0,1], token counts positive") {
    val rows = LlmQueries.q17TextStats(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val nTok = r.getInt(3); val nUniq = r.getInt(4)
      val ttr = r.getDouble(6); val q = r.getDouble(9)
      assert(nTok > 0 && nUniq > 0 && nUniq <= nTok)
      assert(ttr > 0 && ttr <= 1.0)
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("minhash signature is permutation-invariant over shingle sets") {
    val ss = spark; import ss.implicits._
    val df = Seq(
      (1L, Array("a b c", "b c d", "c d e")),
      (2L, Array("c d e", "a b c", "b c d"))).toDF("id", "sh")
    val sigs = df.select($"id", TextOps.minhashSignature($"sh", 9).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sigs(1L) === sigs(2L))
  }
}
