package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{AsOf, TopK}

/** Property-based laws for the round-3 operators, checked against
  * straight-line Scala reference models on randomized inputs — the
  * operators must agree with the obviously-correct implementation on
  * every draw, not just on the curated fixtures.
  */
class OperatorLawsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("operator-laws-spec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("TopK.perKey equals the sort-take reference model on random data") {
    val ss = spark; import ss.implicits._
    val rowGen = for {
      k <- Gen.choose(0, 5)
      score <- Gen.choose(0, 20)
      id <- Gen.choose(0, 1000000)
    } yield (k, score, id)
    val gen = for {
      rows <- Gen.listOfN(60, rowGen)
      topk <- Gen.choose(1, 4)
    } yield (rows.zipWithIndex.map { case ((k, s, _), i) => (k, s, i) }, topk)
    val prop = Prop.forAll(gen) { case (rows, k) =>
      val expected = rows.groupBy(_._1).values.flatMap { grp =>
        grp.sortBy(r => (-r._2, r._3)).take(k) // score desc, id asc
      }.toSet
      val got = TopK.perKey(rows.toDF("k", "score", "id"),
          Seq($"k"), Seq($"score".desc, $"id".asc), k)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("AsOf.joinLatest equals the per-row latest-at-or-before reference model") {
    val ss = spark; import ss.implicits._
    val rowGen = for {
      key <- Gen.choose(0L, 3L)
      ts <- Gen.choose(0L, 30L)
      isRight <- Gen.oneOf(true, false)
    } yield (key, ts, isRight)
    val gen = Gen.listOfN(40, rowGen).map(_.zipWithIndex.map {
      case ((k, ts, r), i) => (k, ts, i.toLong, r)
    })
    val prop = Prop.forAll(gen) { rows =>
      val lefts = rows.filterNot(_._4).map(r => (r._1, r._2, r._3))
      val rights = rows.filter(_._4).map(r => (r._1, r._2, r._3))
      (lefts.nonEmpty, rights.nonEmpty) match {
        case (true, true) =>
          // reference: max (ts, seq) right row with ts <= left ts, same key
          val expected = lefts.map { case (k, ts, seq) =>
            val cand = rights.filter(r => r._1 == k && r._2 <= ts)
            val best = if (cand.isEmpty) None
              else Some(cand.maxBy(r => (r._2, r._3))._3)
            (seq, best)
          }.toSet
          val out = AsOf.joinLatest(
              lefts.toDF("k", "ts", "seq"),
              rights.toDF("k", "ts", "seq")
                .withColumn("pay_seq", col("seq")),
              keys = Seq("k"), tsCol = "ts", seqCol = "seq",
              payloadCols = Seq("pay_seq"))
            .collect().map(r => (r.getLong(2),
              if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
          out == expected
        case _ => true // degenerate draw: nothing to check
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
