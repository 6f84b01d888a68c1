package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Global "functions, not UDFs" sweep: no gate query may execute a
  * `ScalaUDF` anywhere in its plan. A ScalaUDF is an opaque codegen
  * boundary — it breaks whole-stage codegen, pays an
  * InternalRow ⇄ external-Row conversion per call, and blocks every
  * Catalyst rewrite through it — which is why the engine's rule is
  * native `org.apache.spark.sql.functions`, typed Aggregators, or
  * custom Catalyst expressions everywhere (q20's Avro codec was the
  * last UDF holdout, promoted in round 6). The per-query plan specs pin
  * individual hot paths; this sweep pins the RULE, so a convenience
  * UDF slipping into any future query fails the suite by name.
  *
  * Streaming-harness gates (q33/q49/q52/q54/q55/q58–q69) are skipped:
  * their builders run a full streaming query on construction, and their
  * plans are pinned by their own specs + oracles.
  */
class NoUdfSweepSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("noudf-wh").toString)
      .config("spark.ui.enabled", "false")
      .appName("no-udf-sweep")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val streamingHarness =
    Set("q33_cdc_stream_upsert", "q49_append_window_sales",
      "q52_stream_stream_join", "q54_stream_stream_left_outer",
      "q55_stream_stream_full_outer", "q58_streaming_sessionize",
      "q59_stream_stream_right_outer", "q60_join_then_window",
      "q61_stream_dedup", "q62_sessionize_tws", "q63_dedup_join_window",
      "q64_user_profile", "q65_restart_sessionize",
      "q66_disordered_window_sales", "q67_disordered_attribution",
      "q68_disordered_sessionize", "q69_restart_sessionize_tws")

  test("no batch gate query's plan contains a ScalaUDF") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, build) if !streamingHarness(name) =>
        val df = build(spark, sf)
        val hasUdf = df.queryExecution.analyzed.expressions
          .exists(_.exists(_.isInstanceOf[ScalaUDF])) ||
          df.queryExecution.analyzed.collect {
            case p => p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF]))
          }.exists(identity)
        name -> hasUdf
    }.filter(_._2).map(_._1)
    assert(offenders.isEmpty,
      s"gate queries executing ScalaUDFs: ${offenders.mkString(", ")}")
  }
}
