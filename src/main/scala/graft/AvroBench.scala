package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{AvroCodec, AvroExpressions}

/** Dev tool: measure the Catalyst `AvroEncode`/`AvroDecode` expressions
  * against the legacy per-row UDF pair on a synthetic orders-shaped
  * frame (default 2M rows). Usage: `runMain graft.AvroBench [rows]`.
  * Both variants run the full encode→decode→project round trip through
  * the noop sink; the expression path stays inside whole-stage codegen
  * and converts Avro values directly to Catalyst internal values, the
  * UDF path pays InternalRow → external Row → GenericRecord and back
  * per record.
  */
object AvroBench {
  // the deprecated UDF pair is exactly what this tool benchmarks against
  @scala.annotation.nowarn("cat=deprecation")
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val schema = graft.queries.CodecQueries.orderAvroSchema
    val df = spark.range(rows)
      .select(
        $"id".as("o_orderkey"),
        ($"id" % 150000L).as("o_custkey"),
        when($"id" % 3 === 0, lit("O")).otherwise(lit("F")).as("o_orderstatus"),
        (($"id" % 100000L) / 100.0).as("o_totalprice"),
        timestamp_millis(lit(1700000000000L) + $"id" % 86400000L).as("o_orderdate"),
        concat(lit("P"), ($"id" % 5).cast("string")).as("o_orderpriority"))
      .localCheckpoint() // exclude generation from both measurements

    val all = struct(df.columns.map(col): _*)

    def time(label: String)(f: => Unit): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[avro-bench] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val encU = AvroCodec.toAvroUdf(schema)
    val decU = AvroCodec.fromAvroUdf(schema)
    time("udf encode+decode") {
      df.select(decU(encU(all)).as("d")).select($"d.*")
        .write.format("noop").mode("overwrite").save()
    }
    time("expression encode+decode") {
      df.select(AvroExpressions.fromAvro(
          AvroExpressions.toAvro(all, schema), schema).as("d"))
        .select($"d.*")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
