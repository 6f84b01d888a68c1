package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{TextOps, TopK}

/** Sketch and dataset-utility operators with EXACT cross-engine oracles:
  * the sketches are built from md5-derived uniform hashes, so unlike
  * `approx_count_distinct`/t-digest (whose sketch layouts are
  * engine-private) every intermediate value reproduces bit-for-bit in
  * DuckDB. The estimator error is therefore part of the verified
  * contract, not noise.
  */
object SketchQueries {

  /** DuckDB spelling of "decode `n` hex chars of `hexCol` starting at
    * 1-based `from` into a BIGINT" (no hex-string→int cast in DuckDB;
    * the strpos polynomial is exact). Keep n ≤ 15 so the value fits the
    * signed 64-bit range.
    */
  private def duckHex(hexCol: String, from: Int, n: Int): String =
    (0 until n).map { k =>
      val pow = 1L << (4 * (n - 1 - k))
      s"(strpos('0123456789abcdef', substring($hexCol, ${from + k}, 1)) - 1) * $pow"
    }.mkString("(", " + ", ")")

  // ---------------------------------------------------------------- q36

  private val KmvK = 32
  private val TwoPow60 = 1152921504606846976L // 2^60

  /** q36 — KMV (k-minimum-values) distinct-count sketch per event type:
    * hash each user to a uniform u ∈ [0,1) (md5 → 60-bit int / 2^60),
    * keep the k=32 smallest distinct hashes (the engine's native top-k
    * operator, ascending), estimate distinct = (k−1)/u_(k) — the
    * classical KMV estimator; groups with fewer than k distinct values
    * fall back to the exact count (the sketch saw everything). Emitted
    * next to the exact `countDistinct` so the verified output includes
    * the estimator's relative error.
    *
    * Scale: the sketch state is k hashes per group regardless of input
    * size, merged map-side by the top-k partial phase — the same
    * bounded-memory union-able shape as HLL, but with an oracle that
    * reproduces exactly (HLL register layouts are engine-private).
    */
  def q36KmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val hashed = ev.select($"event_type",
        (conv(substring(md5($"user_id".cast("string")), 1, 15), 16, 10)
          .cast("long").cast("double") / lit(TwoPow60.toDouble)).as("u"))
      .distinct()
    val kept = TopK.perKey(hashed,
      keys = Seq($"event_type"), order = Seq($"u".asc), k = KmvK)
    val sketch = kept.groupBy($"event_type")
      .agg(count(lit(1)).as("sketch_n"), max($"u").as("kth_u"))
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_distinct"))
    exact.join(sketch, "event_type")
      .withColumn("kmv_estimate",
        when($"sketch_n" < KmvK, $"exact_distinct".cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) / $"kth_u"))
      .withColumn("rel_err",
        abs($"kmv_estimate" - $"exact_distinct") / $"exact_distinct")
      .select($"event_type", $"exact_distinct", $"sketch_n", $"kth_u",
        $"kmv_estimate", $"rel_err")
      .orderBy($"event_type")
  }

  val q36Oracle: String = {
    val h = duckHex("md5(CAST(user_id AS VARCHAR))", 1, 15)
    s"""WITH hashed AS (
       |  SELECT DISTINCT event_type,
       |    CAST($h AS DOUBLE) / $TwoPow60 AS u
       |  FROM events),
       |rk AS (
       |  SELECT event_type, u,
       |    row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
       |  FROM hashed),
       |sk AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS sketch_n, max(u) AS kth_u
       |  FROM rk WHERE rn <= $KmvK GROUP BY event_type),
       |ex AS (
       |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
       |  FROM events GROUP BY event_type),
       |j AS (
       |  SELECT ex.event_type, exact_distinct, sketch_n, kth_u,
       |    CASE WHEN sketch_n < $KmvK THEN CAST(exact_distinct AS DOUBLE)
       |         ELSE ${(KmvK - 1).toDouble} / kth_u END AS kmv_estimate
       |  FROM ex JOIN sk ON sk.event_type = ex.event_type)
       |SELECT event_type, exact_distinct, sketch_n, kth_u, kmv_estimate,
       |  abs(kmv_estimate - exact_distinct) / exact_distinct AS rel_err
       |FROM j
       |ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------- q37

  /** q37 — deterministic train/val/test split of the document corpus by
    * CONTENT hash: bucket = 60 bits of md5(normalized text) mod 100;
    * <80 train, <90 val, else test. Content (not id) hashing keeps the
    * assignment stable under re-ingestion, re-sharding, and id reissue —
    * the property an LLM data pipeline needs so a document can never
    * migrate from test into train between runs. Pure map-side + one
    * tiny aggregation; the verified output pins every split's size and
    * id-range so a drifted split fails the gate.
    */
  def q37HashSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = conv(substring(md5(TextOps.normText($"text")), 1, 15), 16, 10)
      .cast("long") % 100
    Tables.documents(s, dir)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("total_chars"),
        min($"doc_id").as("min_doc_id"),
        max($"doc_id").as("max_doc_id"))
      .orderBy($"split")
  }

  val q37Oracle: String = {
    val h = duckHex("md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))", 1, 15)
    s"""SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
       |FROM (
       |  SELECT doc_id, n_chars,
       |    CASE WHEN $h % 100 < 80 THEN 'train'
       |         WHEN $h % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents) t
       |GROUP BY split
       |ORDER BY split""".stripMargin
  }

  // --------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_kmv_distinct" -> (q36KmvDistinct _),
    "q37_hash_split"   -> (q37HashSplit _))

  val oracles: Map[String, String] = Map(
    "q36_kmv_distinct" -> q36Oracle,
    "q37_hash_split"   -> q37Oracle)
}
