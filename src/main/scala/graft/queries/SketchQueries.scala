package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Sampling, TextOps, TopK}

/** Sketch and dataset-utility operators with EXACT cross-engine oracles:
  * the sketches are built from md5-derived uniform hashes
  * ([[graft.operators.Sampling]] — ONE definition shared by every gate
  * here and mirrored on the oracle side by its `duck*` spellings), so
  * unlike `approx_count_distinct`/t-digest (whose sketch layouts are
  * engine-private) every intermediate value reproduces bit-for-bit in
  * DuckDB. The estimator error is therefore part of the verified
  * contract, not noise.
  */
object SketchQueries {

  // ---------------------------------------------------------------- q36

  private val KmvK = 32

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
        Sampling.uniform01($"user_id").as("u"))
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
    val u = Sampling.duckUniform01("CAST(user_id AS VARCHAR)")
    s"""WITH hashed AS (
       |  SELECT DISTINCT event_type,
       |    $u AS u
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
    val bucket = Sampling.hash60(TextOps.normText($"text")) % 100
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
    val h = Sampling.duckHash60("lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))")
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

  // ---------------------------------------------------------------- q56

  /** q56 — deterministic per-source stratified sampling: each source
    * gets its own keep-rate (derived here from the source number,
    * `(1 + n mod 9) / 10` ∈ [0.1, 0.9] — in production a config map),
    * and a document is kept iff its id-hash uniform
    * `u = md5(doc_id)₆₀bits / 2^60` falls under the rate. Source
    * re-balancing is a core corpus-prep op (down-weight crawl dumps,
    * keep curated sources); hashing the ID makes the sample a
    * deterministic function of the row — re-runs, re-shards, and
    * incremental appends select the same documents, no RNG state, no
    * `sample()` nondeterminism. Pure map-side + one small agg; the gate
    * pins every source's kept count and id-extremes so a drifted
    * sampler fails loudly.
    */
  def q56StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate = (lit(1) +
      regexp_extract($"source", "(\\d+)", 1).cast("int") % 9) / lit(10.0)
    val u = Sampling.uniform01($"doc_id")
    Tables.documents(s, dir)
      .withColumn("keep", u < rate)
      .filter($"keep")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"),
        sum($"n_chars").cast("long").as("kept_chars"),
        min($"doc_id").as("min_doc_id"),
        max($"doc_id").as("max_doc_id"))
      .orderBy($"source")
  }

  val q56Oracle: String = {
    val u = Sampling.duckUniform01("CAST(doc_id AS VARCHAR)")
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       |  CAST(sum(n_chars) AS BIGINT) AS kept_chars,
       |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
       |FROM documents
       |WHERE $u
       |      < (1 + (CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 9)) / 10.0
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q57

  private val CapK = 10

  /** q57 — per-source uniform cap: keep at most [[CapK]] documents per
    * source, chosen uniformly-at-random but DETERMINISTICALLY — rank by
    * the same id-hash uniform as q56 and keep the smallest K. The other
    * half of source balancing (q56 thins by rate; this hard-caps
    * heavy-tailed sources), and a fresh use of the native top-k-per-key
    * operator ([[graft.operators.TopK.perKey]]): map-side k-truncation
    * per source before the exchange, so at 100 TB a billion-doc source
    * ships only K candidates per input partition instead of its whole
    * partition to the shuffle.
    */
  def q57SourceCap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.TopK
    val docs = Tables.documents(s, dir)
      .withColumn("sample_key", Sampling.hash60($"doc_id"))
    TopK.perKey(docs,
        keys = Seq($"source"),
        order = Seq($"sample_key".asc, $"doc_id".asc), k = CapK)
      .select($"source", $"doc_id", $"sample_key")
      .orderBy($"source", $"sample_key", $"doc_id")
  }

  val q57Oracle: String = {
    val h = Sampling.duckHash60("CAST(doc_id AS VARCHAR)")
    s"""SELECT source, doc_id, sample_key FROM (
       |  SELECT source, doc_id, $h AS sample_key,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY $h, doc_id) AS rn
       |  FROM documents) t
       |WHERE rn <= $CapK
       |ORDER BY source, sample_key, doc_id""".stripMargin
  }

  // --------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_kmv_distinct" -> (q36KmvDistinct _),
    "q37_hash_split"   -> (q37HashSplit _),
    "q56_stratified_sample" -> (q56StratifiedSample _),
    "q57_source_cap"   -> (q57SourceCap _))

  val oracles: Map[String, String] = Map(
    "q36_kmv_distinct" -> q36Oracle,
    "q37_hash_split"   -> q37Oracle,
    "q56_stratified_sample" -> q56Oracle,
    "q57_source_cap"   -> q57Oracle)
}
