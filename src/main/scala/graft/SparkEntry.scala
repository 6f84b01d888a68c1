package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-coverage names (SURVEY.md §2) to
  * `(SparkSession, sfDir) => DataFrame`; `oracleSql` gives the DuckDB
  * equivalent run by the driver over the same parquet tables. Column
  * names and row order match between the two (the driver hash-compares).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q02TopNationRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ReferenceQueries.queries ++ LlmQueries.queries ++
      CodecQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ReferenceQueries.oracles ++ LlmQueries.oracles ++
      CodecQueries.oracles

  /** Headline subset timed by graft.Bench (kept stable across rounds). */
  def benchQueries: Seq[String] = queries.keys.toSeq.sorted
}
