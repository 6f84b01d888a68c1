package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's single deterministic uniform-hash primitive, shared by
  * every sampling / sketching operator that needs "a uniform number
  * derived from a row" (KMV distinct sketch q36, content-hash split q37,
  * stratified source sampling q56, per-source cap q57). One definition on
  * BOTH sides of the correctness gate — the Spark expression here and the
  * DuckDB spelling in [[duckHex60]] — so the operators can never silently
  * diverge from each other or from their oracles (round-7 advice: q56/q57
  * re-derived the expression inline).
  *
  * Definition: the first 15 hex chars (60 bits) of `md5(cast(x as
  * string))`, decoded as a non-negative long in `[0, 2^60)`. 60 bits keeps
  * the value inside the signed-64-bit range on every engine (DuckDB has no
  * hex→int cast, so its spelling is a strpos polynomial — exact, but only
  * for ≤ 15 hex digits), and md5 is available and bit-identical in Spark,
  * DuckDB, and `java.security.MessageDigest` (pinned by SamplingSpec).
  *
  * Scale: pure map-side column expressions — no shuffle, no RNG state, no
  * driver participation. Hashing row CONTENT (an id, normalized text)
  * makes every derived decision — keep/drop, split, rank — a deterministic
  * function of the row: re-runs, re-shards, and incremental appends make
  * the same decision, the reproducibility property a 100 TB corpus
  * pipeline needs (a document can never migrate from test into train
  * between runs).
  */
object Sampling {

  /** 2^60 — one past the max value of [[hash60]]. */
  val TwoPow60: Long = 1L << 60

  /** 60-bit md5 hash of `c` (cast to string) as a long in `[0, 2^60)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Deterministic uniform u ∈ [0,1): [[hash60]] scaled by 2^-60. The
    * double division is exact enough for sampling (60-bit numerator
    * rounds to the nearest representable double; the decision boundary
    * `u < rate` moves by at most 2^-53 relative) and reproduces
    * bit-identically in DuckDB, which performs the same long→double→÷.
    */
  def uniform01(c: Column): Column =
    hash60(c).cast("double") / lit(TwoPow60.toDouble)

  /** DuckDB spelling of "decode `n` hex chars of `hexExpr` starting at
    * 1-based `from` into a BIGINT" (no hex→int cast in DuckDB; the strpos
    * polynomial is exact). Keep `n` ≤ 15 so the value fits signed 64 bits.
    */
  def duckHexToLong(hexExpr: String, from: Int, n: Int): String = {
    require(n <= 15, s"more than 15 hex digits overflows signed 64-bit, got $n")
    (0 until n).map { k =>
      val pow = 1L << (4 * (n - 1 - k))
      s"(strpos('0123456789abcdef', substring($hexExpr, ${from + k}, 1)) - 1) * $pow"
    }.mkString("(", " + ", ")")
  }

  /** DuckDB spelling of [[hash60]] over the SQL expression `sqlExpr`
    * (which must already be a VARCHAR, mirroring the `cast("string")`).
    */
  def duckHash60(sqlExpr: String): String =
    duckHexToLong(s"md5($sqlExpr)", 1, 15)

  /** DuckDB spelling of [[uniform01]] over `sqlExpr`. */
  def duckUniform01(sqlExpr: String): String =
    s"(CAST(${duckHash60(sqlExpr)} AS DOUBLE) / ${TwoPow60}.0)"

  /** A SECOND hash from the SAME digest: hex chars 16-17 of the md5
    * (the 8 bits right after [[hash60]]'s 60) as a long in `[0, 256)`.
    * Distinct md5 output bits are independent, so a decision keyed on
    * [[hash8]] (e.g. a skew-shard assignment) is decorrelated from one
    * keyed on [[hash60]] (e.g. a train/val/test split) without paying a
    * second digest — Catalyst's common-subexpression elimination reuses
    * the one `md5` call.
    */
  def hash8(c: Column): Column =
    conv(substring(md5(c.cast("string")), 16, 2), 16, 10).cast("long")

  /** DuckDB spelling of [[hash8]] over `sqlExpr` (already a VARCHAR). */
  def duckHash8(sqlExpr: String): String =
    duckHexToLong(s"md5($sqlExpr)", 16, 2)
}
