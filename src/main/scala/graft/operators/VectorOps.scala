package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector primitives for similarity search over the
  * `embeddings` table (`embedding: array<float>`).
  *
  * Exactness contract: cosine similarity is computed over an
  * integer-scaled view of the vectors. Each float component is widened to
  * double (exact), multiplied by 1e7 (one IEEE op, deterministic), and
  * truncated toward zero to a long. Dot products and norms over longs are
  * exact and **accumulation-order independent**, so Spark's parallel
  * evaluation and DuckDB's sequential one produce identical integers; the
  * final `dot / sqrt(n1) / sqrt(n2)` is then the same fixed sequence of
  * IEEE-754 double ops on identical inputs on both engines → bit-exact
  * doubles, safe for the driver's exact hash compare.
  * (64 dims × (1e7)² ≈ 6.4e15 per norm — far inside long range.)
  *
  * All primitives are pure Catalyst higher-order-function expressions
  * (no UDFs): they run inside whole-stage codegen and need no shuffle.
  */
object VectorOps {

  /** Integer-scaled view of a float-array embedding.
    * DuckDB: `list_transform(embedding, x -> CAST(trunc(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT))`.
    */
  def scaled(vec: Column): Column =
    transform(vec, x => (x * lit(10000000.0)).cast("long"))

  /** Exact long dot product of two integer-scaled vectors — a native
    * codegen'd Catalyst expression ([[graft.functions.LongVecDot]]): the
    * `aggregate(zip_with(...))` higher-order spelling is semantically
    * identical but interpreted with boxed arithmetic, and this is the
    * inner loop of brute-force top-k.
    */
  def dotL(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.longVecDot(a, b)

  /** Exact long squared norm of an integer-scaled vector. */
  def normSqL(a: Column): Column = dotL(a, a)

  /** Cosine similarity from exact integer dot/norms; bit-exact across
    * engines (see object doc). DuckDB:
    * `CAST(dot AS DOUBLE) / sqrt(CAST(n1 AS DOUBLE)) / sqrt(CAST(n2 AS DOUBLE))`.
    */
  def cosineFromParts(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / sqrt(normSqA.cast("double")) / sqrt(normSqB.cast("double"))

  /** Deterministic Rademacher (±1) hyperplanes for sign-LSH, derived from
    * md5 so the DuckDB oracle can inline the identical literal matrix:
    * plane p, dim d → +1 iff the first hex digit of md5("p_d") is at an
    * even position in "0123456789abcdef".
    */
  def rademacherPlanes(numPlanes: Int, dims: Int): Seq[Seq[Int]] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until numPlanes).map { p =>
      (0 until dims).map { d =>
        if ("0123456789abcdef".indexOf(md5hex(s"${p}_${d}").charAt(0)) % 2 == 0) 1 else -1
      }
    }
  }

  /** Sign-LSH bucket id: one bit per hyperplane — '1' iff the exact
    * integer dot product with the ±1 plane is > 0. Vectors sharing a
    * bucket are ANN candidates; the bucket string is the shuffle key of
    * the scale path (candidates are compared within buckets only, never
    * all-pairs). With ±1 coefficients the projection is an exact long sum,
    * so bucket assignment is engine-portable with no FP tolerance.
    */
  def signLshBucket(scaledVec: Column, planes: Seq[Seq[Int]]): Column =
    concat(planes.map { plane =>
      // the ±1 projection IS a long dot product against the literal
      // plane — route it through the native codegen kernel instead of
      // the interpreted aggregate(zip_with(...)) spelling (optimization
      // round 17, guide §1.2 step 2 / §4): same exact integer sum, and
      // bucket assignment stays engine-portable bit-for-bit.
      val proj = dotL(scaledVec, typedLit(plane.map(_.toLong)))
      when(proj > 0, lit("1")).otherwise(lit("0"))
    }: _*)
}
