package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline operators
  * (dedup, near-dup detection, text analysis) over the `documents` table.
  *
  * Everything here is a pure Catalyst expression built from
  * `org.apache.spark.sql.functions` higher-order array functions — no
  * UDFs, so all of it stays inside whole-stage codegen and needs no
  * serialization of closures. Per-row work (normalize, shingle, minhash
  * signature) is embarrassingly parallel: at 100 TB it runs map-side with
  * zero shuffle; only the LSH band-bucket join shuffles, and it shuffles
  * band keys (few bytes/doc), never document text.
  *
  * Portability contract: every primitive has an exact DuckDB spelling
  * (documented per method) so oracle queries hash-match bit-for-bit.
  * That is why minhash values are md5 hex *strings* compared
  * lexicographically — string min is engine-independent, whereas hex→int
  * conversions and native hash functions differ between engines.
  */
object TextOps {

  /** Whitespace-collapsed, trimmed, lower-cased view of a text column.
    * DuckDB: `lower(trim(regexp_replace(text, '\s+', ' ', 'g')))`.
    */
  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Whitespace tokens of the normalized text.
    * DuckDB: `string_split(norm, ' ')`.
    */
  def tokens(norm: Column): Column = split(norm, " ")

  /** md5 fingerprint of the normalized text — the exact-dedup key. */
  def exactFingerprint(norm: Column): Column = md5(norm)

  /** Order-insensitive bag-of-words fingerprint: md5 of the sorted
    * distinct token list. Collapses token-shuffled copies that byte-exact
    * dedup misses. DuckDB:
    * `md5(array_to_string(list_sort(list_distinct(string_split(norm,' '))), ' '))`.
    */
  def bagFingerprint(norm: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(norm)))))

  /** Distinct word n-gram shingles of a token array, joined with single
    * spaces. Empty array when the doc has fewer than n tokens.
    * DuckDB (n=3): `SELECT DISTINCT w[i]||' '||w[i+1]||' '||w[i+2]
    * FROM ..., unnest(generate_series(1, len(w)-2)) t(i)`.
    */
  def shingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    when(size(toks) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** MinHash signature over a shingle array: element s of the result is
    * `min(md5(s || ':' || shingle))` — the lexicographic minimum of the
    * seed-salted md5 hex strings. String-min is deterministic and
    * engine-portable (no hex→int step). Computed entirely map-side; the
    * signature is `numHashes` 32-char strings per document regardless of
    * document size, which is what makes LSH shuffle-light at scale.
    * DuckDB: `min(md5(seed::VARCHAR || ':' || shingle)) ... GROUP BY doc, seed`.
    *
    * NOTE: q16's production pipeline computes the same signature via
    * explode + map-side partial min instead of this array expression —
    * per-row array expressions get re-evaluated per downstream reference
    * (no CSE inside plans that fan out). This form is the semantic
    * specification, kept law-tested (permutation invariance) and useful
    * where the signature is consumed exactly once.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shingleArr, x => md5(concat(s.cast("string"), lit(":"), x)))))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric marks — the shape a byte-pair tokenizer's pre-split
    * uses. DuckDB: `len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]'))`.
    */
  def bpeTokenCount(norm: Column): Column =
    size(regexp_extract_all(norm, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Number of tokens that appear in `words` (occurrence count, not
    * distinct). DuckDB: `len(list_filter(w, x -> list_contains([...], x)))`.
    */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))
}
