package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-pipeline operators.
  *
  * Everything is exact integer arithmetic inside native Catalyst
  * higher-order functions — no UDFs, no floats — so (a) whole-stage
  * codegen applies, and (b) a DuckDB oracle can reproduce results
  * bit-for-bit (float summation order can never flip a compare).
  *
  * `pmod` is applied at every fold step so intermediates stay below
  * ~2^35 and ANSI mode (Spark 4 default) can never see a long overflow.
  */
object TextFns {

  /** Modulus for all polynomial hashes (large prime, < 2^30). */
  val Prime = 1000000007L

  /** Characters of a string as an array column (empties dropped — Spark's
    * `split(s, "")` yields a trailing "" on some inputs). */
  def chars(s: Column): Column =
    filter(split(s, ""), c => length(c) > 0)

  /** Deterministic polynomial rolling hash: fold `acc*31 + codepoint`
    * mod [[Prime]] over the code points. Same fold is expressible in any
    * SQL engine with list folds (`list_reduce` in DuckDB).
    *
    * Planned as the native codegen'd
    * [[graft.functions.PolyHashExpression]] — a tight generated-Java
    * loop; [[polyHashHof]] is the pure-column twin kept for
    * cross-checking the two implementations in tests. */
  def polyHash(s: Column): Column =
    graft.functions.GraftExtensions.polyhashCol(s)

  /** Higher-order-function twin of [[polyHash]] (interpreted; reference
    * implementation for equivalence tests). */
  def polyHashHof(s: Column): Column =
    aggregate(chars(s), lit(0L),
      (acc, c) => pmod(acc * 31L + ascii(c).cast("long"), lit(Prime)))

  /** Whitespace tokens, empties dropped (Java-split semantics). */
  def tokens(s: Column): Column =
    filter(split(s, "\\s+"), t => length(t) > 0)

  /** Word k-grams ("shingles") of a token array as strings; empty when
    * the document has fewer than k tokens. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (k - 1)), i =>
        concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*)))

  /** Per-token polynomial hashes of a text. */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t => polyHash(t))

  /** Per-token hashes under the SECOND polynomial family
    * ([[graft.functions.PolyHashExpression.Mult2]]): independent of
    * [[tokenHashes]] — a family-1 token collision stays a collision
    * through any function of the hash, so decorrelation has to start
    * from the token string itself. */
  def tokenHashes2(text: Column): Column =
    transform(tokens(text),
      t => graft.functions.GraftExtensions.polyhash2Col(t))

  /** Distinct shingle hash set from a *materialized* token-hash array
    * column — the unit of Jaccard similarity for MinHash / n-gram dedup.
    *
    * The k-gram hash is the polynomial combine of the k token hashes
    * (`fold acc*31+h mod P`), not a re-hash of the joined string: each
    * character is hashed exactly once per document instead of k times.
    *
    * IMPORTANT: `ths` must be an attribute (project [[tokenHashes]] into
    * a column first), never the raw expression — `element_at` references
    * it 3× per shingle and Catalyst does not share subexpressions inside
    * higher-order lambdas, so an inlined expression would re-hash the
    * whole document per lookup (measured as a 4× query blow-up). */
  def shingleHashSetFromTokenHashes(ths: Column, k: Int): Column = {
    val combined = when(size(ths) < k, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), size(ths) - (k - 1)), i =>
        (1 until k).foldLeft(element_at(ths, i)) { (acc, o) =>
          pmod(acc * 31L + element_at(ths, i + o), lit(Prime))
        }))
    array_distinct(combined)
  }
}
