package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Country extraction heuristic P-8/U-3 (`KafkaSparkProcessor.scala:198-210`),
  * as a pure Catalyst expression chain (no UDF).
  *
  * Reference semantics, kept bug-for-bug:
  *   - no `,` in the location ⇒ `"NULL"` sentinel string;
  *   - else take the last comma-field (Java `split(",")`, which drops
  *     *trailing* empty fields — emulated by stripping trailing commas
  *     before the split);
  *   - "clean" it with `[\p{Punct}&&[^a-zA-Z]]]` — a Java char-class
  *     intersection (≡ `\p{Punct}`, since letters are never punctuation)
  *     followed by a literal `]`, i.e. it only strips `<punct>]` pairs —
  *     near-no-op, preserved verbatim;
  *   - if the cleaned last field trims to exactly 2 chars AND there are
  *     exactly 2 fields ⇒ `"USA"` (the 2-letter-state heuristic — note
  *     `"London, UK"` also maps to USA; faithful to the reference);
  *   - result is always `trim().toUpperCase()`.
  *
  * Divergences (defensive, documented): a NULL location or a bare `","`
  * crashes the reference (NPE / index out of bounds); here they yield
  * `"NULL"` / `""` respectively. Two further (deliberate, rare-input)
  * divergences from Java string semantics, consistent across all three
  * forms (HOF / native expression / DuckDB oracle):
  *   - `trim` here strips spaces only, while Java `String.trim` strips
  *     every control char ≤ U+0020 — `"Boston,\tMA"` is USA in the
  *     reference but not here;
  *   - the ==2 length test counts code points, while Java
  *     `String.length` counts UTF-16 units — a field of two astral
  *     chars (4 UTF-16 units) differs. Strict Java fidelity would need
  *     a `[\x00-\x20]`-trim and a UTF-16 length in all three forms;
  *     not worth the oracle complexity for inputs the reference's own
  *     corpus never produces.
  */
object Country {

  /** Exact reference pattern (Java regex; `&&` intersection is a no-op
    * here, so RE2-based oracles can use `[[:punct:]]\]`). */
  val PunctCleanPattern = "[\\p{Punct}&&[^a-zA-Z]]]"

  /** Planned as the native codegen'd
    * [[graft.functions.CountryExpression]] — one JVM pass instead of two
    * regex rewrites + a split per row; [[extractCountryHof]] is the
    * column-form twin kept for equivalence tests. */
  def extractCountry(location: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CountryExpression(
        org.apache.spark.sql.GraftColumnBridge.expression(location)))

  def extractCountryHof(location: Column): Column = {
    // Java's split(",") drops trailing empty fields; Spark's keeps them.
    val parts = split(regexp_replace(location, ",+$", ""), ",")
    val last = element_at(parts, size(parts))
    val cleaned = regexp_replace(last, PunctCleanPattern, "")
    val country =
      when(length(trim(cleaned)) === 2 && size(parts) === 2, lit("USA"))
        .otherwise(last)
    when(location.isNotNull && location.contains(","), upper(trim(country)))
      .otherwise(lit("NULL"))
  }
}
