package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-cleaning operators P-3/P-4/P-5/P-7 from SURVEY.md §2.2, re-expressed
  * as native Catalyst column functions (all codegen'd `regexp_replace` /
  * `split` / higher-order array ops — no UDFs, so whole-stage codegen and
  * filter pushdown stay intact at 100 TB).
  *
  * Regex patterns are kept bug-for-bug identical to the reference
  * (`KafkaSparkProcessor.scala:133-135, 217-228, 244`). Java-vs-RE2 caveat:
  * `\b`, `\w` and plain char classes agree, but Java's `\s`/`\S` include /
  * exclude vertical tab (U+000B) while RE2's don't — the DuckDB oracles
  * therefore spell the whitespace class out explicitly
  * (`[ \t\n\x0b\f\r]`, and `[!-~]` for `\S`; see `Oracles.cleanText` and
  * `OraclesLlm.toksE`). The Spark side keeps Java's `\s` — it is the
  * engine-of-record semantics.
  */
object TextOps {

  /** P-5a (`KafkaSparkProcessor.scala:135`): `replaceAll("\\s\t\n:,!", "")`.
    * NOTE: the reference pattern is a literal *sequence* (whitespace char,
    * tab, newline, `:,!`), not a character class — it matches almost
    * nothing. Preserved verbatim for fidelity. */
  val HashtagCleanSimplePattern = "\\s\t\n:,!"

  /** P-5b / T-2 (`KafkaSparkProcessor.scala:244`): strips `RT`-suffixed
    * words and everything outside `[a-zA-Z0-9#]`. */
  val HashtagCleanStrongPattern = "(\\w*RT)|[^a-zA-Z0-9#]"

  /** P-3 (`KafkaSparkProcessor.scala:133, 217`): whitespace tokenizer. */
  def tokenize(text: Column): Column = split(text, " ")

  /** P-4 (`KafkaSparkProcessor.scala:134, 218`): `#`-prefixed and more than
    * one char after whitespace-stripping. */
  def isHashtag(tok: Column): Column =
    tok.startsWith("#") && length(regexp_replace(tok, "\\s", "")) > 1

  /** P-3 + P-4 fused: the array of hashtag tokens of a text. Planned as
    * the native [[ExtractHashtagsExpression]] (one generated-code pass);
    * [[extractHashtagsHof]] is the column-form twin for tests. */
  def extractHashtags(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ExtractHashtagsExpression(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  def extractHashtagsHof(text: Column): Column =
    filter(tokenize(text), t => isHashtag(t))

  def cleanHashtagSimple(tag: Column): Column =
    regexp_replace(tag, HashtagCleanSimplePattern, "")

  def cleanHashtag(tag: Column): Column =
    regexp_replace(tag, HashtagCleanStrongPattern, "")

  /** P-7 (`KafkaSparkProcessor.scala:224-228`): the 4-regex cleaning chain,
    * in the reference's exact order (URL-strip runs *after* punctuation
    * strip, so `http://x/y` has already lost `://` — order is load-bearing):
    *   1. strip `RT`-words and all chars outside `[a-zA-Z0-9\s.,!@]`
    *   2. strip URL remnants `http\S+`
    *   3. `@mention` → literal `Foo`
    *   4. strip a leading `Foo`
    *
    * Planned as the native [[CleanTweetTextExpression]] — four linear
    * scans, no regex backtracking (the `(\b\w*RT)` pattern made the
    * chained-`regexp_replace` form ~98% of total pipeline cost;
    * measured 344k → 17M rows/s). [[cleanTweetTextHof]] is the
    * column-form twin kept for equivalence tests and as the portable
    * statement of the semantics. */
  def cleanTweetText(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CleanTweetTextExpression(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  def cleanTweetTextHof(text: Column): Column = {
    val s1 = regexp_replace(text, "(\\b\\w*RT)|[^a-zA-Z0-9\\s.,!@]", "")
    val s2 = regexp_replace(s1, "(http\\S+)", "")
    val s3 = regexp_replace(s2, "(@\\w+)", "Foo")
    regexp_replace(s3, "^(Foo)", "")
  }
}
