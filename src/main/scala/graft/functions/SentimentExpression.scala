package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native implementation of the U-1/A-4 weighted sentiment scorer — one
  * JVM pass over the text instead of the interpreted
  * split/trim/filter/aggregate higher-order chain. Bit-identical to
  * [[Sentiment.weightedScore]] (tested): every step mirrors the column
  * form's exact semantics —
  *   - sentence split on the regex `[.!?]` keeping trailing empties
  *     (Spark's `split(str, re)` uses limit -1);
  *   - `trim` strips the space character only (Spark `trim`, NOT Java
  *     `String.trim`, which also strips tabs and control chars);
  *   - token split on the single-space regex;
  *   - per-sentence score `clamp(2 + pos − neg, 0, 4)` over the lexicon;
  *   - accumulation order and double arithmetic identical:
  *     `num += score·len; den += len`, final `num/den`, −1 when no
  *     sentences survive.
  */
object SentimentOps {

  private val pos = Sentiment.Positive.toSet
  private val neg = Sentiment.Negative.toSet

  /** Spark-`trim` semantics: strip leading/trailing ' ' only. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var until = s.length
    while (from < until && s.charAt(from) == ' ') from += 1
    while (until > from && s.charAt(until - 1) == ' ') until -= 1
    s.substring(from, until)
  }

  /** Input must be non-null — `nullSafeEval` guards the Catalyst path
    * (null in → null out, exactly like the column form). */
  def weightedScore(text: UTF8String): Double = {
    // java.util.regex split with limit -1 == Spark's StringSplit
    val sentences = text.toString.split("[.!?]", -1)
    var num = 0.0
    var den = 0.0
    var i = 0
    while (i < sentences.length) {
      val s = trimSpaces(sentences(i))
      if (s.nonEmpty) {
        var score = 2.0
        val toks = s.split(" ", -1)
        var j = 0
        while (j < toks.length) {
          if (pos.contains(toks(j))) score += 1.0
          else if (neg.contains(toks(j))) score -= 1.0
          j += 1
        }
        if (score > 4.0) score = 4.0
        if (score < 0.0) score = 0.0
        // Spark length() counts code points, not UTF-16 units
        val len = s.codePointCount(0, s.length).toDouble
        num += score * len
        den += len
      }
      i += 1
    }
    if (den == 0.0) -1.0 else num / den
  }
}

/** `graft_sentiment(string) -> double` — see [[SentimentOps]]. */
case class SentimentScoreExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sentiment"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sentiment requires a string argument, got ${child.dataType}")

  override protected def withNewChildInternal(newChild: Expression): SentimentScoreExpression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SentimentOps.weightedScore(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SentimentOps.weightedScore($c);")
}
