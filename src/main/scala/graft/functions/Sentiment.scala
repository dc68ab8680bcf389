package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sentiment scoring U-1/U-2/A-4 (SURVEY.md §2.8, §2.4).
  *
  * The reference scores tweets with Stanford CoreNLP's RNN
  * (`KafkaSparkProcessor.scala:142-196`): per-sentence class 0–4, then a
  * sentence-length-weighted mean, then threshold bucketing. CoreNLP is
  * unavailable offline and non-deterministic across versions, so per
  * SURVEY §7.4 we keep the *math* (0–4 per sentence, weighted mean, −1
  * empty sentinel, bucket thresholds incl. the score==5.0 `MatchError`
  * divergence) but replace the *model* with a deterministic lexicon
  * scorer.
  *
  * Everything here is native Catalyst (split / higher-order array ops /
  * CaseWhen): no UDF, so the scorer is codegen-friendly and the lexicon is
  * a compile-time constant folded into the plan — the antithesis of the
  * reference's `new StanfordCoreNLP(...)` per record
  * (`KafkaSparkProcessor.scala:144`), which is its dominant cost.
  */
object Sentiment {

  /** Deterministic scoring lexicon (domain vocabulary of the test corpus). */
  val Positive: Seq[String] = Seq("fast", "big", "value")
  val Negative: Seq[String] = Seq("slow", "small", "dup")

  /** Sentence split contract: split on `[.!?]`, trim, drop empties
    * (replaces CoreNLP `ssplit`). */
  def sentences(text: Column): Column =
    filter(transform(split(text, "[.!?]"), s => trim(s)), s => length(s) > 0)

  private def countIn(s: Column, words: Seq[String]): Column =
    size(filter(split(s, " "), t => t.isInCollection(words)))

  /** Per-sentence class in [0,4] (replaces the RNN predicted class):
    * neutral 2, +1 per positive-lexicon token, −1 per negative, clamped. */
  def sentenceScore(s: Column): Column =
    least(
      lit(4.0),
      greatest(
        lit(0.0),
        lit(2.0) + countIn(s, Positive).cast("double")
          - countIn(s, Negative).cast("double")))

  /** U-1 + A-4: length-weighted mean of per-sentence scores,
    * `sum(score_i * len_i) / sum(len_i)`; −1 when there are no sentences
    * (`KafkaSparkProcessor.scala:166-177`).
    *
    * Planned as the native codegen'd
    * [[graft.functions.SentimentScoreExpression]] — one JVM pass per row;
    * [[weightedScoreHof]] is the column-form twin kept for equivalence
    * tests and as the SQL-engine-portable statement of the math. */
  def weightedScore(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SentimentScoreExpression(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Column-form twin of [[weightedScore]].
    *
    * Single `aggregate` with a (num, den) struct accumulator: the
    * sentence array is split/trimmed/filtered exactly once per row —
    * three separate folds would re-evaluate [[sentences]] each (no CSE
    * inside higher-order lambdas). */
  def weightedScoreHof(text: Column): Column =
    aggregate(
      sentences(text),
      struct(lit(0.0).as("num"), lit(0.0).as("den")),
      (acc, s) => struct(
        (acc("num") + sentenceScore(s) * length(s).cast("double")).as("num"),
        (acc("den") + length(s).cast("double")).as("den")),
      acc => when(acc("den") === 0.0, lit(-1.0))
        .otherwise(acc("num") / acc("den")))

  /** U-2 (`KafkaSparkProcessor.scala:186-194`): threshold bucketing.
    * The reference's `match` has no case for exactly 5.0 (`MatchError`);
    * we define ≥5 → `not_understood` and document the divergence. */
  def bucket(score: Column): Column =
    when(score <= 0.0, "not_understood")
      .when(score < 1.0, "very_negative")
      .when(score < 2.0, "negative")
      .when(score < 3.0, "neutral")
      .when(score < 4.0, "positive")
      .when(score < 5.0, "very_positive")
      .otherwise("not_understood")

  /** One scored sentence, for the typed A-4 aggregator. */
  final case class Sentence(score: Double, len: Long)

  /** A-4 as a typed `Aggregator[Sentence, (sum, weight), Double]` — the
    * weighted mean exposed through the typed-UDAF surface (partial+final
    * merge, so it map-side combines at scale). Returns −1 on empty input,
    * matching `KafkaSparkProcessor.scala:174-177`. */
  object WeightedMean extends Aggregator[Sentence, (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), s: Sentence): (Double, Double) =
      (b._1 + s.score * s.len, b._2 + s.len.toDouble)
    def merge(l: (Double, Double), r: (Double, Double)): (Double, Double) =
      (l._1 + r._1, l._2 + r._2)
    def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) -1.0 else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
