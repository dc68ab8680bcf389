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

  /** Deterministic scoring lexicon: AFINN-style public-knowledge English
    * sentiment words (binary polarity — the scorer weights every hit ±1),
    * plus the original domain vocabulary of the test corpus (`fast`,
    * `big`, `value` / `slow`, `small`, `dup` — the synthetic generator
    * and fixtures depend on them). All entries are lowercase single
    * tokens and the two lists are disjoint (enforced below — the native
    * scorer checks positive membership first, so an overlap would
    * diverge from the column form's `+pos − neg` count).
    *
    * The oracle's SQL IN-lists are *generated from these constants*
    * (`Oracles.Pos`/`Neg`), so Spark, the native expression, and DuckDB
    * can never drift. */
  val Positive: Seq[String] = Seq(
    "fast", "big", "value",
    "good", "great", "excellent", "amazing", "awesome", "wonderful",
    "fantastic", "brilliant", "superb", "perfect", "best", "better",
    "outstanding", "impressive", "incredible", "remarkable", "delightful",
    "pleasant", "enjoyable", "happy", "joyful", "glad", "cheerful",
    "delighted", "thrilled", "excited", "exciting", "love", "lovely",
    "loved", "beautiful", "elegant", "graceful", "charming", "stunning",
    "splendid", "terrific", "fabulous", "magnificent", "marvelous",
    "admirable", "worthy", "noble", "generous", "gracious", "kind",
    "gentle", "friendly", "warm", "welcoming", "helpful", "useful",
    "valuable", "beneficial", "effective", "efficient", "reliable",
    "robust", "stable", "secure", "safe", "smooth", "seamless", "clean",
    "clear", "simple", "easy", "intuitive", "powerful", "strong", "solid",
    "swift", "quick", "rapid", "rich", "vibrant", "fresh", "crisp",
    "neat", "tidy", "smart", "clever", "wise", "insightful", "thoughtful",
    "innovative", "creative", "inspired", "inspiring", "uplifting",
    "encouraging", "promising", "hopeful", "optimistic", "confident",
    "proud", "grateful", "thankful", "thanks", "praise", "celebrated",
    "acclaimed", "renowned", "trusted", "trustworthy", "honest",
    "genuine", "sincere", "fair", "flawless", "polished", "refined",
    "superior", "premium", "exceptional", "extraordinary", "phenomenal",
    "stellar", "win", "winner", "winning", "victory", "triumph",
    "success", "successful", "accomplished", "achievement", "improved",
    "improvement", "upgraded", "gain", "bonus", "reward")
  val Negative: Seq[String] = Seq(
    "slow", "small", "dup",
    "bad", "terrible", "horrible", "awful", "dreadful", "atrocious",
    "abysmal", "poor", "worst", "worse", "inferior", "mediocre",
    "disappointing", "disappointed", "disappointment", "unfortunate",
    "unpleasant", "nasty", "gross", "disgusting", "offensive", "rude",
    "harsh", "cruel", "mean", "hostile", "angry", "furious", "outraged",
    "annoyed", "annoying", "irritating", "frustrating", "frustrated",
    "upset", "sad", "unhappy", "miserable", "gloomy", "depressing",
    "grim", "bleak", "hopeless", "despair", "dismal", "painful", "hurt",
    "suffering", "agony", "fear", "scared", "afraid", "anxious",
    "worried", "nervous", "dread", "broken", "fragile", "flaky", "buggy",
    "bug", "bugs", "glitch", "crash", "crashed", "crashes", "fail",
    "failed", "failure", "fails", "fault", "faulty", "defect",
    "defective", "flawed", "error", "errors", "mistake", "mistakes",
    "wrong", "incorrect", "invalid", "useless", "worthless", "pointless",
    "waste", "wasted", "wasteful", "sluggish", "laggy", "bloated",
    "clunky", "awkward", "clumsy", "messy", "mess", "sloppy", "dirty",
    "stale", "rotten", "spoiled", "toxic", "harmful", "dangerous",
    "unsafe", "insecure", "unstable", "unreliable", "untrustworthy",
    "dishonest", "fraud", "scam", "fake", "bogus", "junk", "trash",
    "garbage", "lousy", "lame", "pathetic", "weak", "feeble", "shame",
    "shameful", "embarrassing", "humiliating", "regret", "regrettable",
    "sorry", "tragic", "disaster", "catastrophe", "crisis", "problem",
    "problems", "trouble", "severe", "dire", "lost", "loss", "losing",
    "defeat")
  require(Positive.toSet.intersect(Negative.toSet).isEmpty,
    "sentiment lexicon polarity lists must be disjoint")
  require((Positive ++ Negative).forall(w => w.matches("[a-z]+")),
    "lexicon entries must be lowercase single tokens (SQL-quotable)")

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
