package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** U-1/U-2/A-4 exact-value and property tests
  * (SURVEY §5.2-5.3, FIXTURES.md A.4). */
class SentimentSpec extends SparkSpec {
  import spark.implicits._

  /** Reference (driver-side) bucketing — mirrors
    * `KafkaSparkProcessor.scala:186-194` with the ≥5 divergence. */
  private def refBucket(s: Double): String =
    if (s <= 0.0) "not_understood"
    else if (s < 1.0) "very_negative"
    else if (s < 2.0) "negative"
    else if (s < 3.0) "neutral"
    else if (s < 4.0) "positive"
    else if (s < 5.0) "very_positive"
    else "not_understood"

  private def buckets(scores: Seq[Double]): Seq[String] =
    scores.toDF("s").select(Sentiment.bucket(col("s")).as("b"))
      .collect().map(_.getString(0)).toSeq

  test("bucket pins every boundary from FIXTURES.md A.4") {
    val cases = Seq(
      -1.0 -> "not_understood", 0.0 -> "not_understood",
      0.5 -> "very_negative", 1.0 -> "negative", 2.99 -> "neutral",
      3.0 -> "positive", 4.999 -> "very_positive",
      5.0 -> "not_understood", // reference throws MatchError; we define it
      6.0 -> "not_understood")
    assert(buckets(cases.map(_._1)) == cases.map(_._2))
  }

  test("bucket is total and matches the reference function on random doubles") {
    val gen = Gen.chooseNum(-10.0, 10.0)
    val samples = Gen.listOfN(300, gen).apply(Gen.Parameters.default, Seed(42L)).get
    val all = samples ++ Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    assert(buckets(all) == all.map(refBucket))
  }

  test("sentenceScore: neutral 2, +pos −neg, clamped to [0,4]") {
    val texts = Seq(
      "nothing here", "fast", "slow", "fast fast big", "slow slow dup",
      "fast fast fast big big", "slow slow slow dup dup")
    val got = evalText[Double](texts)(Sentiment.sentenceScore(col("text")))
    assert(got == Seq(2.0, 3.0, 1.0, 4.0, 0.0, 4.0, 0.0))
  }

  test("generic English sentences score non-neutral (broad lexicon)") {
    val got = evalText[Double](Seq(
      "what a wonderful day with great weather",
      "this release is a terrible broken mess",
      "the quarterly report was filed on schedule"))(
      Sentiment.weightedScore(col("text")))
    assert(got(0) > 2.0, s"positive sentence scored ${got(0)}")
    assert(got(1) < 2.0, s"negative sentence scored ${got(1)}")
    assert(got(2) == 2.0, s"neutral sentence scored ${got(2)}")
  }

  test("lexicon polarity lists are disjoint and SQL-quotable") {
    assert(Sentiment.Positive.toSet.intersect(Sentiment.Negative.toSet).isEmpty)
    assert((Sentiment.Positive ++ Sentiment.Negative).forall(_.matches("[a-z]+")))
    assert(Sentiment.Positive.size > 100 && Sentiment.Negative.size > 100)
  }

  test("weightedScore: length-weighted mean across sentences; -1 when empty") {
    // "fast" (len 4, score 3) . "slow slow" (len 9, score 0)
    val got = evalText[Double](Seq("fast. slow slow", "", "   ", "!!!."))(
      Sentiment.weightedScore(col("text")))
    assert(math.abs(got.head - (3.0 * 4 + 0.0 * 9) / 13) < 1e-12)
    assert(got.drop(1) == Seq(-1.0, -1.0, -1.0))
  }

  test("weightedScore stays within [0,4] or is exactly -1 (property)") {
    val word = Gen.oneOf("fast", "slow", "big", "small", "value", "dup", "x", ".")
    val text = Gen.listOf(word).map(_.mkString(" "))
    val samples = Gen.listOfN(200, text).apply(Gen.Parameters.default, Seed(7L)).get
    val got = evalText[Double](samples)(Sentiment.weightedScore(col("text")))
    assert(got.forall(s => s == -1.0 || (s >= 0.0 && s <= 4.0)))
  }

  test("native weightedScore equals the HOF column twin on adversarial strings") {
    val word = Gen.oneOf("fast", "slow", "big", ".", "!", "?", "é漢",
      "😀", "", " ", "  ", "\t", "a.b", "fast.slow")
    val text = Gen.listOf(word).map(_.mkString(" "))
    val samples = Gen.listOfN(300, text).apply(Gen.Parameters.default, Seed(21L)).get ++
      Seq("", " . ", "...", "fast", "a\tb. c", "😀 fast. slow 漢")
    val rows = textDf("text", samples)
      .select(Sentiment.weightedScore(col("text")).as("n"),
        Sentiment.weightedScoreHof(col("text")).as("h"), col("text"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"mismatch for '${r.getString(2)}'")
    }
  }

  test("WeightedMean typed Aggregator matches the column math") {
    import Sentiment.Sentence
    val ds = Seq(Sentence(3.0, 4L), Sentence(0.0, 9L)).toDS()
    val got = ds.select(Sentiment.WeightedMean.toColumn).collect().head
    assert(math.abs(got - 12.0 / 13) < 1e-12)
    val empty = spark.emptyDataset[Sentence]
    assert(empty.select(Sentiment.WeightedMean.toColumn).collect().head == -1.0)
  }
}
