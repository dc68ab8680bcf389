package graft.model

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data model of the engine — the reference's four abstractions re-expressed
  * as typed Datasets / fixed StructTypes (SURVEY.md §1).
  *
  * Reference: akshitvjain/realtime-twitter-trends-analytics,
  * `KafkaSparkProcessor.scala:97-102` (trend schema),
  * `KafkaTwitterProducer.java:107-108` (wire format).
  */

/** One raw tweet record as carried on the wire:
  * `"<location> /TLOC/ <text>"` (KafkaTwitterProducer.java:108). */
final case class RawTweet(location: String, text: String)

/** T-1 output row: one row per hashtag occurrence per tweet
  * (KafkaSparkProcessor.scala:212-246). */
final case class HashtagSentiment(
    hashtag: String,
    sentimentScore: Double,
    sentimentType: String,
    country: String)

/** Final trend-store row (KafkaSparkProcessor.scala:97-102, 108-109). */
final case class TrendRow(
    timestamp: Int,
    hashtag: String,
    sentimentScore: Double,
    sentimentType: String,
    country: String)

object Model {

  /** The reference's exact 5-column result schema, hyphenated names included
    * (KafkaSparkProcessor.scala:97-102). Used by the streaming sink for wire
    * fidelity; batch queries use underscore aliases so the DuckDB oracle
    * doesn't need quoted identifiers. */
  val trendSchema: StructType = new StructType()
    .add(StructField("timestamp", IntegerType, nullable = true))
    .add(StructField("hashtag", StringType, nullable = true))
    .add(StructField("sentiment-score", DoubleType, nullable = true))
    .add(StructField("sentiment-type", StringType, nullable = true))
    .add(StructField("country", StringType, nullable = true))

  val trendSchemaSql: StructType = new StructType()
    .add(StructField("timestamp", IntegerType, nullable = true))
    .add(StructField("hashtag", StringType, nullable = true))
    .add(StructField("sentiment_score", DoubleType, nullable = true))
    .add(StructField("sentiment_type", StringType, nullable = true))
    .add(StructField("country", StringType, nullable = true))
}

/** The ` /TLOC/ ` wire codec (P-6 / P-10).
  *
  * The reference serializes records as delimiter-joined strings both on the
  * Kafka producer (`location /TLOC/ text`, KafkaTwitterProducer.java:108) and
  * between its two stream stages
  * (`tag /TLOC/ score /TLOC/ type /TLOC/ country`,
  * KafkaSparkProcessor.scala:232-233, re-parsed at :243). Our engine keeps
  * typed columns end-to-end and exposes the codec for wire compatibility.
  */
object WireCodec {
  val Delim = " /TLOC/ "

  /** P-10: producer-side encode (KafkaTwitterProducer.java:108).
    * Inputs are null-coalesced so the delimiter is always emitted —
    * `concat_ws` would otherwise silently *skip* a NULL location and the
    * text would land in the location slot on decode (the reference
    * producer null-guards location before concatenating,
    * KafkaTwitterProducer.java:102). */
  def encodeTweet(location: Column, text: Column): Column =
    concat_ws(Delim, coalesce(location, lit("")), coalesce(text, lit("")))

  /** P-6: `line.split(" /TLOC/ ")(0)` / `(1)` (KafkaSparkProcessor.scala:219).
    * `try_element_at` so a malformed line (missing delimiter) yields NULL
    * instead of killing the job under ANSI mode — the reference's
    * `tweetObj(1)` throws per-row and relies on an outer catch. Like the
    * reference, text embedding the delimiter is truncated at its first
    * occurrence (wire fidelity). */
  def tweetLocation(line: Column): Column = try_element_at(split(line, Delim), lit(1))
  def tweetText(line: Column): Column = try_element_at(split(line, Delim), lit(2))

  /** P-10: metric-line encode (KafkaSparkProcessor.scala:232-233).
    * Every field is null-coalesced to "" so `concat_ws` cannot silently
    * drop a slot and shift later fields left on decode (same hazard as
    * [[encodeTweet]]); a NULL score round-trips as "" → NULL via
    * [[decodeMetric]]'s safe parse. */
  def encodeMetric(tag: Column, score: Column, tpe: Column, country: Column): Column =
    concat_ws(Delim,
      coalesce(tag, lit("")),
      coalesce(score.cast(StringType), lit("")),
      coalesce(tpe, lit("")),
      coalesce(country, lit("")))

  /** ANSI-safe numeric parse: NULL (not a thrown error) on a malformed
    * field — one bad record must not fail a 100 TB job. */
  private def safeDouble(c: Column): Column =
    when(c.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"), c.cast(DoubleType))

  /** T-2: metric-line 4-way decode (KafkaSparkProcessor.scala:243-245). */
  def decodeMetric(line: Column): Column = {
    val parts = split(line, Delim)
    struct(
      try_element_at(parts, lit(1)).as("hashtag"),
      safeDouble(try_element_at(parts, lit(2))).as("sentiment_score"),
      try_element_at(parts, lit(3)).as("sentiment_type"),
      try_element_at(parts, lit(4)).as("country"))
  }

  /** Decode a DataFrame of wire lines into (location, text). */
  def decodeTweets(lines: DataFrame, lineCol: String = "line"): DataFrame =
    lines
      .withColumn("location", tweetLocation(col(lineCol)))
      .withColumn("text", tweetText(col(lineCol)))
}
