package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Country, Sentiment}
import graft.model.WireCodec
import graft.text.TextOps

/** The reference's core dataflow (SURVEY.md §2.3-2.6) in batch form:
  * tweet wire lines → per-hashtag sentiment rows → dedup → trend analytics.
  *
  * Maps T-1/T-2 (`KafkaSparkProcessor.scala:212-246`), D-1 (`:115`),
  * A-1 (`:131-140`), A-2 (`:247-255`), J-1 (`:93`) and the Drill/Tableau
  * top-N queries (`README.md:18-28`).
  *
  * Scale notes (the 100 TB story):
  *   - Sentiment is computed once per *tweet* before the hashtag explode;
  *     the reference recomputes it per hashtag inside the flatMap loop
  *     (`:217-231`) — at N hashtags/tweet that's an N× saving on the
  *     dominant cost, with identical semantics (the score never depends
  *     on the tag).
  *   - All aggregations are plain `groupBy` → Catalyst partial+final hash
  *     aggregate (map-side combine), so a hot hashtag costs one shuffled
  *     row per upstream partition, not one per occurrence. AQE (on by
  *     default in Spark 4) re-splits skewed post-shuffle partitions.
  *   - Top-N is `Window.partitionBy(bucket)` + `row_number <= N` — never a
  *     global sort, never a driver-side collect.
  */
object TrendPipeline {

  /** Deterministic tweet-wire synthesis over the `documents` table: marks
    * `spark|data|stream` tokens as hashtags, assigns a location cycling
    * through the country-heuristic equivalence classes (USA / verbatim /
    * no-comma / 3-field), and a 15 s-granular batch timestamp — the batch
    * analog of the producer (`KafkaTwitterProducer.java:102-110`). */
  def syntheticTweets(docs: DataFrame): DataFrame = {
    val ht = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), "\\bspark\\b", "#spark"),
        "\\bdata\\b", "#data"),
      "\\bstream\\b", "#stream")
    val location = when(pmod(col("doc_id"), lit(5)) === 0, "San Francisco, CA")
      .when(pmod(col("doc_id"), lit(5)) === 1, "Toronto, Ontario")
      .when(pmod(col("doc_id"), lit(5)) === 2, "Paris")
      .when(pmod(col("doc_id"), lit(5)) === 3, "Austin, TX")
      .otherwise("Berlin, Germany, EU")
    val ts = (lit(1700000000L) + pmod(col("doc_id"), lit(10)) * 15)
      .cast("int")
    docs.select(
      col("doc_id"),
      ts.as("ts"),
      WireCodec.encodeTweet(location, ht).as("line"))
  }

  /** T-1, pre-dedup: one row per hashtag occurrence per tweet, with the
    * tweet's sentiment and country. Sentiment/country are computed on the
    * tweet projection (once), then the hashtag array is exploded. */
  def hashtagRows(tweets: DataFrame): DataFrame = {
    tweets
      // stage the parsed text: the wire-line split feeds three consumers
      // (clean chain, hashtag extract, country) and would otherwise be
      // re-evaluated per reference (no CSE across expression copies)
      .select(
        col("doc_id"), col("ts"),
        WireCodec.tweetText(col("line")).as("text"),
        WireCodec.tweetLocation(col("line")).as("loc"))
      .select(
        col("doc_id"),
        col("ts"),
        Country.extractCountry(col("loc")).as("country"),
        Sentiment.weightedScore(TextOps.cleanTweetText(col("text")))
          .as("sentiment_score"),
        TextOps.extractHashtags(col("text")).as("tags"))
      .withColumn("sentiment_type",
        lower(Sentiment.bucket(col("sentiment_score"))))
      .select(
        col("doc_id"), col("ts"),
        explode(col("tags")).as("tag"),
        col("sentiment_score"), col("sentiment_type"), col("country"))
      // T-2 re-clean (`KafkaSparkProcessor.scala:244`)
      .withColumn("hashtag", TextOps.cleanHashtag(col("tag")))
      .select("doc_id", "ts", "hashtag",
        "sentiment_score", "sentiment_type", "country")
  }

  /** Full pre-dedup trend rows over `documents`. */
  def trendRows(docs: DataFrame): DataFrame = hashtagRows(syntheticTweets(docs))

  /** D-1 (`KafkaSparkProcessor.scala:115`) with a deterministic keep rule:
    * the reference's `dropDuplicates(timestamp, hashtag, country)` keeps an
    * arbitrary row; for oracle comparability we keep the minimum
    * sentiment-score row.
    *
    * Implemented as a hash aggregate (`min`), NOT a
    * `row_number() over (partition by key)` window: the distinct-key space
    * can be tiny relative to the data (a viral hashtag IS a hot key), and a
    * window funnels every row of a key into one sorted task — measured 33 s
    * vs <1 s at sf0.1. `min` partial-aggregates map-side, so a hot key
    * costs one shuffled row per upstream partition. `sentiment_type` is a
    * pure function of the score, so recomputing it from the min preserves
    * row semantics exactly. */
  def dedupTrends(rows: DataFrame, tsCol: String = "ts"): DataFrame =
    rows
      .groupBy(tsCol, "hashtag", "country")
      .agg(min("sentiment_score").as("sentiment_score"))
      .withColumn("sentiment_type",
        lower(Sentiment.bucket(col("sentiment_score"))))
      .select(tsCol, "hashtag", "sentiment_score", "sentiment_type", "country")

  /** A-1 batch analog: hashtag occurrence counts. */
  def hashtagCounts(rows: DataFrame): DataFrame =
    rows.groupBy("hashtag").agg(count(lit(1)).as("cnt"))

  /** [[hashtagCounts]] with explicit two-phase salting — the hot-key
    * insurance for a viral hashtag. Phase 1 counts per (hashtag, salt)
    * so one key's rows spread over `salts` reducers; phase 2 merges the
    * partials. Result is identical to the plain aggregate (same oracle);
    * Catalyst's partial aggregation usually makes this unnecessary, but
    * when a single key's *post-shuffle* partial set is still too hot
    * (e.g. high-cardinality payloads per key), this is the shape to
    * reach for. Salt is derived from doc_id so the plan stays
    * deterministic. */
  def hashtagCountsSalted(rows: DataFrame, salts: Int = 16): DataFrame =
    rows
      .withColumn("salt", pmod(col("doc_id"), lit(salts.toLong)))
      .groupBy("hashtag", "salt")
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy("hashtag")
      .agg(sum("partial_cnt").as("cnt"))

  /** A-2: per-hashtag mean sentiment (partial+final hash agg; rounded so
    * float summation order can never flip the oracle compare). */
  def meanSentiment(rows: DataFrame): DataFrame =
    rows.groupBy("hashtag")
      .agg(round(avg("sentiment_score"), 4).as("avg_sentiment"))

  /** J-1 (`KafkaSparkProcessor.scala:93`): counts ⋈ mean sentiment.
    * Both sides are post-aggregation (tiny vs the input), so Catalyst
    * broadcast-joins them; at 100 TB the join key space is the distinct
    * hashtag set, not the event volume. */
  def countJoinSentiment(rows: DataFrame): DataFrame =
    hashtagCounts(rows).join(meanSentiment(rows), Seq("hashtag"), "inner")

  /** Dashboard (`README.md:18-28`): sentiment-type distribution per
    * hashtag — one partial+final hash agg. */
  def sentimentDistribution(rows: DataFrame): DataFrame =
    rows.groupBy("hashtag", "sentiment_type").agg(count(lit(1)).as("cnt"))

  /** Dashboard: trend-row counts by country. */
  def countsByCountry(rows: DataFrame): DataFrame =
    rows.groupBy("country").agg(count(lit(1)).as("cnt"))

  /** Dashboard: per-hashtag time series (count + mean sentiment per
    * 15 s bucket). */
  def hashtagTimeseries(rows: DataFrame): DataFrame =
    rows.groupBy("ts", "hashtag").agg(
      count(lit(1)).as("cnt"),
      round(avg("sentiment_score"), 4).as("avg_sentiment"))

  /** Trend SPIKE detection over [[hashtagTimeseries]]: a (ts, hashtag)
    * bucket spikes when its count is at least `factorPm/1000`× the
    * mean of that hashtag's previous `lookback` buckets — the "suddenly
    * trending" signal the reference's dashboard eyeballs, made exact.
    * The test is pure integer cross-multiplication
    * (`1000·cnt·lookback ≥ factorPm·Σprev`), and warm-up buckets
    * (fewer than `lookback` predecessors) never fire.
    *
    * Scale: the window partitions by hashtag — one shuffle on the
    * trend key, each partition a short ordered series; no global
    * window, no self-join against lagged copies. */
  def trendSpikes(rows: DataFrame, lookback: Int = 3,
                  factorPm: Long = 2000L): DataFrame = {
    val prev = Window.partitionBy("hashtag").orderBy("ts")
      .rowsBetween(-lookback, -1)
    hashtagTimeseries(rows)
      .select(col("ts"), col("hashtag"), col("cnt"))
      .withColumn("prev_sum", sum("cnt").over(prev))
      .withColumn("prev_n", count("cnt").over(prev))
      .filter(col("prev_n") === lookback &&
        col("cnt") * 1000L * col("prev_n") >= lit(factorPm) * col("prev_sum"))
      .select(col("ts"), col("hashtag"), col("cnt"), col("prev_sum"),
        expr("(1000 * cnt * prev_n) div prev_sum").as("spike_ratio_pm"))
  }

  /** One per-bucket candidate for [[TopNTrendsAgg]]. */
  final case class TrendHit(cnt: Long, hashtag: String)

  /** Bounded top-N per time bucket as a typed Aggregator (cnt desc,
    * hashtag asc tiebreak): associative merge of two sorted ≤n buffers,
    * so it partial-aggregates map-side — a viral time bucket with
    * millions of distinct hashtags ships ≤n rows per partition instead
    * of funneling its whole count set into one window-sort task. */
  final class TopNTrendsAgg(n: Int)
      extends org.apache.spark.sql.expressions.Aggregator[TrendHit, List[TrendHit], List[TrendHit]] {
    private def better(a: TrendHit, b: TrendHit): Boolean =
      a.cnt > b.cnt || (a.cnt == b.cnt && a.hashtag < b.hashtag)
    def zero: List[TrendHit] = Nil
    def reduce(b: List[TrendHit], h: TrendHit): List[TrendHit] = merge(b, List(h))
    def merge(l: List[TrendHit], r: List[TrendHit]): List[TrendHit] = {
      val out = scala.collection.mutable.ListBuffer[TrendHit]()
      var (a, b) = (l, r)
      while (out.length < n && (a.nonEmpty || b.nonEmpty)) {
        if (b.isEmpty || (a.nonEmpty && better(a.head, b.head))) {
          out += a.head; a = a.tail
        } else { out += b.head; b = b.tail }
      }
      out.toList
    }
    def finish(b: List[TrendHit]): List[TrendHit] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[List[TrendHit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[TrendHit]]()
    def outputEncoder: org.apache.spark.sql.Encoder[List[TrendHit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[TrendHit]]()
  }

  /** Dashboard top-N (`README.md:18-28`): top `n` hashtags per time
    * bucket by count, hashtag as deterministic tiebreak. Ranked with
    * the custom heap-per-key physical operator
    * ([[graft.plans.TopKPerKey]]) — a viral time bucket with millions
    * of distinct hashtags ships ≤n rows per map partition instead of
    * funneling its whole count set into one window-sort task, and the
    * generalized ordering (round 12) handles the STRING tiebreak
    * directly (cnt DESC, hashtag ASC), so the trend dashboard rides
    * the same operator as the similarity stack. */
  def topNTrends(rows: DataFrame, n: Int): DataFrame =
    graft.plans.TopKPerKey.topK(
      rows.groupBy("ts", "hashtag").agg(count(lit(1)).as("cnt")),
      Seq("ts"), "cnt", "hashtag", n)

  /** The typed-[[TopNTrendsAgg]] form of [[topNTrends]] — the
    * benchmark/semantics baseline the operator is pinned against
    * (TrendPipelineSpec); not used by any registered query. */
  private[graft] def topNTrendsAgg(rows: DataFrame, n: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupBy("ts", "hashtag").agg(count(lit(1)).as("cnt"))
      .select(col("ts"), col("hashtag"), col("cnt"))
      .as[(Int, String, Long)]
      .groupByKey(_._1)
      .mapValues(t => TrendHit(t._3, t._2))
      .agg(new TopNTrendsAgg(n).toColumn.name("hits"))
      .toDF("ts", "hits")
      .select(col("ts"), posexplode(col("hits")))
      .select(col("ts"), col("col.hashtag").as("hashtag"),
        col("col.cnt").as("cnt"),
        // long to match the BIGINT every SQL engine returns for row_number
        (col("pos") + 1L).cast("long").as("rank"))
  }
}
