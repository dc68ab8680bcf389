package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** T-1/D-1/A-1/A-2/J-1 semantics on hand-built frames. */
class TrendPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tweets(rows: (Long, Int, String)*) =
    rows.toSeq.toDF("doc_id", "ts", "line")

  test("hashtagRows: one row per hashtag occurrence, sentiment computed per tweet") {
    val df = tweets(
      (1L, 100, "Boston, MA /TLOC/ fast #a #b #a"),
      (2L, 100, "Paris /TLOC/ slow slow #c"),
      (3L, 100, "X, Ontario /TLOC/ no tags"))
    val rows = TrendPipeline.hashtagRows(df).collect()
    assert(rows.length == 4) // #a, #b, #a, #c — doc 3 contributes none
    val byTag = rows.groupBy(_.getAs[String]("hashtag")).view.mapValues(_.length).toMap
    assert(byTag == Map("#a" -> 2, "#b" -> 1, "#c" -> 1))
    val countries = rows.map(r => r.getAs[String]("hashtag") -> r.getAs[String]("country")).toMap
    assert(countries("#a") == "USA" && countries("#c") == "NULL")
  }

  test("dedupTrends: one row per (ts, hashtag, country), min score kept, type recomputed") {
    val rows = Seq(
      (100, "#a", 3.5, "positive", "USA"),
      (100, "#a", 1.5, "negative", "USA"),
      (100, "#a", 2.5, "neutral", "FRANCE"),
      (200, "#a", 3.5, "positive", "USA"))
      .toDF("ts", "hashtag", "sentiment_score", "sentiment_type", "country")
    val got = TrendPipeline.dedupTrends(rows).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getString(3), r.getString(4)))
      .sortBy(r => (r._1, r._5))
    assert(got.toSeq == Seq(
      (100, "#a", 2.5, "neutral", "FRANCE"),
      (100, "#a", 1.5, "negative", "USA"),
      (200, "#a", 3.5, "positive", "USA")))
  }

  test("dedupTrends is idempotent") {
    val rows = Seq((100, "#a", 1.0, "negative", "USA"),
      (100, "#a", 2.0, "neutral", "USA"))
      .toDF("ts", "hashtag", "sentiment_score", "sentiment_type", "country")
    val once = TrendPipeline.dedupTrends(rows)
    val twice = TrendPipeline.dedupTrends(once)
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("topNTrends ranks per bucket with hashtag tiebreak") {
    val rows = Seq(
      (100, "#a"), (100, "#a"), (100, "#b"), (100, "#b"), (100, "#c"),
      (200, "#c"))
      .toDF("ts", "hashtag")
    val got = TrendPipeline.topNTrends(rows, 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._4))
    assert(got.toSeq == Seq(
      (100, "#a", 2L, 1L), (100, "#b", 2L, 2L), // tie broken by hashtag
      (200, "#c", 1L, 1L)))
  }

  test("topNTrends: custom-operator form equals the typed-aggregator baseline") {
    // driver corpus: real bucket/hashtag cardinality, string tiebreak
    val rows = TrendPipeline.trendRows(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val native = TrendPipeline.topNTrends(rows, 3)
    val agg = TrendPipeline.topNTrendsAgg(rows, 3)
    assert(native.columns.toSeq == agg.columns.toSeq)
    assert(native.exceptAll(agg).count() == 0 &&
      agg.exceptAll(native).count() == 0)
    assert(native.count() > 0)
  }

  test("countJoinSentiment joins counts with mean per hashtag") {
    val rows = Seq(
      (100, "#a", 1.0), (100, "#a", 3.0), (100, "#b", 2.0))
      .toDF("ts", "hashtag", "sentiment_score")
    val got = TrendPipeline.countJoinSentiment(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("#a", 2L, 2.0), ("#b", 1L, 2.0)))
  }

  test("trendSpikes: fires on a 2x jump after warm-up, never during warm-up") {
    // #x: counts 4,4,4,9,4 across buckets 0..4 — only bucket 3 doubles
    // its trailing mean; #y is huge from bucket 0 but has no history
    def burst(ts: Int, tag: String, n: Int) =
      Seq.fill(n)((ts, tag, 2.0))
    val rows = (burst(0, "#x", 4) ++ burst(1, "#x", 4) ++ burst(2, "#x", 4) ++
      burst(3, "#x", 9) ++ burst(4, "#x", 4) ++
      burst(0, "#y", 50) ++ burst(1, "#y", 50))
      .toDF("ts", "hashtag", "sentiment_score")
    val got = TrendPipeline.trendSpikes(rows).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getInt(r.fieldIndex("ts")) == 3 &&
      r.getAs[String]("hashtag") == "#x")
    assert(r.getAs[Long]("cnt") == 9L && r.getAs[Long]("prev_sum") == 12L)
    assert(r.getAs[Long]("spike_ratio_pm") == 2250L) // (1000*9*3) div 12
  }
}
