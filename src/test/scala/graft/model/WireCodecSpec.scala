package graft.model

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** P-6/P-10/T-2 wire codec: roundtrips and malformed-input safety
  * (ADVICE round 1: ANSI mode must not kill the job on bad records). */
class WireCodecSpec extends SparkSpec {
  import spark.implicits._

  test("tweet encode/decode roundtrip") {
    val df = Seq(("Boston, MA", "hello #world")).toDF("loc", "txt")
      .select(WireCodec.encodeTweet(col("loc"), col("txt")).as("line"))
    val got = df.select(
      WireCodec.tweetLocation(col("line")).as("l"),
      WireCodec.tweetText(col("line")).as("t")).collect().head
    assert(got.getString(0) == "Boston, MA" && got.getString(1) == "hello #world")
  }

  test("null location still emits the delimiter (positional decode keeps text in slot 2)") {
    val df = Seq(Tuple1("some #text")).toDF("txt")
      .select(WireCodec.encodeTweet(lit(null), col("txt")).as("line"))
    val got = df.select(WireCodec.tweetLocation(col("line")).as("l"),
      WireCodec.tweetText(col("line")).as("t")).collect().head
    assert(got.getString(0) == "" && got.getString(1) == "some #text")
  }

  test("malformed line (no delimiter) yields NULL text, not an ANSI error") {
    val got = evalText[String](Seq("no delimiter here"))(
      WireCodec.tweetText(col("text")))
    assert(got == Seq(null))
  }

  test("text embedding the delimiter is truncated at first occurrence (wire fidelity)") {
    val got = evalText[String](Seq("a /TLOC/ b /TLOC/ c"))(
      WireCodec.tweetText(col("text")))
    assert(got == Seq("b"))
  }

  test("metric encode/decode roundtrip with types") {
    val df = Seq(("#spark", 2.5, "neutral", "USA")).toDF("h", "s", "t", "c")
      .select(WireCodec.encodeMetric(col("h"), col("s"), col("t"), col("c")).as("line"))
    val got = df.select(WireCodec.decodeMetric(col("line")).as("m"))
      .select("m.*").collect().head
    assert(got.getString(0) == "#spark")
    assert(got.getDouble(1) == 2.5)
    assert(got.getString(2) == "neutral")
    assert(got.getString(3) == "USA")
  }

  test("encodeMetric: NULL fields keep their wire slots (no concat_ws skip-shift)") {
    val df = Seq(Tuple1("#h")).toDF("h")
      .select(WireCodec.encodeMetric(
        col("h"), lit(null).cast("double"), lit(null).cast("string"),
        lit("USA")).as("line"))
    assert(df.collect().head.getString(0) == "#h /TLOC/  /TLOC/  /TLOC/ USA")
    val dec = df.select(WireCodec.decodeMetric(col("line")).as("m"))
      .select("m.*").collect().head
    assert(dec.getString(0) == "#h" && dec.isNullAt(1) && dec.getString(3) == "USA")
  }

  test("decodeMetric: non-numeric score field becomes NULL, no exception") {
    val got = textDf("text", Seq("#h /TLOC/ not-a-number /TLOC/ x /TLOC/ y"))
      .select(WireCodec.decodeMetric(col("text")).as("m"))
      .select("m.sentiment_score").collect().head
    assert(got.isNullAt(0))
  }
}
