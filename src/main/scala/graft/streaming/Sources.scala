package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.WireCodec

/** Streaming sources (SRC-1/SRC-2/SRC-3, SURVEY §2.1).
  *
  * The reference consumes a Kafka direct stream
  * (`KafkaSparkProcessor.scala:75-88`); no Kafka connector jar ships in
  * this environment, so sources hide behind a trait that keeps the Kafka
  * option names (`subscribe`, `startingOffsets`, `failOnDataLoss`) for a
  * drop-in `format("kafka")` implementation on a real cluster. Every
  * implementation emits the reference's record shape: one string column
  * `value` holding a `location /TLOC/ text` wire line (P-1's
  * `CAST(value AS STRING)` is the contract).
  */
trait TweetSource {
  /** Streaming DataFrame with a single `value: string` column. */
  def load(spark: SparkSession): DataFrame
}

object TweetSource {

  /** Kafka-shaped option bag (names match the reference's consumer config,
    * `KafkaSparkProcessor.scala:75-84`). */
  final case class Options(
      subscribe: String = "tweets-1",
      startingOffsets: String = "latest",
      failOnDataLoss: Boolean = false)

  /** File-backed source: each text file line is one Kafka record value.
    * The streaming analog of `spark.readStream.format("kafka")` for an
    * offline environment — new files are new offsets. `maxFilesPerTrigger`
    * caps files per micro-batch (the analog of Kafka's
    * `maxOffsetsPerTrigger`), so a bounded backlog drains in a
    * predictable number of batches instead of one giant one. */
  final case class FileSource(dir: String, opts: Options = Options(),
                              maxFilesPerTrigger: Option[Int] = None) extends TweetSource {
    def load(spark: SparkSession): DataFrame = {
      val r = spark.readStream
      maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toString))
      r.text(dir).select(col("value").cast("string").as("value"))
    }
  }

  /** Rate-driven synthetic firehose (SRC-1): the built-in `rate` source
    * provides (timestamp, value) rows at rowsPerSecond; each id is mapped
    * deterministically through [[SyntheticTweets]] — the offline stand-in
    * for the twitter4j listener + bounded queue
    * (`KafkaTwitterProducer.java:20, 44-73`). */
  final case class RateSource(rowsPerSecond: Int, opts: Options = Options()) extends TweetSource {
    def load(spark: SparkSession): DataFrame =
      SyntheticTweets.wireLines(
        spark.readStream.format("rate")
          .option("rowsPerSecond", rowsPerSecond.toString).load()
          .select(col("value").as("id")))
  }
}

/** SRC-1's generator half: deterministic synthetic tweets from an id
  * column, with the producer-side semantics of
  * `KafkaTwitterProducer.java:77-113`:
  *   - keyword + language filtering is pushed INTO generation (the
  *     reference filters at the Twitter API, `:71-73`) — rows that would
  *     fail the filter are never emitted;
  *   - P-12: drop null-location / zero-hashtag rows *before* the wire
  *     encode (`:102`);
  *   - the wire format is `location /TLOC/ text` (`:108`).
  */
object SyntheticTweets {

  val Keywords = Seq("spark", "data", "stream")

  /** Deterministic tweet fields for an id (pure column arithmetic —
    * distributed, no driver-side generation). ~1/7 of ids get a null
    * location and ~1/5 no hashtag, exercising the P-12 filter. */
  def rawTweets(ids: DataFrame): DataFrame = {
    val id = col("id")
    val kw = element_at(
      array(Keywords.map(k => lit("#" + k)): _*), (pmod(id, lit(3)) + 1).cast("int"))
    val text = when(pmod(id, lit(5)) === 0, concat(lit("no tags here id "), id))
      .otherwise(concat(lit("live "), kw, lit(" update "), id,
        when(pmod(id, lit(2)) === 0, lit(" fast fast")).otherwise(lit(" slow"))))
    val location = when(pmod(id, lit(7)) === 0, lit(null).cast("string"))
      .when(pmod(id, lit(3)) === 0, "Austin, TX")
      .when(pmod(id, lit(3)) === 1, "Toronto, Ontario")
      .otherwise("Paris")
    ids.select(id.as("id"), location.as("location"), text.as("text"))
  }

  /** P-12 filter + wire encode: the emitted Kafka record values. */
  def wireLines(ids: DataFrame): DataFrame =
    rawTweets(ids)
      .filter(col("location").isNotNull &&
        size(graft.text.TextOps.extractHashtags(col("text"))) > 0)
      .select(WireCodec.encodeTweet(col("location"), col("text")).as("value"))
}

/** SRC-3 (`KafkaTwitterProducer.java:116-130`): line-by-line credentials
  * file reader — driver-side config, not a dataflow operator. */
object Credentials {
  def read(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().toList finally src.close()
  }
}
