package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamingSpikesSpec extends SparkSpec {
  import spark.implicits._

  test("a closed bucket at 2x its trailing mean fires exactly once, warm-up never") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val rows = mem.toDF().toDF("hashtag", "ts")
    def bucket(tag: String, ts: Long, n: Int) = Seq.fill(n)((tag, ts))
    // #x: 4,4,4,9 then a bucket-5 event to close bucket 4
    mem.addData(bucket("#x", 1, 4) ++ bucket("#x", 2, 4) ++ bucket("#x", 3, 4) ++
      bucket("#x", 4, 9) ++ bucket("#x", 5, 1): _*)
    val q = StreamingSpikes.spikeStream(rows)
      .writeStream.trigger(Trigger.AvailableNow())
      .outputMode("update").format("memory").queryName("spk_fire")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.awaitTermination(60000)
    val got = spark.table("spk_fire").as[StreamingSpikes.Spike].collect()
    assert(got.length == 1)
    assert(got.head == StreamingSpikes.Spike("#x", 4L, 9L, 12L, 2250L))
  }

  test("an open bucket accumulates across triggers before it is judged") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val rows = mem.toDF().toDF("hashtag", "ts")
    val q = StreamingSpikes.spikeStream(rows, lookback = 2)
      .writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("update").format("memory").queryName("spk_acc")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    def bucket(ts: Long, n: Int) = Seq.fill(n)(("#t", ts))
    mem.addData(bucket(1, 2) ++ bucket(2, 2): _*)
    q.processAllAvailable()
    // bucket 3 splits across two triggers: 1 event now, 3 more later
    mem.addData(bucket(3, 1): _*)
    q.processAllAvailable()
    assert(spark.table("spk_acc").isEmpty, "nothing closed at 2x yet")
    mem.addData(bucket(3, 3) ++ bucket(4, 1): _*)
    q.processAllAvailable()
    q.stop()
    // bucket 3 closed with the FULL count 4 vs trailing mean 2 -> fires
    val got = spark.table("spk_acc").as[StreamingSpikes.Spike].collect()
    assert(got.toSeq == Seq(StreamingSpikes.Spike("#t", 3L, 4L, 4L, 2000L)))
  }

  test("parity with the batch operator on in-order data, closed buckets only") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic pseudo-random per-bucket counts over 3 tags
    val series = for {
      tag <- Seq("#a", "#b", "#c")
      ts <- 1L to 8L
    } yield (tag, ts, 1 + ((ts * 7 + tag.hashCode.abs) % 5).toInt)
    val events = series.flatMap { case (tag, ts, n) => Seq.fill(n)((tag, ts)) }
    val mem = MemoryStream[(String, Long)]
    events.grouped(20).foreach(g => mem.addData(g: _*))
    val q = StreamingSpikes.spikeStream(
        mem.toDF().toDF("hashtag", "ts"), factorPm = 1100L)
      .writeStream.trigger(Trigger.AvailableNow())
      .outputMode("update").format("memory").queryName("spk_par")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.awaitTermination(60000)
    val stream = spark.table("spk_par").as[StreamingSpikes.Spike].collect()
      .map(s => (s.hashtag, s.ts, s.cnt, s.prev_sum, s.spike_ratio_pm)).toSet
    // batch twin over the same rows; drop each tag's final (still-open)
    // bucket, which streaming by definition has not judged yet
    val batchRows = events.toDF("hashtag", "ts")
      .withColumn("sentiment_score", org.apache.spark.sql.functions.lit(2.0))
    val batch = graft.ops.TrendPipeline.trendSpikes(batchRows, factorPm = 1100L)
      .collect()
      .map(r => (r.getAs[String]("hashtag"), r.getAs[Long]("ts"),
        r.getAs[Long]("cnt"), r.getAs[Long]("prev_sum"),
        r.getAs[Long]("spike_ratio_pm")))
      .filter(_._2 < 8L).toSet
    assert(stream == batch, s"stream=$stream batch=$batch")
  }
}
