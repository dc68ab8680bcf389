package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.functions.Kmv

/** Stream/batch parity for the KMV distinct tracker: after any
  * trigger sequence the stream's estimate must equal the batch
  * Aggregator's over the concatenated input — same insert code, same
  * hash column, exact equality (not tolerance). */
class StreamingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def batchEstimate(rows: Seq[(String, Long)], k: Int): Map[String, Long] =
    rows.toDF("event_type", "user_id")
      .select(col("event_type"), xxhash64(col("user_id")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new Kmv.KmvAgg(k).toColumn.name("sk"))
      .toDF("event_type", "sk")
      .select(col("event_type"), Kmv.estimate(col("sk"), k).as("est"))
      .as[(String, Long)].collect().toMap

  test("exact mode: estimates are exact distinct counts, dups invisible") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val events = mem.toDF().toDF("event_type", "user_id")
    val q = StreamingDistinct.estimateStream(events, k = 64)
      .writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("update").format("memory").queryName("sd_exact")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    mem.addData((0L until 20L).map(u => ("click", u)): _*)
    q.processAllAvailable()
    // second trigger: 10 repeat users + 10 new ones, plus a new type
    mem.addData(((10L until 30L).map(u => ("click", u)) ++
      (0L until 5L).map(u => ("view", u))): _*)
    q.processAllAvailable()
    q.stop()
    val last = spark.table("sd_exact")
      .groupBy("event_type").agg(max("est_users").as("est"))
      .as[(String, Long)].collect().toMap
    assert(last == Map("click" -> 30L, "view" -> 5L))
  }

  test("estimation mode: stream estimate == batch estimate, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    val k = 128
    // 3 triggers, overlapping user ranges, two types, ~3000 distinct:
    // well past k so the sketch genuinely estimates
    val batches = Seq(
      (0L until 1500L).map(u => ("click", u)) ++
        (0L until 400L).map(u => ("view", u)),
      (1000L until 2500L).map(u => ("click", u)),
      (2000L until 3000L).map(u => ("click", u)) ++
        (200L until 800L).map(u => ("view", u)))
    val mem = MemoryStream[(String, Long)]
    val events = mem.toDF().toDF("event_type", "user_id")
    val q = StreamingDistinct.estimateStream(events, k = k)
      .writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("update").format("memory").queryName("sd_parity")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // last emission per type (estimates only revise upward)
    val streamed = spark.table("sd_parity")
      .groupBy("event_type").agg(max("est_users").as("est"))
      .as[(String, Long)].collect().toMap
    val batch = batchEstimate(batches.flatten, k)
    assert(streamed == batch,
      s"stream $streamed != batch $batch")
    // and the estimate is actually an estimate in range, not a restart
    assert(streamed("click") > 2000L && streamed("click") < 4000L)
    assert(streamed("view") > 500L && streamed("view") < 1100L)
  }
}
