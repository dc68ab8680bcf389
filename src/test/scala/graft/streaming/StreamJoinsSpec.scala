package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("interval join pairs each click with every purchase in its trailing window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Double, Timestamp)]
    // user 1: purchases at t=100 and t=500, click at t=600 with a
    // 3600s window sees both; user 2's purchase belongs to user 2 only
    clicks.addData((10L, 1L, ts(600)), (11L, 2L, ts(600)))
    purchases.addData((1L, 5.0, ts(100)), (1L, 7.0, ts(500)), (2L, 9.0, ts(550)))
    val joined = StreamJoins.clickPurchaseInterval(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      purchases.toDF().toDF("user_id", "value", "ts"))
    val q = joined.writeStream.trigger(Trigger.AvailableNow()).format("memory")
      .queryName("ssj_pairs")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.awaitTermination(60000)
    val got = spark.table("ssj_pairs")
      .select("event_id", "purchase_value").as[(Long, Double)].collect().toSet
    assert(got == Set((10L, 5.0), (10L, 7.0), (11L, 9.0)))
  }

  test("a purchase before the window never joins") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Double, Timestamp)]
    clicks.addData((10L, 1L, ts(5000)))
    purchases.addData((1L, 5.0, ts(100)),   // 4900s before: outside 3600s
      (1L, 7.0, ts(2000)))                  // 3000s before: inside
    val joined = StreamJoins.clickPurchaseInterval(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      purchases.toDF().toDF("user_id", "value", "ts"))
    val q = joined.writeStream.trigger(Trigger.AvailableNow()).format("memory")
      .queryName("ssj_window")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.awaitTermination(60000)
    val got = spark.table("ssj_window")
      .select("purchase_value").as[Double].collect().toSet
    assert(got == Set(7.0))
  }

  test("left-outer emits the unmatched click with NULLs once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Double, Timestamp)]
    val joined = StreamJoins.clickPurchaseInterval(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      purchases.toDF().toDF("user_id", "value", "ts"),
      windowSec = 60L, watermark = "10 seconds", joinType = "leftOuter")
    val q = joined.writeStream.trigger(Trigger.ProcessingTime(0)).format("memory")
      .queryName("ssj_outer")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    clicks.addData((10L, 1L, ts(100)))
    purchases.addData((2L, 1.0, ts(100)))   // different user: no match
    q.processAllAvailable()
    // advance BOTH watermarks far past click_time + window
    clicks.addData((11L, 1L, ts(1000)))
    purchases.addData((2L, 1.0, ts(1000)))
    q.processAllAvailable()
    clicks.addData((12L, 1L, ts(2000)))
    purchases.addData((2L, 1.0, ts(2000)))
    q.processAllAvailable()
    q.stop()
    val unmatched = spark.table("ssj_outer")
      .where($"event_id" === 10L).collect()
    assert(unmatched.length == 1)
    assert(unmatched.head.isNullAt(unmatched.head.fieldIndex("purchase_value")),
      "click 10 must surface with NULL purchase after watermark closes its window")
  }
}
