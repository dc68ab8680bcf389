package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.functions.BottomK

/** Stream/batch parity for the bottom-k quantile tracker: after any
  * trigger sequence the stream's p50/p90 must equal the batch
  * sketch's over the concatenated input — same insert code, same hash
  * column, same rank convention, exact equality. */
class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def batchQuantiles(rows: Seq[(String, Long, Double)],
                             k: Int): Map[String, (Long, Long)] =
    rows.toDF("event_type", "event_id", "value")
      .select(col("event_type"), xxhash64(col("event_id")).as("h"),
        expr("cast(round(value * 1000000) as long)").as("v"))
      .filter(col("v").isNotNull)
      .as[(String, Long, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(new BottomK.BottomKAgg(k).toColumn.name("sk"))
      .toDF("event_type", "sk")
      .select(col("event_type"),
        BottomK.quantile(col("sk"), 0.5).as("p50"),
        BottomK.quantile(col("sk"), 0.9).as("p90"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

  test("stream p50/p90 == batch sketch after multi-trigger input with replays") {
    implicit val sqlCtx = spark.sqlContext
    val k = 16 // small: estimation mode is exercised, not just exact
    val mem = MemoryStream[(String, Long, Double)]
    val events = mem.toDF().toDF("event_type", "event_id", "value")
    val q = StreamingQuantiles.estimateStream(events, k)
      .writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("update").format("memory").queryName("sq")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    val batch1 = (0L until 40L).map(i => ("click", i, i.toDouble))
    val batch2 = (40L until 90L).map(i => ("click", i, (200 - i).toDouble)) ++
      (0L until 25L).map(i => ("error", i + 1000L, i * 0.5))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    // replay half of batch1 verbatim: at-least-once must be invisible
    mem.addData(batch1.take(20): _*)
    q.processAllAvailable()
    q.stop()

    // last emission per type
    val emitted = spark.table("sq").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("retained"),
        r.getAs[Long]("p50_micro"), r.getAs[Long]("p90_micro")))
    val last = emitted.zipWithIndex.groupBy(_._1._1)
      .map { case (t, rows) => t -> rows.maxBy(_._2)._1 }
    val want = batchQuantiles(batch1 ++ batch2, k)
    assert(last("click")._3 == want("click")._1 &&
      last("click")._4 == want("click")._2)
    assert(last("error")._3 == want("error")._1 &&
      last("error")._4 == want("error")._2)
    // bounded state: retained never exceeds k
    assert(emitted.forall(_._2 <= k))
  }

  test("checkpoint recovery: state survives a restart, estimates continue exactly") {
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    val ckpt = Files.createTempDirectory("ckpt").toString
    val batch1 = (0L until 60L).map(i => ("click", i, i.toDouble))
    val batch2 = (60L until 120L).map(i => ("click", i, (300 - i).toDouble))

    // foreachBatch sink: the memory sink refuses checkpoint recovery
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def sink(df: org.apache.spark.sql.Dataset[
        StreamingQuantiles.QuantileEstimate], id: Long): Unit =
      df.collect().foreach(e => emitted.add((e.p50_micro, e.p90_micro)))

    val mem1 = MemoryStream[(String, Long, Double)]
    val q1 = StreamingQuantiles.estimateStream(
        mem1.toDF().toDF("event_type", "event_id", "value"), k)
      .writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("update").foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    mem1.addData(batch1: _*)
    q1.processAllAvailable()
    q1.stop()

    // NEW query instance from the same checkpoint: the per-key buffer
    // must be restored, so post-restart estimates equal the batch
    // sketch over batch1 ++ batch2
    val mem2 = MemoryStream[(String, Long, Double)]
    mem2.addData(batch1: _*) // source replay: offsets already committed
    val q2 = StreamingQuantiles.estimateStream(
        mem2.toDF().toDF("event_type", "event_id", "value"), k)
      .writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("update").foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    mem2.addData(batch2: _*)
    q2.processAllAvailable()
    q2.stop()

    val last = emitted.toArray(Array.empty[(Long, Long)]).last
    val want = batchQuantiles(batch1 ++ batch2, k)("click")
    assert(last._1 == want._1 && last._2 == want._2,
      s"post-restart estimates diverged: $last vs $want")
  }
}
