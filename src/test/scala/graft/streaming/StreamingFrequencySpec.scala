package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.functions.CountMin

/** Stream/batch parity for the Count-Min tracker: after any trigger
  * sequence the stream's per-user estimates must equal the batch
  * sketch's over the concatenated input — same bucket arithmetic,
  * integer-exact, and the state is one fixed-size array per type. */
class StreamingFrequencySpec extends SparkSpec {
  import spark.implicits._

  private def batchEst(rows: Seq[(String, Long)]): Map[(String, Long), Long] = {
    val byType = rows.groupBy(_._1)
    byType.flatMap { case (t, rs) =>
      val agg = new CountMin.CmsAgg
      val sk = rs.foldLeft(agg.zero)((b, r) => agg.reduce(b, r._2))
      rs.map(_._2).distinct.map { u =>
        (t, u) -> (0 until CountMin.D)
          .map(i => sk(i * CountMin.W + CountMin.bucket(i, u))).min
      }
    }
  }

  test("final stream estimates == batch CMS over concatenated input") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val events = mem.toDF().toDF("event_type", "user_id")
    val q = StreamingFrequency.estimateStream(events)
      .writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("update").format("memory").queryName("sf_cms")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    // skewed: user u appears ~60/u times, two types, across two triggers
    val batch1 = (1L to 30L).flatMap(u => Seq.fill((60 / u).toInt)(("click", u)))
    val batch2 = (1L to 30L).flatMap(u => Seq.fill((30 / u).toInt)(("click", u))) ++
      (1L to 10L).map(u => ("error", u))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val all = batch1 ++ batch2
    val want = batchEst(all)
    // the FINAL estimate per (type, user) is the MAX emission: CMS
    // counters only ever grow, so the running estimate is monotone
    // non-decreasing across triggers — max is order-independent, where
    // inferring "last" from collect() row order leaned on an
    // undocumented memory-sink ordering guarantee (round-12 advice)
    val rows = spark.table("sf_cms").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val last = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    last.foreach { case (k, est) =>
      assert(est === want(k), s"stream/batch divergence for $k")
    }
    // every key the batch saw was emitted at least once
    assert(last.keySet === want.keySet)
    // never undercounts the exact frequency
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    last.foreach { case (k, est) => assert(est >= exact(k)) }
  }

  test("state is one fixed-size array regardless of key cardinality") {
    // 10k distinct users through one reduce loop: the array never grows
    val agg = new CountMin.CmsAgg
    val sk = (1L to 10000L).foldLeft(agg.zero)((b, u) => agg.reduce(b, u))
    assert(sk.length === CountMin.D * CountMin.W)
    assert(sk.sum === 10000L * CountMin.D)
  }
}
