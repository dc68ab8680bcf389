package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def run(mem: MemoryStream[(Long, String)], name: String): Unit = {
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingHeavyHitters.candidateStream(docs, capacity = 4, nShards = 2)
      .writeStream.trigger(Trigger.AvailableNow())
      .outputMode("update").format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.awaitTermination(60000)
  }

  test("candidates are bounded by capacity per shard even under many distinct tokens") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // 40 distinct tokens through capacity-4 sketches: state cannot track
    // them all — the emitted candidate sets must stay within bound
    mem.addData((0L until 40L).map(i => (i, s"tok$i heavy heavy")): _*)
    run(mem, "shh_bound")
    val rows = spark.table("shh_bound")
      .groupBy("shard").count().collect()
    rows.foreach(r => assert(r.getAs[Long]("count") <= 4L,
      s"shard ${r.get(0)} emitted ${r.get(1)} candidates, capacity is 4"))
  }

  test("a token above the per-shard MG threshold always survives as a candidate") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // 'heavy' appears in every doc (40 of ~120 tokens); with capacity 4
    // the guarantee threshold is N_shard/5 and 'heavy' is far above it
    mem.addData((0L until 40L).map(i => (i, s"heavy filler$i noise$i")): _*)
    run(mem, "shh_guarantee")
    val cands = spark.table("shh_guarantee")
      .select("token").as[String].collect().toSet
    assert(cands.contains("heavy"))
  }

  test("state persists across triggers: estimates accumulate and revise upward") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingHeavyHitters.candidateStream(docs, capacity = 4, nShards = 1)
      .writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("update").format("memory").queryName("shh_acc")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    mem.addData((1L, "alpha alpha"))
    q.processAllAvailable()
    val est1 = spark.table("shh_acc").where($"token" === "alpha")
      .agg(org.apache.spark.sql.functions.max("est")).as[Long].head()
    mem.addData((2L, "alpha alpha alpha"))
    q.processAllAvailable()
    val est2 = spark.table("shh_acc").where($"token" === "alpha")
      .agg(org.apache.spark.sql.functions.max("est")).as[Long].head()
    q.stop()
    assert(est1 == 2L)
    assert(est2 == 5L, "second trigger must fold into retained state, not restart")
  }

  test("streaming candidate union covers every batch heavy hitter on the driver corpus") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    implicit val sqlCtx = spark.sqlContext
    val docsBatch = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val heavy = graft.llm.HeavyHitters.heavyHitters(docsBatch)
      .select("token").as[String].collect().toSet
    assert(heavy.nonEmpty)
    val mem = MemoryStream[(Long, String)]
    docsBatch.select("doc_id", "text").as[(Long, String)].collect()
      .grouped(100).foreach(batch => mem.addData(batch.toSeq: _*))
    // default capacity (64): per-shard threshold N_shard/65 <= N/65 is
    // strictly tighter than the batch gate's N/32, so coverage is a
    // guarantee, not luck
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingHeavyHitters.candidateStream(docs)
      .writeStream.trigger(Trigger.AvailableNow())
      .outputMode("update").format("memory").queryName("shh_cover")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.awaitTermination(60000)
    // final-trigger estimates: keep each shard's last emission per token
    val cands = spark.table("shh_cover").select("token").as[String].collect().toSet
    assert(heavy.subsetOf(cands),
      s"missing: ${heavy.diff(cands).take(5)} of ${heavy.size} heavy tokens")
  }
}
