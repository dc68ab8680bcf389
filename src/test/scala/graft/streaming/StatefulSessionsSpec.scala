package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** flatMapGroupsWithState sessionization: batch twin ≡ lag/cumsum form,
  * streaming emits each closed session exactly once (in-batch gap close
  * + event-time timeout close). */
class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("batch twin matches Windows.userSessions on (user, start, end, n)") {
    // 3 users, interleaved, multiple sessions each, ties included
    val rows = Seq(
      (1L, 101L, 100L), (1L, 102L, 160L), (1L, 103L, 2200L), (1L, 104L, 2100L),
      (2L, 201L, 50L), (2L, 202L, 1850L), (2L, 203L, 5000L),
      (3L, 301L, 9L), (3L, 302L, 9L))
    val events = rows.toDF("user_id", "event_id", "sec")
      .select(col("user_id"), col("event_id"), col("sec").cast("timestamp").as("ts"))
    val viaState = StatefulSessions.sessionizeBatch(events).collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
    val viaLag = graft.ops.Windows.userSessions(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
        r.getAs[Long]("session_end"), r.getAs[Long]("n_events"))).toSet
    assert(viaState == viaLag)
    // sanity: user 1 has one merged session (gap 2200-160 > 1800 splits;
    // 2100 then 2200 sort together) → sessions (100,160,2) and (2100,2200,2)
    assert(viaState.contains((1L, 100L, 160L, 2L)))
    assert(viaState.contains((1L, 2100L, 2200L, 2L)))
  }

  test("streaming: gap close in-batch, timeout close via watermark, no dups") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val sessions = StatefulSessions.sessionizeStream(
      mem.toDF().toDF("user_id", "sec"), gapSec = 1800L, watermark = "0 seconds")
    val ckpt = Files.createTempDirectory("sess_ckpt").toString
    val name = "stateful_sessions_out"
    val q = sessions.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    def emitted(): Set[(Long, Long, Long, Long)] =
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
          r.getAs[Long]("session_end"), r.getAs[Long]("n_events"))).toSet
    try {
      // batch 1: user 1 opens a session — nothing closed yet
      mem.addData((1L, 100L), (1L, 200L))
      q.processAllAvailable()
      assert(emitted().isEmpty)
      // batch 2: user 1 jumps past the gap → [100,200] closes in-batch;
      // the new open session [5000] stays in state
      mem.addData((1L, 5000L))
      q.processAllAvailable()
      assert(emitted() == Set((1L, 100L, 200L, 2L)))
      // batch 3: user 2 far in the future advances the watermark past
      // 5000+1800 → user 1's open session times out and emits (the
      // no-data batch after this one runs the timeout)
      mem.addData((2L, 100000L))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(emitted().contains((1L, 5000L, 5000L, 1L)))
      // exactly once: no duplicate of the first session
      assert(emitted().count(_ == (1L, 100L, 200L, 2L)) == 1)
      // user 2's session is still open (watermark has not passed it)
      assert(!emitted().exists(_._1 == 2L))
    } finally q.stop()
  }

  test("open-session state survives a kill/restart (state-store recovery)") {
    // an open session built before the kill must close correctly after
    // the restart — only possible if the state store recovered (a lost
    // state would silently start a fresh session and emit nothing)
    val in = Files.createTempDirectory("sess_in").toString
    val ckpt = Files.createTempDirectory("sess_ckpt3").toString
    val emitted = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long, Long, Long)]()
    def run(): Unit = {
      val rows = TweetSource.FileSource(in).load(spark).select(
        split(col("value"), ",")(0).cast("long").as("user_id"),
        split(col("value"), ",")(1).cast("long").as("sec"))
      val q = StatefulSessions.sessionizeStream(rows, 1800L, "0 seconds")
        .toDF()
        .writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r =>
            emitted.add((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
        }.start()
      q.awaitTermination(60000)
    }
    java.nio.file.Files.writeString(java.nio.file.Path.of(in, "a.txt"), "1,100\n1,200")
    run()
    assert(emitted.isEmpty, "no session should close before the gap")
    java.nio.file.Files.writeString(java.nio.file.Path.of(in, "b.txt"), "1,5000")
    run()
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toList == List((1L, 100L, 200L, 2L)),
      s"pre-kill session state lost or duplicated: ${emitted.asScala.toList}")
  }

  test("streaming: in-watermark out-of-order events merge into the open session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val sessions = StatefulSessions.sessionizeStream(
      mem.toDF().toDF("user_id", "sec"), gapSec = 1800L, watermark = "1 hour")
    val ckpt = Files.createTempDirectory("sess_ckpt2").toString
    val name = "stateful_sessions_ooo"
    val q = sessions.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((1L, 1000L), (1L, 1500L))
      q.processAllAvailable()
      // 900 is older than the open session's start but within watermark
      mem.addData((1L, 900L))
      q.processAllAvailable()
      // close it by gap with a later event, then check the merged bounds
      mem.addData((1L, 9000L))
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
          r.getAs[Long]("n_events"))).toSet
      assert(got == Set((900L, 1500L, 3L)))
    } finally q.stop()
  }
}
