package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.llm.{MediaCodec, Multimodal}

/** The REAL media codec under Structured Streaming: stream ≡ batch on
  * identical payloads, corrupt payloads flow through as quarantine
  * rows instead of killing the query, and no binary column survives
  * past the decode stage. */
class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def payloads: Seq[(Long, String, Array[Byte])] = Seq(
    (0L, "image", MediaCodec.encodeBmp(0L, "stream me")),
    (8L, "image", MediaCodec.encodeBmp(8L, "stream me")),
    (1L, "audio", MediaCodec.encodeWav(1L, 9)),
    (2L, "video", "opaque container".getBytes),
    (99L, "image", "corrupt not a bmp".getBytes))

  test("streaming decode ≡ batch decode; corrupt rows survive as decode_ok=0") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val media = mem.toDF().toDF("media_id", "kind", "bytes")
    val q = MediaStream.decodeStream(media)
      .writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("append").format("memory").queryName("media_decode")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    mem.addData(payloads.take(3): _*)
    q.processAllAvailable()
    mem.addData(payloads.drop(3): _*) // second trigger incl. the poison row
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("media_decode")
    val batch = Multimodal.extractFeatures(
      payloads.toDF("media_id", "kind", "bytes")).toDF()
    assert(streamed.count() == 5)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "stream must equal batch row-for-row")
    // the poison payload surfaced, did not kill the query
    assert(streamed.filter(col("decode_ok") === 0L).count() == 1)
    // identical payloads decode identically across triggers
    val f = streamed.filter(col("media_id").isin(0L, 8L))
      .drop("media_id").distinct()
    assert(f.count() == 1)
    // decode output schema carries no binary column
    assert(!streamed.schema.fields.exists(_.dataType.typeName == "binary"))
  }

  test("routed: quarantine is count-only and byte-free, features flow on") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val (good, bad) = MediaStream.routed(
      mem.toDF().toDF("media_id", "kind", "bytes"))
    val qg = good.writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("append").format("memory").queryName("media_good")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    val qb = bad.writeStream.trigger(Trigger.ProcessingTime(0))
      .outputMode("complete").format("memory").queryName("media_bad")
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    mem.addData(payloads: _*)
    qg.processAllAvailable(); qb.processAllAvailable()
    qg.stop(); qb.stop()
    assert(spark.table("media_good").count() == 4)
    val badRows = spark.table("media_bad").collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("n_failed")).toMap
    assert(badRows == Map("image" -> 1L))
  }
}
