package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: schema, per-partition decode batching, stub
  * invariants, metadata-only plans, bridge into similarity search. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abc"), (1L, "defg"), (2L, "hi"), (3L, "abc")).toDF("doc_id", "text")

  test("syntheticMedia: binary payload + typed metadata struct") {
    val m = Multimodal.syntheticMedia(docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val metaFields = m.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.metaType.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = m.filter(col("media_id") === 1L).collect().head
    assert(r.getAs[String]("kind") == "audio")
    assert(new String(r.getAs[Array[Byte]]("bytes"), "UTF-8") == "defg")
  }

  test("extractFeatures: histogram features sum to byte count, bytes dropped") {
    val got = Multimodal.extractFeatures(Multimodal.syntheticMedia(docs), dim = 16)
      .collect().map(f => f.media_id -> f).toMap
    assert(got(0L).n_bytes == 3L && got(0L).features.sum == 3.0f)
    assert(got(1L).n_bytes == 4L && got(1L).features.map(_.toLong).sum == 4L)
    assert(got(0L).features.length == 16)
    // determinism: same payload -> same features
    assert(got(0L).features.toSeq == got(3L).features.toSeq)
  }

  test("resizePlan fits the box preserving aspect ratio in integer math") {
    val m = Seq((1L, "image", (1280, 720)), (2L, "image", (320, 640)))
      .map { case (id, k, (w, h)) => (id, k, w, h) }
      .toDF("media_id", "kind", "w", "h")
      .select(col("media_id"), col("kind"),
        struct(col("w").as("width"), col("h").as("height"),
          lit(44100).as("sample_rate"), lit(1000L).as("duration_ms"),
          lit("png").as("format")).as("meta"))
    val got = Multimodal.resizePlan(m, 640, 360).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("target_width"), r.getAs[Long]("target_height"))).toMap
    assert(got(1L) == (640L, 360L))   // 16:9 fills the box exactly
    assert(got(2L) == (180L, 360L))   // tall image: height-bound
  }

  test("frameSamplePlan: one row per sampled frame, videos only") {
    val got = Multimodal.frameSamplePlan(Multimodal.syntheticMedia(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 2 is the only video (2 % 3 == 2); duration 2*1000+1000 = 3000ms
    assert(got.toSeq.sorted == Seq((2L, 0L), (2L, 1000L), (2L, 2000L)))
  }

  test("corrupt metadata: zero dims -> NULL resize targets; zero duration -> no frames") {
    val m = Seq((1L, "video", 0, 0, 0L), (2L, "video", 100, 50, 2500L))
      .toDF("media_id", "kind", "w", "h", "d")
      .select(col("media_id"), col("kind"),
        struct(col("w").as("width"), col("h").as("height"),
          lit(44100).as("sample_rate"), col("d").as("duration_ms"),
          lit("mp4").as("format")).as("meta"))
    val resized = Multimodal.resizePlan(m, 640, 360).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Any]("target_width"), r.getAs[Any]("target_height"))).toMap
    assert(resized(1L) == ((null, null)))
    assert(resized(2L) == ((640L, 320L)))
    val frames = Multimodal.frameSamplePlan(m).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.toSeq.sorted == Seq((2L, 0L), (2L, 1000L), (2L, 2000L)))
  }

  test("mediaDedup collapses identical payloads, prices the reclaim") {
    val got = Multimodal.mediaDedup(Multimodal.syntheticMedia(docs))
      .collect()
      .map(r => r.getAs[Long]("keep_id") ->
        (r.getAs[Long]("n_copies"), r.getAs[Long]("bytes_reclaimed"))).toMap
    // docs 0 and 3 share payload "abc": keeper 0, one 3-byte copy freed
    assert(got(0L) == ((2L, 3L)))
    assert(got(1L) == ((1L, 0L)) && got(2L) == ((1L, 0L)))
    assert(got.size == 3)
  }

  test("mediaNearDup bridges features into embedding LSH (identical payloads pair)") {
    val pairs = Multimodal.mediaNearDup(Multimodal.syntheticMedia(docs))
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.toSeq == Seq((0L, 3L))) // same "abc" payload
  }
}
