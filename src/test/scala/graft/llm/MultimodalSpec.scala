package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing over REAL codecs: schema, per-partition decode
  * batching, decode-failure rows, metadata-only plans, payload dedup,
  * bridge into similarity search. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // ids 0/8 share image dims (mod 8) and text → byte-identical BMPs
  private def docs = Seq(
    (0L, "abc"), (1L, "defg"), (2L, "hi"), (8L, "abc")).toDF("doc_id", "text")

  test("syntheticMedia: real BMP/WAV payloads + typed metadata struct") {
    val m = Multimodal.syntheticMedia(docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val metaFields = m.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.metaType.fields.map(f => (f.name, f.dataType)).toSeq)
    val byId = m.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(byId(0L).getAs[String]("kind") == "image")
    assert(new String(byId(0L).getAs[Array[Byte]]("bytes").take(2)) == "BM")
    assert(byId(1L).getAs[String]("kind") == "audio")
    assert(new String(byId(1L).getAs[Array[Byte]]("bytes").take(4)) == "RIFF")
    assert(byId(2L).getAs[String]("kind") == "video")
  }

  test("extractFeatures: REAL ImageIO/AudioSystem decode, bytes dropped") {
    val got = Multimodal.extractFeatures(Multimodal.syntheticMedia(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(!got.values.exists(_.decode_ok != 1L))
    // image 0: decoded stats equal the generator formulas
    val (w, h) = MediaCodec.imageDims(0L)
    val px = for (y <- 0 until h; x <- 0 until w)
      yield MediaCodec.pixel(x, y, w, "abc")
    val f0 = got(0L)
    assert(f0.width.contains(w.toLong) && f0.height.contains(h.toLong))
    assert(f0.sum_r.contains(px.map(_._1.toLong).sum))
    assert(f0.sum_b.contains(px.map(_._3.toLong).sum))
    // identical payload → identical features
    assert(f0.copy(media_id = 8L) == got(8L))
    // audio 1: real WAV decode
    val f1 = got(1L)
    assert(f1.sample_rate.contains(MediaCodec.audioRate(1L).toLong))
    assert(f1.n_samples.contains(MediaCodec.audioSamples(1L).toLong))
    // video 2: opaque pass-through, NULL features
    assert(got(2L).n_bytes == 2L && got(2L).width.isEmpty &&
      got(2L).sum_abs.isEmpty)
  }

  test("corrupt payload yields decode_ok=0 row, not a failed task") {
    val bad = Seq((99L, "image", "not a bmp".getBytes)).toDF(
      "media_id", "kind", "bytes")
    val r = Multimodal.extractFeatures(bad).collect().head
    assert(r.decode_ok == 0L && r.n_bytes == 9L && r.width.isEmpty)
  }

  test("resizePlan fits the box preserving aspect ratio in integer math") {
    val m = Seq((1L, "image", (1280, 720)), (2L, "image", (320, 640)))
      .map { case (id, k, (w, h)) => (id, k, w, h) }
      .toDF("media_id", "kind", "w", "h")
      .select(col("media_id"), col("kind"),
        struct(col("w").as("width"), col("h").as("height"),
          lit(44100).as("sample_rate"), lit(1000L).as("duration_ms"),
          lit("bmp").as("format")).as("meta"))
    val got = Multimodal.resizePlan(m, 640, 360).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("target_width"), r.getAs[Long]("target_height"))).toMap
    assert(got(1L) == (640L, 360L))   // 16:9 fills the box exactly
    assert(got(2L) == (180L, 360L))   // tall image: height-bound
  }

  test("frameSamplePlan: one row per sampled frame, videos only") {
    val got = Multimodal.frameSamplePlan(Multimodal.syntheticMedia(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 2 is the only video (2 % 4 == 2); duration 2*1000+1000 = 3000ms
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
    // docs 0 and 8: same dims (mod 8) + same text -> identical BMPs;
    // keeper 0, one 630-byte copy freed (54 header + 48*12 pixel rows)
    assert(got(0L) == ((2L, 630L)))
    assert(got(1L) == ((1L, 0L)) && got(2L) == ((1L, 0L)))
    assert(got.size == 3)
  }

  test("payloadManifest: engine hex == encoder bytes") {
    val got = Multimodal.payloadManifest(Multimodal.syntheticMedia(docs))
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[String]("payload_hex")).toMap
    assert(got(0L) == MediaCodec.encodeBmp(0L, "abc")
      .map("%02x".format(_)).mkString)
    assert(got(1L) == MediaCodec.encodeWav(1L, 4)
      .map("%02x".format(_)).mkString)
  }

  test("mediaNearDup bridges decoded features into embedding LSH") {
    val pairs = Multimodal.mediaNearDup(Multimodal.syntheticMedia(docs))
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.toSeq == Seq((0L, 8L))) // identical "abc" BMP payloads
  }
}
