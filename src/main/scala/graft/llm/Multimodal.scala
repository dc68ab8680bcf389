package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: images/audio/video as
  * opaque `binary` payloads plus a typed metadata struct, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The actual codecs are STUBBED (no image/audio libraries ship in this
  * environment — see [[StubCodec]]): the stub is a deterministic fake
  * whose output depends only on the payload bytes. Everything around the
  * stub — schema, batched partition-wise execution, feature schema,
  * drop-bytes-early projection — is real and tested.
  *
  * Scale design:
  *   - payloads dominate row size, so every stage PROJECTS BYTES AWAY as
  *     soon as features/metadata are extracted — nothing below the decode
  *     stage shuffles binary;
  *   - decode runs via `mapPartitions` on a typed Dataset: one codec
  *     instance per partition (vs per row — the reference's
  *     pipeline-per-record mistake, `KafkaSparkProcessor.scala:144`),
  *     rows streamed through it in batch — the JVM shape of an arrow-
  *     batched python UDF;
  *   - metadata-only transforms (resize plan, frame sampling) are pure
  *     column arithmetic — codegen'd, no UDF.
  */
object Multimodal {

  val MediaKinds = Seq("image", "audio", "video")

  val metaType: StructType = new StructType()
    .add("width", IntegerType).add("height", IntegerType)
    .add("sample_rate", IntegerType).add("duration_ms", LongType)
    .add("format", StringType)

  /** Deterministic synthetic media over `documents`: payload bytes are
    * the utf-8 text (a stand-in for encoded frames), kind/meta derived
    * from doc_id arithmetic. The offline analog of reading a media
    * directory with `format("binaryFile")`. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(MediaKinds.map(lit): _*),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(4)) * 90 + 180).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(44100)
          .cast("int").as("sample_rate"),
        (pmod(col("doc_id"), lit(30)) * 1000 + 1000).as("duration_ms"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"))
        .as("meta"))

  /** One decoded row: features extracted, payload dropped. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  /** The stubbed codec: ??? would be an image/audio decode; the fake is
    * a deterministic byte-histogram "embedding" so tests can pin values.
    * One instance per partition, reused across its rows. */
  final class StubCodec(dim: Int) {
    /** STUB — stands in for e.g. JPEG decode + CNN features. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        acc(java.lang.Byte.toUnsignedInt(bytes(i)) % dim) += 1.0f
        i += 1
      }
      acc
    }
  }

  /** Decode/feature-extract stage: batched per-partition execution, one
    * codec per partition, bytes projected away in the output row. */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new StubCodec(dim) // per partition, NOT per record
        rows.map { case (id, kind, bytes) =>
          MediaFeatures(id, kind, bytes.length.toLong, codec.features(bytes))
        }
      }
  }

  /** Metadata-only resize plan: target box fit preserving aspect ratio —
    * pure integer column arithmetic (no decode needed to plan a resize). */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width").cast("long")
    val h = col("meta.height").cast("long")
    // scale = min(maxW/w, maxH/h) in exact rational arithmetic:
    // fit width iff maxW*h <= maxH*w. A non-positive dimension (corrupt
    // metadata) yields NULL targets instead of an ANSI division error.
    val valid = w > 0 && h > 0
    val fitW = lit(maxW.toLong) * h <= lit(maxH.toLong) * w
    media.select(
      col("media_id"), col("kind"), col("meta"),
      when(valid && fitW, lit(maxW.toLong))
        .when(valid, expr(s"meta.width * ${maxH}L div meta.height"))
        .as("target_width"),
      when(valid && fitW, expr(s"meta.height * ${maxW}L div meta.width"))
        .when(valid, lit(maxH.toLong))
        .as("target_height"))
  }

  /** Frame sampling plan for video rows: one row per sampled frame at
    * `everyMs` intervals — explode over a sequence(), no decode. */
  def frameSamplePlan(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media
      // zero/negative duration ⇒ no frames; sequence(0, -1, +step) would
      // otherwise throw and one bad record must not fail the job
      .filter(col("kind") === "video" && col("meta.duration_ms") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs)))
          .as("frame_ts_ms"))

  /** Payload-level exact dedup — the first-line curation pass for
    * media: identical encoded bytes (mirror crawls, re-uploads,
    * retried fetches) collapse on a sha256 of the payload, keeping the
    * min media_id. Same 100 TB shape as [[Dedup.exactDedup]]: only the
    * 32-byte digest and id shuffle — the payload is read once at the
    * scan and never moves. `bytes_reclaimed` prices the win:
    * (n_copies − 1) · payload size. */
  def mediaDedup(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), sha2(col("bytes"), 256).as("payload_key"),
        length(col("bytes")).cast("long").as("n_bytes"))
      .groupBy("payload_key")
      .agg(min("media_id").as("keep_id"), count(lit(1)).as("n_copies"),
        ((count(lit(1)) - 1L) * min("n_bytes")).as("bytes_reclaimed"))

  /** End-to-end: media → features → embedding similarity (bridges the
    * multimodal path into [[Similarity]]'s ANN operators). */
  def mediaNearDup(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val feats = extractFeatures(media, dim)
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    Similarity.embeddingNearDup(feats, minCosine = 0.999)
  }
}
