package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** The multimodal decode path under Structured Streaming — the shape a
  * media lake's ingest actually runs: payloads arrive as (media_id,
  * kind, bytes) micro-batches, the REAL per-partition codec
  * ([[Multimodal.RealCodec]] — ImageIO / AudioSystem) extracts typed
  * features, bytes are projected away before anything downstream, and
  * the stream keeps flowing through corrupt payloads (`decode_ok = 0`
  * rows — a poison message must never kill the query).
  *
  * [[Multimodal.extractFeatures]] is a deterministic typed
  * `mapPartitions`, which Structured Streaming executes per
  * micro-batch with no state — so the streaming twin IS the batch
  * operator, and MediaStreamSpec pins batch ≡ stream row equality on
  * identical input. Downstream routing splits decoded features from a
  * quarantine of failed payloads (count-only: the bytes of a payload
  * that failed to decode are exactly what you do NOT forward at
  * 100 TB — they stay in the source object store, addressed by id).
  */
object MediaStream {

  /** Streaming decode: same operator as batch, bytes dropped in the
    * output row. Input needs (media_id, kind, bytes). */
  def decodeStream(media: DataFrame): DataFrame =
    Multimodal.extractFeatures(media).toDF()

  /** Split good features from the quarantine counts per trigger:
    * healthy rows keep their typed features; failures reduce to
    * (kind, n_failed) — id-addressable, byte-free. */
  def routed(media: DataFrame): (DataFrame, DataFrame) = {
    val decoded = decodeStream(media)
    (decoded.filter(col("decode_ok") === 1L),
      decoded.filter(col("decode_ok") === 0L)
        .groupBy("kind").agg(count(lit(1)).as("n_failed")))
  }
}
