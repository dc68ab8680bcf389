package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document curation — the incremental-ingest twin of the
  * batch `graft.llm` operators: documents arrive as a stream (crawl
  * output, firehose) and are deduplicated / scored / filtered online,
  * so the corpus store only ever receives curated rows.
  *
  * State discipline at 100 TB/day: every stateful stage keys on the
  * 32-byte content digest, never the text, and bounds its state with a
  * watermark — a duplicate arriving after the horizon is admitted
  * rather than remembered forever (the batch exact-dedup pass is the
  * backstop; streaming dedup is the cheap first line that kills the
  * overwhelmingly-common near-in-time duplicate: retries, mirrors,
  * double-crawls).
  */
object DocStream {

  /** Within-watermark exact dedup on the content digest of a streaming
    * `(doc_id, text, event_time)` frame: the first-seen doc of each
    * content class passes, later copies inside the watermark drop.
    * Text never enters the dedup state — only the digest key rides the
    * state store. */
  def dedupDocs(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_key",
        sha2(graft.llm.TextAnalysis.normalize(col("text")), 256))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("content_key")

  /** Online quality gate: the stateless [[graft.llm.TextAnalysis]]
    * profile runs per-row on the stream (no state at all), keeping
    * docs at or above `minQuality` permille. */
  def qualityGate(docs: DataFrame, minQuality: Long = 300L): DataFrame =
    graft.llm.TextAnalysis.docProfile(docs.select("doc_id", "text"))
      .filter(col("quality") >= minQuality)

  /** Online decontamination: drop streaming docs that share any shingle
    * with a STATIC eval corpus, membership-tested against the same
    * packed Bloom words as [[graft.llm.Dedup.bloomContamination]] —
    * materialized once at stream-build time
    * ([[graft.llm.Dedup.bloomFilterArray]], 4 KB bounded by the m
    * parameter, never by eval-set size) and shipped as an array
    * literal. The gate is a pure per-row filter: no join, no
    * aggregation, no state store — the shape that keeps a
    * 100 TB/day ingest stream's curation stage embarrassingly
    * parallel.
    *
    * Flagging is conservative in exactly the Bloom way: every truly
    * contaminated doc is caught; a bounded FP fraction of clean docs
    * is dropped with them — the right trade for a training-corpus
    * gate. */
  def decontaminationGate(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    import graft.llm.{Dedup, TextFns}
    val filt = Dedup.bloomFilterArray(evalDocs)
    // shingle pipeline staged through projections (the HOF no-CSE trap)
    docs
      .withColumn("__ths", TextFns.tokenHashes(col("text")))
      .withColumn("__sh",
        TextFns.shingleHashSetFromTokenHashes(col("__ths"), Dedup.ShingleK))
      .filter(!Dedup.bloomContaminated(col("__sh"), filt))
      .drop("__ths", "__sh")
  }
}
