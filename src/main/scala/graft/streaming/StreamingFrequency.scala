package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.CountMin

/** Continuous per-key point-frequency estimates — the streaming leg of
  * the Count-Min sketch ([[graft.functions.CountMin]]), completing the
  * stream/batch symmetry of the sketch algebra ([[StreamingDistinct]]
  * for KMV, [[StreamingHeavyHitters]] for Misra-Gries,
  * [[StreamingQuantiles]] for bottom-k):
  *
  *   - state per event type is ONE flat D·W counter array (12 KiB
  *     forever — no watermark needed, state never grows with the
  *     stream or the key cardinality);
  *   - the per-row update increments the same
  *     [[CountMin.bucket]] cells the batch Aggregator hits, so after
  *     any trigger sequence the state array EQUALS the batch sketch of
  *     the concatenated input exactly (integer counters — spec-pinned
  *     array equality, not approximate agreement);
  *   - each trigger emits, for every user seen in that trigger, the
  *     running estimate of their total event count so far ("how many
  *     events has THIS user produced" — the per-key question the
  *     heavy-hitter sketch cannot answer for keys outside its top set).
  *
  * Delivery contract differs from the hash-dedup sketches and is
  * documented rather than hidden: CMS counts MULTIPLICITY, so an
  * at-least-once replay inflates counts. The ingest loop must feed it
  * exactly-once (Structured Streaming's per-batch replay on failure is
  * fine — state commits atomically with the batch; what is NOT fine is
  * an upstream producer re-sending data as new offsets, which the
  * engine's ingest path gates with [[DocStream]]'s idempotent history
  * check before anything additive runs).
  */
object StreamingFrequency {

  final case class FState(cells: Array[Long])
  final case class FrequencyEstimate(event_type: String, user_id: Long,
                                     est: Long)

  /** `events` needs `event_type` and `user_id`; run in Update mode. */
  def estimateStream(events: DataFrame): Dataset[FrequencyEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), col("user_id").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update)
  }

  private def update(eventType: String, rows: Iterator[(String, Long)],
                     state: GroupState[FState]): Iterator[FrequencyEstimate] = {
    val cells = state.getOption.map(_.cells)
      .getOrElse(new Array[Long](CountMin.D * CountMin.W))
    val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
    rows.foreach { case (_, u) =>
      var i = 0
      while (i < CountMin.D) {
        cells(i * CountMin.W + CountMin.bucket(i, u)) += 1L
        i += 1
      }
      seen += u
    }
    state.update(FState(cells))
    seen.iterator.map { u =>
      val est = (0 until CountMin.D)
        .map(i => cells(i * CountMin.W + CountMin.bucket(i, u))).min
      FrequencyEstimate(eventType, u, est)
    }
  }
}
