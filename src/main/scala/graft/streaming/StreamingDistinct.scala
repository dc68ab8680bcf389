package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Kmv

/** Continuous distinct-user counting — the streaming leg of the KMV
  * sketch ([[graft.functions.Kmv]]), the same split as
  * [[StreamingHeavyHitters]] vs the batch recount:
  *
  *   - state per event type is ONE bounded KMV buffer (≤ k longs,
  *     a few KB forever, regardless of stream length) — no watermark
  *     needed because the state never grows with the data;
  *   - the per-row update is [[Kmv.insert]], the IDENTICAL code the
  *     batch Aggregator runs, over the same column-side `xxhash64` —
  *     so after any sequence of triggers the retained set equals the
  *     batch sketch of the concatenated input EXACTLY (the KMV
  *     retained set is a function of the input set; spec-pinned),
  *     and the emitted estimate matches the batch estimate
  *     bit-for-bit;
  *   - each trigger emits every updated type's current estimate
  *     (Update mode — the count revises as users arrive). Distinct
  *     counts only grow, so emissions are monotone per key.
  *
  * The one shuffle is the groupByKey on event_type; at cluster scale
  * types are few, so a high-cardinality deployment keys on
  * (type, hash-shard) and unions shard sketches downstream with
  * [[Kmv.unionAll]] — mergeability is what makes that safe. */
object StreamingDistinct {

  final case class TypeSketch(n: Int, heap: Array[Long])
  final case class DistinctEstimate(event_type: String, est_users: Long,
                                    retained: Int)

  val DefaultK = 1024

  /** Streaming distinct tracker. `events` must be a streaming
    * DataFrame with `event_type` and `user_id` columns; run in
    * Update mode. */
  def estimateStream(events: DataFrame,
                     k: Int = DefaultK): Dataset[DistinctEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), xxhash64(col("user_id")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update(k))
  }

  private def update(k: Int)(
      eventType: String, rows: Iterator[(String, Long)],
      state: GroupState[TypeSketch]): Iterator[DistinctEstimate] = {
    val st = state.getOption.getOrElse(TypeSketch(0, Array.emptyLongArray))
    var buf = (st.n, st.heap)
    rows.foreach { case (_, h) => buf = Kmv.insert(buf, Kmv.flip(h), k) }
    state.update(TypeSketch(buf._1, buf._2))
    Iterator.single(DistinctEstimate(eventType,
      Kmv.estimateBuffer(buf._1, buf._2, k), buf._1))
  }
}
