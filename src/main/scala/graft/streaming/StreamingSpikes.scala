package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live trend-spike detection — the streaming twin of
  * [[graft.ops.TrendPipeline.trendSpikes]]. Batch evaluates the whole
  * per-hashtag timeseries with a row-frame window; here the trailing
  * frame IS the state: each hashtag retains its open bucket plus the
  * `lookback` most recently CLOSED bucket counts — a fixed handful of
  * longs per key, regardless of stream length or bucket width.
  *
  * Bucket lifecycle: a bucket accumulates its count across any number
  * of triggers while it is the hashtag's newest; the first event of a
  * LATER bucket closes it, and a closed bucket is evaluated exactly
  * once against the `lookback` buckets that preceded it in the series
  * (warm-up buckets — fewer than `lookback` predecessors ever seen —
  * never fire, same as batch). The spike test is the same integer
  * cross-multiplication, so on in-order data the emitted spikes are
  * EXACTLY the batch operator's rows (parity is spec-pinned).
  *
  * Late data: an event for an already-closed bucket is dropped — the
  * explicit trade-off of keeping per-key state O(lookback) instead of
  * a watermark-managed bucket store ([[graft.ops.Windows]]' windowed
  * aggregations are the right tool when late-data revision matters).
  */
object StreamingSpikes {

  /** (ts, cnt) history, ascending; newest entry is the open bucket.
    * `nClosed` counts buckets ever closed — the warm-up test. */
  final case class SpikeState(buckets: List[(Long, Long)], nClosed: Long)
  final case class Spike(hashtag: String, ts: Long, cnt: Long,
                         prev_sum: Long, spike_ratio_pm: Long)

  /** `rows` must have `hashtag` and bucket-timestamp `ts` columns. */
  def spikeStream(rows: DataFrame, lookback: Int = 3,
                  factorPm: Long = 2000L): Dataset[Spike] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("hashtag").cast("string"), col("ts").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update(lookback, factorPm))
  }

  private def update(lookback: Int, factorPm: Long)(
      tag: String, rows: Iterator[(String, Long)],
      state: GroupState[SpikeState]): Iterator[Spike] = {
    val st = state.getOption.getOrElse(SpikeState(Nil, 0L))
    val openTs = st.buckets.lastOption.map(_._1)
    // fold incoming events into per-bucket increments, dropping
    // anything older than the open bucket (late data — see object doc)
    val inc = rows.foldLeft(Map.empty[Long, Long]) { case (m, (_, ts)) =>
      if (openTs.exists(ts < _)) m else m.updated(ts, m.getOrElse(ts, 0L) + 1L)
    }
    val merged = (st.buckets.toMap.keySet ++ inc.keySet).toList.sorted
      .map(ts => ts -> (st.buckets.toMap.getOrElse(ts, 0L) + inc.getOrElse(ts, 0L)))
    if (merged.isEmpty) return Iterator.empty
    // every bucket but the newest is now closed; evaluate the ones
    // closing in THIS trigger, in series order
    val newlyClosed = merged.dropRight(1).drop(math.max(0, st.buckets.length - 1))
    var nClosed = st.nClosed
    val out = Vector.newBuilder[Spike]
    newlyClosed.foreach { case (ts, cnt) =>
      if (nClosed >= lookback) {
        val idx = merged.indexWhere(_._1 == ts)
        val prev = merged.slice(idx - lookback, idx)
        val prevSum = prev.map(_._2).sum
        if (1000L * cnt * lookback >= factorPm * prevSum)
          out += Spike(tag, ts, cnt, prevSum,
            (1000L * cnt * lookback) / prevSum)
      }
      nClosed += 1L
    }
    // retain the open bucket plus the lookback newest closed ones
    state.update(SpikeState(merged.takeRight(lookback + 1), nClosed))
    out.result().iterator
  }
}
