package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.HeavyHitters
import graft.llm.TextFns

/** Continuous heavy hitters over a document stream — the streaming leg
  * of [[graft.llm.HeavyHitters]] (which is batch-only by design: its
  * recount pass needs the whole corpus). Here the Misra-Gries sketch
  * itself IS the long-lived state, keyed by a token-hash SHARD:
  *
  *   - every token deterministically lands in one shard (`pmod` of
  *     Spark's murmur3 hash), so each shard's sketch sees that token's
  *     ENTIRE stream — the per-shard MG guarantee (every token with
  *     count > N_shard/(capacity+1) keeps a counter) therefore holds
  *     globally, and the union of shard candidate sets is a provable
  *     superset of the global heavy hitters.
  *   - state is `nShards` maps of ≤ `capacity` entries — a few KB
  *     TOTAL, forever, regardless of stream length. No watermark is
  *     needed because the state never grows with the data (contrast
  *     [[StatefulSessions]], whose per-key state must be evicted).
  *   - each trigger emits every shard's current candidates with their
  *     estimate and the shard's exact stream length (Update mode —
  *     estimates revise as the stream evolves). Downstream, a batch
  *     recount over the candidate union turns estimates into exact
  *     counts — the same sketch-then-verify split as the batch op.
  *
  * At cluster scale the shard count is the parallelism dial: the one
  * shuffle is the groupByKey on `shard`, and `nShards` only needs to
  * exceed the executor count to spread state — the sketch bound per
  * shard is independent of it. */
object StreamingHeavyHitters {

  final case class ShardSketch(n: Long, counts: Map[String, Long])
  final case class Candidate(shard: Int, token: String, est: Long, shard_n: Long)

  val DefaultShards = 16

  /** Sharded token stream: one row per token with its state shard. */
  private def sharded(docs: DataFrame, nShards: Int): DataFrame =
    docs.select(explode(TextFns.tokens(col("text"))).as("token"))
      .select(col("token"), pmod(hash(col("token")), lit(nShards)).as("shard"))

  /** Streaming candidate tracker: per trigger, every shard's current
    * Misra-Gries candidates. `docs` must be a streaming DataFrame with
    * a `text` column; run the query in Update mode. */
  def candidateStream(docs: DataFrame,
                      capacity: Int = HeavyHitters.Capacity,
                      nShards: Int = DefaultShards): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    sharded(docs, nShards)
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update(capacity))
  }

  private def update(capacity: Int)(
      shard: Int, rows: Iterator[(String, Int)],
      state: GroupState[ShardSketch]): Iterator[Candidate] = {
    var st = state.getOption.getOrElse(ShardSketch(0L, Map.empty))
    rows.foreach { case (t, _) =>
      st = ShardSketch(st.n + 1L, HeavyHitters.mgAdd(st.counts, t, capacity))
    }
    state.update(st)
    st.counts.toSeq.sortBy { case (t, v) => (-v, t) }
      .iterator.map { case (t, v) => Candidate(shard, t, v, st.n) }
  }
}
