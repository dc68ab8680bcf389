package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFns._

/** Corpus heavy hitters (frequent tokens) with bounded memory — the
  * no-full-shuffle alternative to `vocab_df` when only the head of the
  * distribution matters.
  *
  * Two passes, the LSH-and-verify pattern applied to frequency:
  *   1. a mergeable Misra-Gries sketch over the token stream yields a
  *      CANDIDATE set — at most `capacity` tokens per partition buffer,
  *      merged associatively, with the classic guarantee that every
  *      token of true count > N/(capacity+1) survives;
  *   2. the candidates (≤ capacity rows, broadcast) are re-counted
  *      EXACTLY in a second scan, and the final filter keeps tokens
  *      with count > N/`thresholdDiv`.
  *
  * With thresholdDiv < capacity+1 the sketch's candidate set provably
  * contains every qualifying token, so the output is EXACT — identical
  * to a full GROUP BY + HAVING — and the DuckDB oracle states it that
  * way. What the sketch buys at 100 TB: pass 1 ships one ≤capacity-entry
  * map per partition instead of shuffling every distinct token's count
  * (`vocab_df`'s shape), and pass 2's shuffle is bounded by the
  * candidate set. The answer is deterministic even though the sketch's
  * internal state is merge-order-dependent — the error is absorbed by
  * the recount, never by the result.
  */
object HeavyHitters {

  val Capacity = 64
  val ThresholdDiv = 32

  /** One Misra-Gries point update: increment if tracked, insert if
    * there's room, else decrement every positive counter (the classic
    * rule that charges one undercount to ALL tracked tokens). Shared by
    * the batch [[MisraGriesAgg]] and the streaming sharded sketch
    * ([[graft.streaming.StreamingHeavyHitters]]). */
  private[graft] def mgAdd(m: Map[String, Long], t: String,
                           capacity: Int): Map[String, Long] =
    m.get(t) match {
      case Some(v) => m.updated(t, v + 1L)
      case None if m.size < capacity => m.updated(t, 1L)
      case None =>
        m.iterator.collect { case (k, v) if v > 1L => k -> (v - 1L) }.toMap
    }

  /** Mergeable Misra-Gries summary (Agarwal et al., "Mergeable
    * Summaries", PODS 2012): `reduce` is the classic streaming update
    * (decrement-all when full), `merge` combines counts then subtracts
    * the (capacity+1)-th largest and drops non-positives. Over any
    * merge tree the total undercount is ≤ N/(capacity+1), so every
    * token with true count above that threshold keeps a positive
    * counter. */
  /** Buffer/output carry the EXACT total token count alongside the
    * sketch — the stream length N the threshold needs — so the total
    * costs no extra corpus scan (a separate `count()` branch would
    * re-tokenize everything; cf. the tokenQuantiles fused-scan note). */
  final class MisraGriesAgg(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, (Long, Map[String, Long]), (Long, Array[String])] {
    def zero: (Long, Map[String, Long]) = (0L, Map.empty)
    def reduce(b: (Long, Map[String, Long]), t: String): (Long, Map[String, Long]) =
      (b._1 + 1L, mgAdd(b._2, t, capacity))
    def merge(l: (Long, Map[String, Long]),
              r: (Long, Map[String, Long])): (Long, Map[String, Long]) = {
      val m = r._2.foldLeft(l._2) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      val capped =
        if (m.size <= capacity) m
        else {
          val d = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
          m.iterator.collect { case (k, v) if v > d => k -> (v - d) }.toMap
        }
      (l._1 + r._1, capped)
    }
    def finish(b: (Long, Map[String, Long])): (Long, Array[String]) =
      (b._1, b._2.keys.toArray.sorted)
    def bufferEncoder: org.apache.spark.sql.Encoder[(Long, Map[String, Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Map[String, Long])]()
    def outputEncoder: org.apache.spark.sql.Encoder[(Long, Array[String])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[String])]()
  }

  /** Tokens occurring more than N/[[ThresholdDiv]] times, with exact
    * counts. Output is plain GROUP BY + HAVING semantics; the sketch is
    * only the scan-side pruning device (see object doc). Exactly two
    * corpus scans: sketch+total in one pass, candidate recount in the
    * second. */
  def heavyHitters(docs: DataFrame, capacity: Int = Capacity,
                   thresholdDiv: Int = ThresholdDiv): DataFrame = {
    require(thresholdDiv <= capacity,
      "threshold must be inside the sketch guarantee (thresholdDiv <= capacity)")
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(explode(tokens(col("text"))).as("token"))
    // one row per candidate, each carrying the exact total N
    // the typed tuple output flattens to top-level _1 (total) / _2
    val cands = tok.as[String]
      .select(new MisraGriesAgg(capacity).toColumn)
      .select(col("_1").as("n"), explode(col("_2")).as("token"))
    tok.join(broadcast(cands), "token")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"), first("n").as("n"))
      .filter(col("cnt") * thresholdDiv > col("n"))
      .select(col("token"), col("cnt"))
  }
}
