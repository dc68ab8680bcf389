package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the incremental form of the click↔purchase
  * correlation that [[graft.ops.Windows.clickAsofPurchase]] answers in
  * batch. Structured Streaming's interval join buffers BOTH sides in
  * state and needs two things to stay bounded, both encoded here:
  *
  *   - watermarks on each side's event time, so buffered rows are
  *     evicted once no counterpart can still arrive;
  *   - a time-range predicate tying the two event times together
  *     (`purchase_time ∈ [click_time − window, click_time]`), which
  *     gives the state manager the bound it evicts against.
  *
  * Semantics vs the batch as-of: this emits EVERY purchase in the
  * trailing window per click (the as-of "latest only" pick is a
  * follow-on aggregation; Spark 4 allows chaining it, but the
  * pair-level result is the general building block and keeps the
  * output append-clean). Left-outer emits the click with NULL purchase
  * columns only after the watermark proves no match can arrive — the
  * streaming-native "no purchase within the hour" signal.
  *
  * Scale: state is each side's in-window slice per user partition —
  * bounded by arrival rate × window, independent of stream length;
  * the join key (`user_id`) is the one shuffle on both sides. */
object StreamJoins {

  /** `clicks` needs (event_id, user_id, ts); `purchases` needs
    * (user_id, value, ts). Both `ts` must be castable to timestamp. */
  def clickPurchaseInterval(clicks: DataFrame, purchases: DataFrame,
                            windowSec: Long = 3600L,
                            watermark: String = "2 minutes",
                            joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("click_time"))
      .withWatermark("click_time", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"),
        col("value").as("purchase_value"),
        col("ts").cast("timestamp").as("purchase_time"))
      .withWatermark("purchase_time", watermark)
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_time") >= col("click_time") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("purchase_time") <= col("click_time"),
      joinType)
      .select(col("event_id"), col("user_id"), col("click_time"),
        col("purchase_time"), col("purchase_value"))
  }
}
