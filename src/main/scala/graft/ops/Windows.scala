package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time window aggregations — the batch analogs of A-1's
  * `reduceByKeyAndWindow(_ + _, Seconds(60))` with a 15 s slide
  * (`KafkaSparkProcessor.scala:131-140`; SURVEY.md §2.9).
  *
  * Window starts are computed arithmetically on epoch seconds (not with
  * `window()`'s struct column) so the same query is expressible in the
  * DuckDB oracle; `graft.streaming` uses the native `window()` form.
  *
  * Scale: both are single-shuffle partial+final hash aggregates keyed on
  * (window_start, event_type). The sliding variant explodes each row into
  * its 4 covering windows *before* the partial aggregate — 4× map-side
  * rows, still one shuffle, no self-joins.
  */
object Windows {

  /** Tumbling 60 s counts per event type. `cast(ts as long)` floors to
    * epoch seconds; `sec - (sec mod 60)` stays in exact integer arithmetic
    * (a `floor(sec/60)*60` would detour through DOUBLE). */
  def tumblingCounts(events: DataFrame): DataFrame = {
    val sec = col("ts").cast("long")
    events
      .select((sec - pmod(sec, lit(60L))).as("window_start"), col("event_type"))
      .groupBy("window_start", "event_type")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sliding 60 s window, 15 s slide: each event belongs to the 4 windows
    * whose start is `floor((sec - off) / 60) * 60 + off` for
    * `off ∈ {0,15,30,45}` — the exact window set
    * `reduceByKeyAndWindow(..., Seconds(60))` maintains at a 15 s batch
    * interval. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .select(col("ts").cast("long").as("sec"), col("event_type"))
      .select(
        explode(array(lit(0L), lit(15L), lit(30L), lit(45L))).as("off"),
        col("sec"), col("event_type"))
      .select(
        (col("sec") - col("off") - pmod(col("sec") - col("off"), lit(60L))
          + col("off")).as("window_start"),
        col("event_type"))
      .groupBy("window_start", "event_type")
      .agg(count(lit(1)).as("cnt"))

  /** A-3 (`KafkaSparkProcessor.scala:126`): the per-batch record count,
    * batch form. */
  def streamCount(events: DataFrame): DataFrame =
    events.agg(count(lit(1)).as("n"))
}
