package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (point-in-interval) join — an operator Spark has no native
  * physical plan for: a plain `a.join(b, $"p" >= $"s" && $"p" < $"e")`
  * has no equi-key, so Catalyst plans BroadcastNestedLoopJoin (or a
  * cartesian) — O(|A|·|B|) compares and a broadcast of a whole side.
  *
  * The classic distributed fix is binning: quantize the domain into
  * fixed-width buckets, replicate each interval to every bucket it
  * overlaps (bounded fan-out for bounded-length intervals), map each
  * point to its single bucket, and equi-join on the bucket id with the
  * range predicate as a residual filter. The join becomes a standard
  * shuffled hash/sort-merge join on a fine-grained key:
  *
  *  - Shuffle volume is |points| + |intervals|·avg_buckets_per_interval
  *    — never a cross product, no broadcast requirement.
  *  - Bucket keys partition the time domain, so a temporally hot week
  *    is a hot KEY, which AQE's skew-join split shards across tasks.
  *  - `bucketWidth` trades replication (intervals touch
  *    ~len/width + 1 buckets) against residual-filter selectivity
  *    (points share a bucket with intervals up to width away); set it
  *    near the typical interval length so both factors stay ~2.
  */
object Ranges {

  /** Inner point-in-interval join on integer domains: rows of `points`
    * paired with every row of `intervals` whose `[startCol, endCol)`
    * half-open range contains `pointCol`. The three columns must be
    * integral (e.g. epoch days), distinctly named, and non-null; empty
    * intervals (end ≤ start) match nothing. */
  def pointInIntervalJoin(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Int = 8): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val b = "__graft_range_bucket"
    val w = lit(bucketWidth.toLong)
    val p = points.withColumn(b, floor(col(pointCol) / w))
    // half-open [start, end): last occupied bucket is the one holding
    // end-1, so the explode fan-out is exactly the overlapped buckets
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn(b, explode(sequence(
        floor(col(startCol) / w), floor((col(endCol) - 1L) / w))))
    p.join(iv, p(b) === iv(b) &&
        col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop(b)
  }

  /** `range_join` query shape: per order, how many lineitems (any
    * order's) shipped in the 7 days from its order date — fulfilment
    * pressure around each order.
    *
    * Scale shape: the range predicate depends only on the ship DAY, so
    * lineitem pre-aggregates to per-day counts BEFORE the range join —
    * at 100 TB that collapses a billions-row probe side to one row per
    * distinct day (a map-side-combined count), and the bucketed join
    * then handles day-rows × orders. Orders with no in-window
    * shipments are kept at 0 via a final left join on the (already
    * aggregated, slim) counts. */
  def orderShipWindow(spark: SparkSession, sfDir: String,
                      windowDays: Int = 7): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), epoch).cast("long")
          .as("start_day"))
      .withColumn("end_day", col("start_day") + windowDays)
    val shipDays = Tables.lineitem(spark, sfDir)
      .select(datediff(col("l_shipdate").cast("date"), epoch).cast("long")
        .as("ship_day"))
      .groupBy("ship_day")
      .agg(count(lit(1)).as("day_cnt"))
    val counts = pointInIntervalJoin(shipDays, "ship_day",
        ord, "start_day", "end_day")
      .groupBy("o_orderkey")
      .agg(sum("day_cnt").as("n_shipped"))
    ord.select("o_orderkey")
      .join(counts, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
  }
}
