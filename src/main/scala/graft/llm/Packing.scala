package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFns._

/** Sequence packing — the doc → fixed-capacity-training-sequence step of
  * an LLM pretraining pipeline ("concat and chunk": concatenate every
  * document's tokens in a canonical order, then split the stream into
  * windows of exactly `capacity` tokens).
  *
  * Concat-and-chunk is chosen over greedy bin-packing deliberately: a
  * greedy packer ("append the next doc to the current bin until it
  * overflows") is an inherently sequential scan — bin boundaries depend
  * on every earlier row, so a distributed version either serializes or
  * changes answers with partitioning. Concat-and-chunk gives the same
  * zero-padding-waste guarantee (every pack except the last is exactly
  * full) from pure prefix-sum arithmetic, which distributes.
  *
  * Scale design (100 TB): the only global state is the running token
  * offset, computed as a classic two-phase distributed prefix sum —
  *   1. docs are assigned order-preserving coarse buckets
  *      (`doc_id div bucketSize`); a window partitioned BY BUCKET computes
  *      the within-bucket exclusive prefix (each window partition is
  *      bounded by `bucketSize` rows, never by corpus size);
  *   2. per-bucket token totals collapse to one row per bucket — a table
  *      `corpus/bucketSize` rows long — and a single-partition window
  *      over THAT tiny table produces each bucket's starting offset
  *      (bounded by the bucket domain, not the data — the same argument
  *      as [[TextAnalysis.tokenQuantiles]]);
  *   3. the offsets broadcast-join back (a few KB) and every doc knows
  *      its absolute token span with no global sort and no single-
  *      partition pass over the corpus.
  * After that it is a stateless projection: each doc explodes into the
  * packs its span [start, start+n) overlaps and slices its own token
  * array — docs never shuffle, text never shuffles.
  *
  * Output: one row per (pack, doc-segment) — `pack_id`, `doc_id`,
  * `seg_start` (1-based token index within the doc), `seg_tokens`,
  * `seg_text`. Invariants (asserted in PackingSpec): segment sizes of a
  * pack sum to exactly `capacity` for every pack but the last; each
  * doc's segments tile [1, n] with no gap or overlap.
  *
  * All arithmetic is exact non-negative integer (`div` = `//` on the
  * oracle side), so the DuckDB twin reproduces it bit-for-bit.
  */
object Packing {

  def packSequences(docs: DataFrame,
                    capacity: Int = 128,
                    bucketSize: Long = 64L): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(bucketSize > 0, "bucketSize must be positive")

    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("bucket", expr(s"doc_id div $bucketSize"))

    // phase 1: within-bucket exclusive prefix sum (≤ bucketSize rows per
    // window partition)
    val wLocal = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base
      .withColumn("local_start", coalesce(sum("n").over(wLocal), lit(0L)))

    // phase 2: exclusive running sum over per-bucket totals — the one
    // unpartitioned window runs over |id-domain|/bucketSize rows, not docs
    val wBucket = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("bucket").agg(sum("n").as("bucket_n"))
      .withColumn("bucket_offset", coalesce(sum("bucket_n").over(wBucket), lit(0L)))
      .select("bucket", "bucket_offset")

    // phase 3: absolute spans; explode into overlapped packs; slice
    local
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("start", col("bucket_offset") + col("local_start"))
      .select(col("doc_id"), col("toks"), col("n"), col("start"),
        explode(sequence(
          expr(s"start div $capacity"),
          expr(s"(start + n - 1) div $capacity"))).as("pack_id"))
      .withColumn("seg_start",
        greatest(col("pack_id") * capacity - col("start"), lit(0L)) + 1L)
      .withColumn("seg_tokens",
        least(col("start") + col("n"), (col("pack_id") + 1L) * capacity)
          - greatest(col("start"), col("pack_id") * capacity))
      .select(
        col("pack_id"), col("doc_id"), col("seg_start"), col("seg_tokens"),
        concat_ws(" ", slice(col("toks"),
          col("seg_start").cast("int"), col("seg_tokens").cast("int")))
          .as("seg_text"))
  }

  /** Whole-document bin packing — the SFT-style complement of
    * [[packSequences]]: documents are never fragmented (a training
    * example must stay contiguous with its own attention span), so
    * padding waste is the price and MEASURING it is the point (see
    * [[binPackStats]]).
    *
    * The object doc above rejects greedy packing because a global
    * next-fit scan serializes and its answers change with
    * partitioning. This operator keeps the greedy fold but makes it
    * BUCKET-LOCAL: docs pack in doc_id order within their
    * `doc_id div bucketSize` bucket, each bucket starting a fresh bin.
    * Bin boundaries are then a pure function of the data — same answer
    * under any partitioning or cluster size — and the sequential scan
    * is an in-memory fold over ≤ `bucketSize` elements inside one
    * `aggregate` higher-order expression, still one row per GROUP in
    * the shuffle. The trade-off is bounded boundary waste: at most one
    * partially-empty extra bin per bucket versus the global scan.
    *
    * Docs longer than `capacity` are truncated to it (they'd never
    * fit; a real pipeline routes them to [[packSequences]] instead —
    * documented, deterministic). Token-less docs drop. `bin_id` is
    * globally unique as `bucket · bucketSize + bin_local` (a bucket of
    * `bucketSize` docs can never open more than `bucketSize` bins). */
  def binPack(docs: DataFrame, capacity: Int = 128,
              bucketSize: Long = 64L): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(bucketSize > 0, "bucketSize must be positive")
    val cap = lit(capacity.toLong)
    val base = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0)
      .select(col("doc_id"), least(col("n"), cap).as("seg"),
        expr(s"doc_id div $bucketSize").as("bucket"))
    val assignType = "array<struct<doc_id:bigint,seg:bigint,bin:bigint>>"
    base.groupBy("bucket")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("seg"))))
        .as("arr"))
      .select(col("bucket"), explode(aggregate(
        col("arr"),
        struct(lit(0L).as("bin"), lit(0L).as("used"),
          array().cast(assignType).as("assigns")),
        (acc, d) => {
          val fits = acc("used") + d("seg") <= cap
          val nb = when(fits, acc("bin")).otherwise(acc("bin") + 1L)
          val nu = when(fits, acc("used") + d("seg")).otherwise(d("seg"))
          struct(nb.as("bin"), nu.as("used"),
            concat(acc("assigns"), array(struct(
              d("doc_id").as("doc_id"), d("seg").as("seg"), nb.as("bin"))))
              .as("assigns"))
        },
        acc => acc("assigns"))).as("a"))
      .select(col("a.doc_id").as("doc_id"), col("a.seg").as("seg_tokens"),
        col("bucket"), col("a.bin").as("bin_local"),
        (col("bucket") * bucketSize + col("a.bin")).as("bin_id"))
  }

  /** Per-bin waste report over [[binPack]]: fill permille is the
    * number a pipeline tunes `capacity` against (mean fill collapsing
    * means capacity is too large for the document length mix). */
  def binPackStats(docs: DataFrame, capacity: Int = 128,
                   bucketSize: Long = 64L): DataFrame =
    binPack(docs, capacity, bucketSize)
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("seg_tokens").as("used_tokens"))
      .select(col("bin_id"), col("n_docs"), col("used_tokens"),
        (lit(capacity.toLong) - col("used_tokens")).as("waste_tokens"),
        expr(s"(1000 * used_tokens) div $capacity").as("fill_pm"))
}
