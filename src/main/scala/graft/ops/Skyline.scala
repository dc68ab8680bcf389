package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** EXACT 2-objective Pareto frontier (skyline) — "maximize both":
  * a row survives iff no other row is ≥ on both objectives and > on
  * at least one (Börzsönyi/Kossmann/Stocker, "The Skyline Operator",
  * ICDE 2001). The curation use: pick the documents that are
  * simultaneously long AND high-quality (no doc strictly better on
  * both axes), or the orders that are the value/recency frontier —
  * multi-objective selection where a single weighted score would
  * bake in an arbitrary trade-off.
  *
  * Why not the textbook plans:
  *  - brute force (anti-join on the dominance predicate) is a
  *    quadratic theta-join — the DuckDB oracle for the small corpus
  *    does exactly this, BECAUSE it is an oracle, not an engine;
  *  - the classic single-pass trick (sort by x desc, keep a running
  *    max of y) is exact but funnels the whole relation through one
  *    sorted task — the global-window anti-pattern this repo's
  *    curriculumShards already refuses.
  *
  * The distributed shape here is a two-phase prefix scan, exact at
  * any scale:
  *  1. collapse to one row per distinct x: `(x, maxy = max y)` — a
  *     slim map-side-combining aggregate; equal-x rows can only be
  *     dominated by their own bucket's max, so nothing else survives
  *     bucket collapse. Distinct x also removes the cross-partition
  *     tie case the range step would otherwise have to handle.
  *  2. range-partition the bucket table by x DESC (partition 0 holds
  *     the largest x), then compute "max y among all STRICTLY larger
  *     x" as within-partition running max (window over rows
  *     [unbounded, -1] in x-desc order, partitioned by the range
  *     partition id) ⊔ the running max of all EARLIER partitions
  *     (a ≤`parts`-row per-partition summary, prefix-maxed in a
  *     bounded window and broadcast back). A bucket is on the
  *     frontier iff that strict-prefix max is NULL or < its maxy.
  *  3. rejoin frontier `(x, maxy)` to the input on x = x, y = maxy
  *     to emit the surviving ROWS (equal (x, y) twins all survive —
  *     neither dominates the other under the one-strict definition).
  *
  * Scale audit: the only full-width data movement is stage 1's
  * aggregate shuffle on x; stages 2's exchanges carry
  * (x, maxy, pid) bucket rows — |distinct x| of them, never the
  * input; the two driver-bounded windows are over ≤`parts` summary
  * rows, not data. The bucket table is persisted because the range
  * partitioner samples its input (partition boundaries — and with
  * them `spark_partition_id`, the cross-phase key — are only stable
  * if the relation is computed once), and both the local-window pass
  * and the per-partition summary consume it.
  */
object Skyline {

  /** Rows of `df` on the maximize-(x, y) Pareto frontier. Output:
    * the input columns, frontier rows only. Both objective columns
    * must be orderable; NULL objectives are excluded up front (a row
    * with an unknown objective neither dominates nor survives). */
  def pareto2D(df: DataFrame, xCol: String, yCol: String,
               parts: Int = 32): DataFrame = {
    val in = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val buckets = in.groupBy(col(xCol)).agg(max(col(yCol)).as("_maxy"))
    val ranged = buckets
      .repartitionByRange(parts, col(xCol).desc)
      .withColumn("_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The persist is CORRECTNESS-bearing here (stable sampled range
    // boundaries — object scaladoc), so the returned frame is
    // single-action: the cache is released once the caller's action
    // completes, and a SECOND action on the same instance would
    // re-sample boundaries independently per consumer. Rebuild via
    // pareto2D for another action — the registry/bench/verify
    // harnesses all do exactly that.
    graft.Caches.releaseAfterNextAction(ranged)
    // strictly-larger-x running max, within this range partition
    val wLocal = Window.partitionBy("_pid").orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // strictly-earlier-partition running max: ≤`parts` summary rows
    val wPrior = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prior = ranged.groupBy("_pid").agg(max("_maxy").as("_pm"))
      .select(col("_pid"), max("_pm").over(wPrior).as("_priormax"))
    val frontier = ranged
      .withColumn("_localmax", max("_maxy").over(wLocal))
      .join(broadcast(prior), "_pid")
      // greatest() skips NULLs: NULL ⊔ NULL = NULL = "nothing larger"
      .withColumn("_strictmax", greatest(col("_localmax"), col("_priormax")))
      .filter(col("_strictmax").isNull || col("_strictmax") < col("_maxy"))
      // rename the rejoin keys: frontier DERIVES from `in`, and
      // same-named attributes would make the self-join ambiguous
      .select(col(xCol).as("_fx"), col("_maxy"))
    in.join(frontier,
      col(xCol) === col("_fx") && col(yCol) === col("_maxy"))
      .select(in.columns.map(in(_)): _*)
  }

  /** The value/recency order frontier: orders no other order beats on
    * BOTH total price and order date — "was there ever a later order
    * at least this big?" Price is a double with essentially all-
    * distinct values, so this is the operator's general stress shape:
    * the bucket table is order-sized and the range-partitioned prefix
    * scan is what keeps it off a single task. The DuckDB oracle runs
    * the single-pass sorted algorithm — same math, the opposite
    * physical plan. */
  def paretoOrders(spark: org.apache.spark.sql.SparkSession,
                   sfDir: String): DataFrame =
    pareto2D(
      graft.Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_totalprice", "o_orderdate"),
      "o_totalprice", "o_orderdate")

  /** The length/quality document frontier — multi-objective curation:
    * docs where nothing in the corpus is both longer AND
    * higher-quality. Word count saturates [[graft.llm.TextAnalysis]]'s
    * length_pm at 50 words, so past that point quality stops rewarding
    * length and the frontier actually bends — a weighted sum would
    * not surface these. The DuckDB oracle is the brute-force
    * NOT-EXISTS dominance anti-join: quadratic, which is exactly what
    * makes it a completeness proof for the pruned plan. */
  def paretoDocs(docs: DataFrame): DataFrame =
    pareto2D(
      graft.llm.TextAnalysis.qualityScore(docs)
        .select("doc_id", "word_count", "quality"),
      "word_count", "quality")
}
