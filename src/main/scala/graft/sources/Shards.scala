package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-shard export — the last mile of a curation
  * pipeline: turn a curated corpus into N shard files whose contents
  * AND within-shard order are a pure function of the data, so a
  * training run (and a rerun, and a rerun on a grown corpus) reads
  * byte-identical shards for the surviving docs.
  *
  * A multiplicative hash of doc_id gives every doc a pseudo-random but
  * reproducible `sort_key`; `shard = sort_key mod n` spreads docs
  * uniformly (adjacent-id docs land in different shards — the global
  * shuffle training wants, without an RNG or a true global sort).
  *
  * Scale shape: assignment is a stateless projection. The WRITE is one
  * hash repartition on `shard` plus a per-task sort — Spark's external
  * sort spills, so a shard larger than executor memory still writes;
  * nothing ever funnels through fewer than n tasks, and there is no
  * global total order to coordinate (shards are independent by
  * construction). The within-shard sort key is (sort_key, doc_id) so
  * hash collisions cannot make the order ambiguous.
  */
object Shards {

  /** Reproducible pseudo-random sort key in [0, P): the
    * [[graft.llm.TextAnalysis.sampleBucket]] hash without its final
    * mod-1000 (full resolution — 1000 distinct values would make the
    * within-shard order lean on the doc_id tiebreak). */
  def sortKey(id: Column): Column = {
    val P = graft.llm.TextFns.Prime
    pmod(pmod(id, lit(P)) * 2654435761L + 104729L, lit(P))
  }

  /** Shard assignment: doc_id → (sort_key, shard). Stateless; the
    * oracle replays the arithmetic exactly. */
  def shardAssign(docs: DataFrame, nShards: Int = 8): DataFrame =
    docs.select(
      col("doc_id"),
      sortKey(col("doc_id")).as("sort_key"),
      pmod(sortKey(col("doc_id")), lit(nShards.toLong)).as("shard"))

  /** Shard balance report — the check a training run makes before
    * trusting the export: per shard, document and token populations
    * with their skew against a perfectly uniform spread (1000 = exact
    * fair share). Doc skew validates the hash; token skew catches the
    * failure the hash CANNOT see — length concentration, where a shard
    * holds its fair share of docs but a multiple of the tokens, and
    * data-parallel steps go long-pole on it. One fused scan, one
    * ~nShards-group shuffle, totals as a 1-row broadcast. */
  def shardBalance(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val perShard = docs.select(
        pmod(sortKey(col("doc_id")), lit(nShards.toLong)).as("shard"),
        size(graft.llm.TextFns.tokens(col("text"))).cast("long").as("wc"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("wc").as("n_tokens"))
    perShard
      .join(broadcast(perShard.agg(sum("n_docs").as("td"),
        sum("n_tokens").as("tt"))))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        expr(s"(1000 * n_docs * $nShards) div td").as("doc_skew_pm"),
        expr(s"(1000 * n_tokens * $nShards) div tt").as("token_skew_pm"))
  }

  /** Write the corpus as `nShards` hive-partitioned shard directories
    * (`shard=K/`), each internally ordered by (sort_key, doc_id).
    * One exchange (hash on shard), one per-task spillable sort. */
  def writeShards(docs: DataFrame, path: String, nShards: Int = 8): Unit =
    docs
      .withColumn("sort_key", sortKey(col("doc_id")))
      .withColumn("shard", pmod(col("sort_key"), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "sort_key", "doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
