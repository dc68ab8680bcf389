package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Bucketed-table plumbing — the co-located join/aggregation path.
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is shuffling
  * both sides; bucketing pre-shuffles ONCE at write time. Two tables
  * bucketed on the join key with the same bucket count join with ZERO
  * exchanges (BucketedJoinSpec asserts this on the physical plan), and
  * a groupBy on the bucket key aggregates exchange-free. `sortBy`
  * additionally lets sort-merge join skip its sorts when each bucket
  * holds one file.
  *
  * The reference's store has no physical layout control at all (its
  * sink is an unpartitioned MySQL table, `KafkaSparkProcessor.scala`'s
  * foreachRDD insert) — this is the Spark-native upgrade: layout as a
  * first-class property of the stored table.
  */
object Bucketed {

  /** Write `df` as a managed parquet table bucketed (and per-bucket
    * sorted) on `key`. Bucket count is a real tuning knob at scale:
    * it bounds write-side memory (one open file per bucket per task)
    * and fixes downstream join/agg parallelism. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    val w: DataFrameWriter[Row] = df.write
      .mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Append rows to an existing bucketed table with the SAME bucket
    * spec — new files land in the matching buckets, so the co-location
    * contract survives incremental loads (Spark rejects a mismatched
    * spec rather than silently degrading the layout). */
  def appendBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int, sorted: Boolean = true): Unit = {
    val w: DataFrameWriter[Row] = df.write
      .mode("append").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Equi-join of two same-key, same-bucket-count tables — planned
    * exchange-free (the point of the layout). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Hive-style partitioned parquet layout: directory-per-value on the
    * partition columns. A filter on a partition column prunes whole
    * directories at PLANNING time (`PartitionFilters` on the scan, zero
    * I/O for pruned values) — at 100 TB, partition-by-language or
    * by-date is the difference between scanning a shard and scanning
    * the corpus. Partition columns should be low-cardinality: each
    * value is a directory, and each task writes one open file per
    * value it sees. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
}
