package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries read through here so filters/projections are declared on the
  * raw scan and Catalyst can push them into the parquet reader (check
  * `PushedFilters`/`ReadSchema` in `.explain("formatted")`). At 100 TB the
  * same call reads a partitioned table directory; nothing here assumes a
  * single file.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS) — a type Spark's vectorized
    * reader rejects outright. With `spark.sql.legacy.parquet.nanosAsLong`
    * (set in every session builder here) it arrives as LongType nanos;
    * normalize to TimestampType via exact integer division (a double
    * detour would lose precision: 1.7e18 ns > 2^53). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = apply(spark, sfDir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("ts div 1000000000").cast("timestamp"))
    else raw
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
