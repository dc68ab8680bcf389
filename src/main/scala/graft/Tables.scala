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
  /** `events.ts` has shipped under several parquet encodings across testdata
    * regenerations; normalize them all to TimestampType (session TZ pinned
    * UTC everywhere) so downstream `cast("long")` = epoch seconds:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright;
    *    with `spark.sql.legacy.parquet.nanosAsLong` (set in every session
    *    builder here) it arrives as LongType nanos — exact integer division
    *    (a double detour would lose precision: 1.7e18 ns > 2^53).
    *  - TIMESTAMP(micros, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ, and `cast(ntz as long)` is illegal under ANSI —
    *    rewrite to TimestampType; with UTC session TZ the instants match
    *    DuckDB's `epoch(ts)` exactly.
    *  - TIMESTAMP(micros, adjusted): already TimestampType, pass through. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("ts div 1000000000").cast("timestamp"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
