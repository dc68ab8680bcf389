package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton encoding correctness plus the claim the layout exists for:
  * a Z-ordered file layout bounds BOTH dimensions per file, so point
  * queries on either dimension skip most files — measured here as
  * bucket-hit counts against a 1-D day layout on a dense grid. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: hand-computed Morton codes") {
    val got = Seq((3L, 5L), (0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L))
      .toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // z(3,5): u bits {0,1} -> 1+4; d bits {0,2} -> 2+32  => 39
    assert(got == Seq(39L, 0L, 65535L, 0x5555L, 0xAAAAL))
  }

  test("z-layout prunes point queries on both dims; a day sort only on day") {
    // dense grid: every (user 0..255, day 0..31) combination
    val events = spark.range(256L * 32L).select(
      (col("id") % 256L).as("user_id"),
      expr("cast(1704067200 + (id div 256) * 86400 as timestamp)").as("ts"))
    val layout = graft.ops.Windows.zOrderLayout(events, buckets = 32).collect()
    assert(layout.length == 32)
    assert(layout.map(_.getAs[Long]("n_rows")).sum == 256L * 32L)
    def hits(u: Long, d: Long): (Int, Int) = (
      layout.count(r => r.getAs[Long]("min_user") <= u &&
        u <= r.getAs[Long]("max_user")),
      layout.count(r => r.getAs[Long]("min_day") <= d &&
        d <= r.getAs[Long]("max_day")))
    val day100 = 19723L + 10L // 2024-01-11 as days since 1970
    val (uHits, dHits) = hits(100L, day100)
    // 32 buckets fix (d7 d6 d5, u7 u6) of the interleaved code:
    // a user point lands in 32/4 = 8 buckets, a day point in 32/8 = 4
    assert(uHits <= 8, s"user point query touched $uHits/32 z-buckets")
    assert(dHits <= 4, s"day point query touched $dHits/32 z-buckets")
    // the 1-D comparison layout: 32 day-range files — perfect day
    // pruning, but EVERY file spans all users
    val daySorted = events
      .withColumn("bucket", expr("datediff(to_date(ts), date'1970-01-01') - 19723"))
      .groupBy("bucket")
      .agg(min("user_id").as("min_user"), max("user_id").as("max_user"))
      .collect()
    assert(daySorted.length == 32)
    val dayLayoutUserHits = daySorted.count(r =>
      r.getAs[Long]("min_user") <= 100L && 100L <= r.getAs[Long]("max_user"))
    assert(dayLayoutUserHits == 32,
      "a 1-D day layout cannot prune user point queries")
  }

  test("z-ordered WRITE: real parquet files bound both dims in their stats") {
    // the report priced it; this is the write itself — repartitionByRange
    // on the Morton code, then read the produced files back and check
    // the per-file spans a parquet footer would expose to pruning
    val events = spark.range(256L * 32L).select(
      (col("id") % 256L).as("user_id"),
      (col("id") / 256L).cast("long").as("d"))
    val z = events
      .withColumn("uq", col("user_id")) // already 0..255
      .withColumn("dq", col("d") * 8L)  // 0..31 → 0..248 (8-bit domain)
      .withColumn("z", ZOrder.interleave(col("uq"), col("dq")))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    z.repartitionByRange(32, col("z"))
      .write.mode("overwrite").parquet(dir)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("min_u"), max("user_id").as("max_u"),
        min("d").as("min_d"), max("d").as("max_d"))
      .collect()
    assert(perFile.length >= 16, s"expected ~32 files, got ${perFile.length}")
    // ideal spans for 32 z-ranges: user 64 (2 bits fixed), day 4
    // (3 bits fixed); range-boundary sampling can straddle one edge,
    // so allow 2x — still far below the unclustered full spans
    perFile.foreach { r =>
      val uSpan = r.getAs[Long]("max_u") - r.getAs[Long]("min_u")
      val dSpan = r.getAs[Long]("max_d") - r.getAs[Long]("min_d")
      assert(uSpan <= 128L, s"file user span $uSpan > 128")
      assert(dSpan <= 8L, s"file day span $dSpan > 8")
    }
  }
}
