package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale evidence for [[graft.ops.Skyline.pareto2D]]: the two-phase
  * range-partitioned prefix scan vs the textbook single-pass form
  * (global `max() OVER (ORDER BY x DESC)` window) on a synthetic
  * relation whose objective is near-all-distinct — the regime where
  * the single-pass form funnels the ENTIRE bucket table through one
  * sorted task (Spark's WindowExec with no PARTITION BY), i.e. the
  * driver-shaped bottleneck the operator exists to avoid. Both plans
  * compute the identical frontier (checked by row count + checksum —
  * a silent divergence would invalidate the comparison).
  *
  * Env: SKYLINE_N (rows, default 20M), SPARK_GRAFT_CPUS (32),
  * SKYLINE_REPS (2), SKYLINE_OUT (artifacts/SKYLINE_BENCH.json).
  *
  * The input is deterministic (xxhash64 of the row id — no RNG, so
  * reruns measure the same relation), objectives uniform in [0, 2^40):
  * the expected 2-D uniform skyline is ~ln N rows, so output cost is
  * nil and the measurement isolates the scan/sort/shuffle shapes. */
object SkylineBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SKYLINE_N", "20000000").toLong
    val reps = sys.env.getOrElse("SKYLINE_REPS", "2").toInt
    val out = sys.env.getOrElse("SKYLINE_OUT", "artifacts/SKYLINE_BENCH.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bits = lit((1L << 40) - 1L)
    val base = spark.range(n).select(col("id"),
      (xxhash64(col("id")).bitwiseAND(bits)).as("x"),
      (xxhash64(col("id") + n).bitwiseAND(bits)).as("y"))

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)).as("c"),
        coalesce(sum(col("x").bitwiseXOR(col("y"))), lit(0L)).as("s"))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    def twoPhase() = graft.ops.Skyline
      .pareto2D(base, "x", "y", parts = cpus * 4).select("x", "y")

    def singlePass() = {
      val b = base.groupBy("x").agg(max("y").as("maxy"))
      val w = Window.orderBy(col("x").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      b.withColumn("sm", max("maxy").over(w))
        .filter(col("sm").isNull || col("sm") < col("maxy"))
        .select(col("x"), col("maxy").as("y"))
    }

    def time(f: () => org.apache.spark.sql.DataFrame): (Double, (Long, Long)) = {
      val t0 = System.nanoTime()
      val cs = checksum(f())
      ((System.nanoTime() - t0) / 1e9, cs)
    }

    // warm both paths once (JIT/codegen), then measure reps
    val warm2 = time(twoPhase); val warm1 = time(singlePass)
    require(warm2._2 == warm1._2,
      s"frontier mismatch: two-phase ${warm2._2} vs single-pass ${warm1._2}")
    val t2 = (1 to reps).map(_ => time(twoPhase)._1).min
    val t1 = (1 to reps).map(_ => time(singlePass)._1).min
    val json =
      s"""{"metric":"skyline_bench","n":$n,"cpus":$cpus,"reps":$reps,""" +
      s""""frontier_rows":${warm2._2._1},""" +
      s""""two_phase_sec":${f"$t2%.2f"},"single_pass_window_sec":${f"$t1%.2f"},""" +
      s""""speedup":${f"${t1 / t2}%.2f"},""" +
      s""""note":"min-of-$reps after a warm rep each; identical frontier checksums asserted; single-pass = per-x collapse then ONE unpartitioned window task over all ${"~"}N distinct x"}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
