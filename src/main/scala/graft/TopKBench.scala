package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-bench for the custom per-key top-k operator
  * ([[graft.plans.TopKPerKey]]) against the `row_number()` window
  * form on a 90%-one-hot-key corpus — the workload the operator
  * exists for: the window plan funnels the hot key's entire row set
  * through one task's sort; the heap exec touches each row once and
  * retains k.
  *
  * Both plans run twice (second timing reported — JIT/page-cache
  * warm), must agree on the row set exactly, and the results land in
  * TOPK_BENCH_OUT (default artifacts/TOPK_BENCH.json).
  *
  * Env: SPARK_GRAFT_CPUS (8), TOPK_BENCH_ROWS (20000000), TOPK_K (10).
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val rows = sys.env.getOrElse("TOPK_BENCH_ROWS", "20000000").toLong
    val k = sys.env.getOrElse("TOPK_K", "10").toInt
    val outPath = sys.env.getOrElse("TOPK_BENCH_OUT", "artifacts/TOPK_BENCH.json")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)

    // 90% of rows share one key; values are a full-period mix
    val df = spark.range(rows).select(
      when(pmod(col("id"), lit(10)) < 9, lit("hot"))
        .otherwise(concat(lit("k"), pmod(col("id"), lit(1000)))).as("key"),
      col("id"),
      pmod(col("id") * 2654435761L, lit(1000000007L)).as("v"))
      .localCheckpoint()

    def windowForm = df.withColumn("rank", row_number().over(
        Window.partitionBy("key").orderBy(col("v").desc, col("id")))
        .cast("long"))
      .filter(col("rank") <= k)
    def customForm = graft.plans.TopKPerKey.topK(df, Seq("key"), "v", "id", k)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // agreement first (also warms both paths)
    val disagree = windowForm.select("key", "id", "v", "rank")
      .exceptAll(customForm.select("key", "id", "v", "rank")).count()
    require(disagree == 0, s"plans disagree on $disagree rows")
    val (wSec, wRows) = time(windowForm.count())
    val (cSec, cRows) = time(customForm.count())
    require(wRows == cRows)
    val out =
      s"""{"rows":$rows,"hot_share_pct":90,"k":$k,"cpus":$cpus,""" +
      s""""result_rows":$cRows,""" +
      f""""window_sort_sec":$wSec%.2f,"custom_heap_sec":$cSec%.2f,""" +
      f""""speedup":${wSec / cSec}%.2f}"""
    Option(new File(outPath).getAbsoluteFile.getParentFile).foreach(_.mkdirs())
    val w = new PrintWriter(new File(outPath)); w.println(out); w.close()
    println(out)
    spark.stop()
  }
}
