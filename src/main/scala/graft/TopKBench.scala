package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-bench for the custom per-key top-k operator
  * ([[graft.plans.TopKPerKey]]) along two axes:
  *
  *   1. vs the `row_number()` WINDOW form on a 90%-one-hot-key corpus —
  *      the workload the operator exists for: the window plan funnels
  *      the hot key's entire row set through one task's sort; the heap
  *      exec touches each row once and retains k.
  *   2. vs the typed-Aggregator form ([[graft.llm.Similarity.TopKAgg]])
  *      on the two REGISTERED queries that round 12 re-routed through
  *      the operator (`cosine_topk`, `top_quality_per_lang`) — the
  *      parity check that the plan-level operator costs no more than
  *      the aggregator it replaced (it drops the typed serialization
  *      boundary, so it should be at or under).
  *
  * Every pair runs twice (second timing reported — JIT/page-cache
  * warm), must agree on the row set exactly, and the rows land in
  * TOPK_BENCH_OUT (default artifacts/TOPK_BENCH.json) as a JSON array.
  *
  * Env: SPARK_GRAFT_CPUS (8), TOPK_BENCH_ROWS (20000000), TOPK_K (10),
  * SPARK_GRAFT_SF_DIR (/root/testdata/sf0.1).
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val rows = sys.env.getOrElse("TOPK_BENCH_ROWS", "20000000").toLong
    val k = sys.env.getOrElse("TOPK_K", "10").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("TOPK_BENCH_OUT", "artifacts/TOPK_BENCH.json")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    /** One bench row: baseline vs custom, row-set agreement required
      * (the agreement pass also warms both plans). */
    def pair(name: String, baselineLabel: String,
             baseline: => DataFrame, custom: => DataFrame,
             pairK: Int = k): String = {
      val cols = custom.columns // both forms emit the same schema
      val disagree = baseline.select(cols.map(col): _*)
        .exceptAll(custom.select(cols.map(col): _*)).count()
      require(disagree == 0, s"$name: plans disagree on $disagree rows")
      val (bSec, bRows) = time(baseline.count())
      val (cSec, cRows) = time(custom.count())
      require(bRows == cRows, s"$name: row counts diverge")
      s"""{"query":"$name","baseline":"$baselineLabel","k":$pairK,""" +
        s""""cpus":$cpus,"result_rows":$cRows,""" +
        f""""baseline_sec":$bSec%.2f,"custom_heap_sec":$cSec%.2f,""" +
        f""""speedup":${bSec / cSec}%.2f}"""
    }

    // ---- 1. hot-key synthetic: window sort vs heap ----
    // 90% of rows share one key; values are a full-period mix
    val df = spark.range(rows).select(
      when(pmod(col("id"), lit(10)) < 9, lit("hot"))
        .otherwise(concat(lit("k"), pmod(col("id"), lit(1000)))).as("key"),
      col("id"),
      pmod(col("id") * 2654435761L, lit(1000000007L)).as("v"))
      .localCheckpoint()
    val hotRow = pair("hotkey_synthetic", "window_row_number",
      df.withColumn("rank", row_number().over(
          Window.partitionBy("key").orderBy(col("v").desc, col("id")))
          .cast("long"))
        .filter(col("rank") <= k),
      graft.plans.TopKPerKey.topK(df, Seq("key"), "v", "id", k))

    // ---- 2. registered queries: typed aggregator vs the operator ----
    val emb = Tables.embeddings(spark, sfDir)
    val scored = {
      import graft.llm.Similarity._
      val vecs = emb.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      val q = vecs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("qv"))
        .withColumn("qn", sqrt(norm2Q(col("qv")).cast("double")))
      vecs.select(col("vec_id"), col("qv").as("cv"))
        .withColumn("cn", sqrt(norm2Q(col("cv")).cast("double")))
        .join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (dotQ(col("qv"), col("cv")).cast("double") / (col("qn") * col("cn")))
            .as("cos"))
        .localCheckpoint() // shared scoring cost: the RANKERS are under test
    }
    val cosineRow = pair("cosine_topk", "typed_topk_aggregator",
      graft.llm.Similarity.topKByQueryAgg(scored, k),
      graft.llm.Similarity.topKByQuery(scored, k))

    val docs = Tables.documents(spark, sfDir)
    val qualityRow = pair("top_quality_per_lang", "typed_topk_aggregator",
      graft.llm.TextAnalysis.topQualityPerLangAgg(docs, 5),
      graft.llm.TextAnalysis.topQualityPerLang(docs, 5), pairK = 5)

    // string tiebreak through the generalized ordering (round 12)
    val trendRows = graft.ops.TrendPipeline.trendRows(docs).localCheckpoint()
    val topnRow = pair("topn_trends", "typed_topk_aggregator",
      graft.ops.TrendPipeline.topNTrendsAgg(trendRows, 3),
      graft.ops.TrendPipeline.topNTrends(trendRows, 3), pairK = 3)

    val out = "[" + Seq(hotRow, cosineRow, qualityRow, topnRow)
      .mkString(",\n ") + "]"
    Option(new File(outPath).getAbsoluteFile.getParentFile).foreach(_.mkdirs())
    val w = new PrintWriter(new File(outPath)); w.println(out); w.close()
    println(out)
    spark.stop()
  }
}
