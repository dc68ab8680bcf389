package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * one JSON line out.
  *
  * Action is a `noop`-format write, which materializes the FULL plan
  * including final projections — a bare `count()` would let Catalyst
  * prune every column a query computes but does not aggregate.
  * Failures are timed and reported per-query (name → "error:…") rather
  * than silently folded into the total, so a broken query can't
  * masquerade as a fast one.
  *
  * Robustness (machine load is the dominant noise source at local[32]):
  *   - each query runs REPS times and reports the MEDIAN, so a
  *     concurrent load spike can't invert the per-query ranking
  *     (BENCH_r02 had a pure projection "costing" 4.5× a superset of
  *     itself — physically implausible, pure load noise);
  *   - the streaming phase runs until enough micro-batches COMPLETE
  *     rather than for a fixed wall window, so a slow first batch can
  *     never leave the sampler empty (BENCH_r02's 0.0).
  */
object Bench {
  /** Runs per query; the reported figure is the median. */
  val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    // Steady-state warmup: one pass of every query at the smallest scale
    // factor, so JIT/codegen/classloading cost doesn't land on whichever
    // query happens to run first. Nothing from the measured SF is cached.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      // a rep either succeeds (Right time) or fails (Left error); the
      // reported figure is the median of the SUCCESSFUL reps, and a
      // query lands in `errors` only when every rep failed — a transient
      // one-rep failure must not mark a working query broken, and a
      // broken query must not report a time at all (its median slot
      // falls back to the failing reps' wall time)
      val reps = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        val outcome =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
          catch { case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120))
          }
        (outcome, (System.nanoTime() - t0) / 1e9)
      }
      val ok = reps.collect { case (None, t) => t }.sorted
      if (ok.isEmpty) {
        errors(name) = reps.last._1.get
        name -> reps.map(_._2).sorted.apply(Reps / 2)
      } else name -> ok(ok.length / 2)
    }
    def obj(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = obj(results.map { case (k, v) => k -> v.toString })
    val errs = obj(errors.map { case (k, v) => k -> ("\"" + v + "\"") })
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val streamTput = streamThroughput(spark, cpus.toInt)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"stream_rows_per_sec":$streamTput,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** End-to-end streaming throughput of the full trend pipeline
    * (synthetic firehose → parse/clean/sentiment/explode → per-batch
    * dedup → sink): the median per-batch `processedRowsPerSecond`. The
    * reference's producer ceiling is ≤10 msg/s
    * (`KafkaTwitterProducer.java:98,112` Thread.sleep(100)); this
    * measures what the same pipeline shape sustains on one node.
    *
    * The feed rate is a deliberately CONSERVATIVE fraction of measured
    * sustained capacity (~930k rows/s at local[32] on 1 s micro-batches
    * with the native clean chain; see artifacts/SOAK_SUMMARY.json):
    * `processedRowsPerSecond` is
    * rows/batch-duration — true pipeline speed regardless of how full
    * each batch is — so under-feeding costs nothing, while over-feeding
    * makes batches fall behind the trigger and starves the sampler
    * (BENCH_r02: one 15 s batch in a 15 s window, dropped by the
    * sampler → 0.0). The run ends when [[MinBatches]] batches have
    * completed, not after a fixed wall window, with a hard timeout as
    * the only backstop. */
  val MinBatches = 4
  val StreamTimeoutMs = 90000L

  private def streamThroughput(spark: SparkSession, cpus: Int): Double = {
    import graft.streaming._
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("bench_ckpt").toString
      val sink = new TrendSink {
        def write(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
          df.write.mode("overwrite").format("noop").save()
      }
      // ~15k rows/s/core ≈ half the ~29k/core sustained micro-batch
      // capacity — batches complete within the 1 s trigger even under
      // moderate machine load, so every trigger yields a progress sample
      val rows = TrendStream.trendRows(
        TweetSource.RateSource(15000 * cpus).load(spark))
      val q = TrendStream.writer(rows, sink,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
        Some(ckpt)).start()
      val deadline = System.currentTimeMillis() + StreamTimeoutMs
      try {
        def completed(): Int =
          q.recentProgress.count(p => p.numInputRows > 0)
        while (completed() < MinBatches && System.currentTimeMillis() < deadline)
          Thread.sleep(500)
      } finally q.stop()
      // median per-batch processedRowsPerSecond; the first batch is
      // dropped (cold caches, state-store open) unless it would leave
      // fewer than 2 samples — a loaded machine degrades the sample set
      // gracefully instead of zeroing the metric
      val all = q.recentProgress
        .filter(p => p.numInputRows > 0)
        .map(_.processedRowsPerSecond).filter(r => !r.isNaN && r > 0).toSeq
      val rates = (if (all.length > 2) all.drop(1) else all).sorted
      if (rates.isEmpty) 0.0
      else math.round(rates(rates.length / 2) * 10) / 10.0
    } catch { case e: Throwable =>
      System.err.println(s"[bench] stream throughput failed: $e")
      -1.0
    }
  }
}
