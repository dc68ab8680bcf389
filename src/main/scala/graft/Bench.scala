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
  *   - the streaming phase drains a bounded pre-generated backlog with
  *     Trigger.AvailableNow, so it terminates with progress samples by
  *     construction — a live trigger against a wall window zeroed the
  *     metric two rounds running (BENCH_r02/r03) whenever load kept any
  *     batch from completing inside the window.
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
    * Measured over a BOUNDED pre-generated backlog drained with
    * `Trigger.AvailableNow` rather than a live rate source against a
    * wall-clock window: two rounds' committed artifacts (BENCH_r02/r03)
    * came out 0.0 because under bench-day machine load no live-trigger
    * micro-batch completed inside the sampling window. A bounded drain
    * cannot starve — the query terminates when the backlog is processed,
    * every micro-batch yields a progress sample, and load shows up as an
    * honestly lower rate instead of a zeroed metric.
    * `processedRowsPerSecond` on a saturated batch (rows ÷ batch
    * duration) is exactly the pipeline's processing speed; live
    * 1 s-trigger evidence lives in artifacts/SOAK*.jsonl ([[Soak]]). */
  val FeedRowsPerCore = 240000L
  val FeedFiles = 8
  val StreamBatches = 4
  val StreamTimeoutMs = 120000L

  private def streamThroughput(spark: SparkSession, cpus: Int): Double = {
    import graft.streaming._
    try {
      val tmp = java.nio.file.Files.createTempDirectory("bench_stream")
      val feedDir = tmp.resolve("feed").toString
      val ckpt = tmp.resolve("ckpt").toString
      // deterministic backlog: N ids → producer-filtered wire lines
      // (the P-12 filter keeps 24/35 of ids ≈ 5.3M rows at 32 cpus) in
      // FeedFiles text files; maxFilesPerTrigger = 2 files/trigger
      // yields StreamBatches equal micro-batches of ~1.3M rows each —
      // big enough that per-batch fixed costs don't dominate the rate
      SyntheticTweets.wireLines(
        spark.range(0, FeedRowsPerCore * cpus, 1, FeedFiles).toDF("id"))
        .write.mode("overwrite").text(feedDir)
      val sink = new TrendSink {
        def write(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
          df.write.mode("overwrite").format("noop").save()
      }
      val rows = TrendStream.trendRows(
        TweetSource.FileSource(feedDir,
          maxFilesPerTrigger = Some(FeedFiles / StreamBatches)).load(spark))
      val q = TrendStream.writer(rows, sink,
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        Some(ckpt)).start()
      try q.awaitTermination(StreamTimeoutMs) finally q.stop()
      // median per-batch processedRowsPerSecond; the first batch is
      // dropped (cold file listing, codegen) unless it would leave
      // fewer than 2 samples
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
