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
  * masquerade as a fast one. */
object Bench {
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
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120)
      }
      name -> (System.nanoTime() - t0) / 1e9
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
    * dedup → sink): the median per-batch `processedRowsPerSecond` over a
    * 15 s run on a 1 s trigger. The reference's producer ceiling is
    * ≤10 msg/s (`KafkaTwitterProducer.java:98,112` Thread.sleep(100));
    * this measures what the same pipeline shape sustains on one node. */
  private def streamThroughput(spark: SparkSession, cpus: Int): Double = {
    import graft.streaming._
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("bench_ckpt").toString
      val sink = new TrendSink {
        def write(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
          df.write.mode("overwrite").format("noop").save()
      }
      // feed rate scaled to the core count (~6.5k rows/s/core keeps the
      // source just under measured capacity — ~250k rows/s at local[32]
      // with the native sentiment + hashtag expressions) so micro-batches
      // keep completing inside the window at any SPARK_GRAFT_CPUS
      val rows = TrendStream.trendRows(
        TweetSource.RateSource(6500 * cpus).load(spark))
      val q = TrendStream.writer(rows, sink,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
        Some(ckpt)).start()
      try Thread.sleep(15000) finally q.stop()
      // median per-batch processedRowsPerSecond (first batch dropped):
      // robust to both the rate cap and concurrent machine load — each
      // batch's figure is rows/batch-duration, i.e. true pipeline speed
      // even when the source backlog grows
      val rates = q.recentProgress.drop(1)
        .map(_.processedRowsPerSecond).filter(r => !r.isNaN && r > 0).sorted
      if (rates.isEmpty) 0.0
      else math.round(rates(rates.length / 2) * 10) / 10.0
    } catch { case e: Throwable =>
      System.err.println(s"[bench] stream throughput failed: $e")
      -1.0
    }
  }
}
