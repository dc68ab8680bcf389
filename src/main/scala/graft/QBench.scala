package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench for iterating on single queries without a full [[Bench]]
  * sweep: times the named registry queries (noop write, same action as
  * the driver bench) for REPS reps each and prints one JSON line with
  * the full run series per query.
  * Usage: graft.QBench <sfDir> <reps> <query...>  (env SPARK_GRAFT_CPUS) */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq
                else SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    // same warmup the driver bench does, but only for the named queries
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      names.foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir)
          .write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      }
    val runs = names.map { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      n -> times
    }
    val qs = runs.map { case (n, ts) =>
      "\"" + n + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    println(s"""{"sf":"$sfDir","reps":$reps,"runs":$qs}""")
    spark.stop()
  }
}
