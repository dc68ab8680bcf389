package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Physical-layout evidence: the same fact table written under the
  * codec choices a 100 TB lake actually weighs — parquet+snappy (the
  * de-facto default: cheap CPU, moderate ratio), parquet+zstd (the
  * modern default: better ratio for slightly more CPU), orc+zstd (the
  * other columnar container) — with bytes-on-disk, write seconds, and
  * a filtered-aggregate scan second per variant, plus a row-count
  * equality check so a codec can never "win" by losing rows. One JSON
  * line to stdout + artifacts/CODEC_BENCH.json.
  *
  * At 100 TB the ratio differences here are petabyte-scale storage and
  * scan-IO deltas; the artifact's point is that the engine MEASURES the
  * trade instead of inheriting a default. */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("codec_bench")
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    val variants = Seq(
      ("parquet_snappy", "parquet", "snappy"),
      ("parquet_zstd", "parquet", "zstd"),
      ("orc_zstd", "orc", "zstd"))
    val rows = li.count()
    def run(pass: Int) = variants.map { case (name, fmt, codec) =>
      val dir = root.resolve(s"$name-$pass").toString
      val t0 = System.nanoTime()
      li.write.mode("overwrite").option("compression", codec)
        .format(fmt).save(dir)
      val writeS = (System.nanoTime() - t0) / 1e9
      val bytes = dirBytes(dir)
      // filtered aggregate scan: pushdown + pruning live, decode paid
      val t1 = System.nanoTime()
      val agg = spark.read.format(fmt).load(dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
        .collect()
      val scanS = (System.nanoTime() - t1) / 1e9
      val nOut = spark.read.format(fmt).load(dir).count()
      require(nOut == rows, s"$name lost rows: $nOut != $rows")
      (name, bytes, writeS, scanS, agg.map(_.getAs[Long]("n")).sum)
    }
    // pass 0 is the warmup (codegen, classloading, page cache) and is
    // discarded — without it the first variant pays every cold cost.
    // The timed figure is MIN over `Passes` measured passes, the
    // repo-wide batch-perf protocol (see Bench's `mins` comment): the
    // dominant noise source is host CPU-starvation windows, which only
    // ever INFLATE a pass, so min estimates unthrottled cost. Bytes
    // are identical across passes (same rows, same codec) — asserted,
    // not assumed. Passes are interleaved across variants (run(pass)
    // sweeps all three) so one window can't tax a single variant's
    // every pass.
    run(0)
    val Passes = 3
    val passes = (1 to Passes).map(run)
    val results = variants.indices.map { i =>
      val vp = passes.map(_(i))
      require(vp.map(_._2).distinct.size == 1,
        s"${vp.head._1}: bytes varied across passes — nondeterministic write")
      (vp.head._1, vp.head._2,
        vp.map(_._3).min, vp.map(_._4).min, vp.head._5)
    }
    val base = results.head._2.toDouble
    val json = results.map { case (name, bytes, w, s, scanned) =>
      f""""$name":{"bytes":$bytes,"ratio_vs_snappy":${bytes / base}%.4f,"write_sec":$w%.3f,"scan_sec":$s%.3f,"rows_scanned":$scanned}"""
    }.mkString(
      s"""{"metric":"codec_bench","table":"lineitem","rows":$rows,""" +
        s""""passes":$Passes,"timing":"min_of_passes","sf":"$sfDir",""",
      ",", "}")
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_ARTIFACTS",
        "artifacts") + "/CODEC_BENCH.json"),
      (json + "\n").getBytes("UTF-8")): Unit
    catch { case e: Throwable =>
      System.err.println(s"[codec-bench] artifact write failed: $e")
    }
    spark.stop()
    // the warmup and measured outputs are scratch — delete the temp
    // root so repeated runs don't accrete gigabytes under /tmp
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(root.toFile)
  }
}
