package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-mode soak for INDEX FRAGMENTATION — the measured half of the
  * compaction story ([[graft.llm.LshIndex.compact]]): drive the
  * index-in-the-loop ingest body ([[graft.streaming.DocStream
  * .ingestBatch]]) for a run of micro-batches, log per-batch wall time
  * and the bands table's file count, compact mid-run, and keep going.
  * The artifact shows the failure mode AND the cure on one timeline:
  * per-batch time creeping up with file count (each append adds ≥1
  * file per touched bucket, and every probe pays the per-file
  * open/footer cost), then dropping back to early-run times right
  * after compact while the CORPUS keeps growing — proof the creep was
  * fragmentation, not corpus size.
  *
  * Feed synthesis reuses [[CurateSoak.docText]]'s mixing-hash
  * discipline; each batch is fresh docs plus a slice of seed near-dups
  * so the gate always has real work.
  *
  * Env: SPARK_GRAFT_CPUS (32), COMPACT_BATCHES (24),
  * COMPACT_DOCS_PER_BATCH (20000), COMPACT_SEEDS (10000),
  * COMPACT_EVERY (0 = compact once at the 2/3 mark),
  * COMPACT_OUT (artifacts/COMPACT_SOAK.jsonl). */
object CompactSoak {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nBatches = sys.env.getOrElse("COMPACT_BATCHES", "24").toInt
    val perBatch = sys.env.getOrElse("COMPACT_DOCS_PER_BATCH", "20000").toInt
    val nSeeds = sys.env.getOrElse("COMPACT_SEEDS", "10000").toInt
    val outPath = sys.env.getOrElse("COMPACT_OUT", "artifacts/COMPACT_SOAK.jsonl")
    val compactAt = nBatches * 2 / 3

    val wh = java.nio.file.Files.createTempDirectory("compact_soak_wh").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Option(new File(outPath).getAbsoluteFile.getParentFile).foreach(_.mkdirs())
    val log = new PrintWriter(new File(outPath))

    val seeds = spark.range(nSeeds.toLong)
      .select(col("id").as("doc_id"),
        CurateSoak.docText(col("id") + 555000L).as("text"))
    graft.llm.LshIndex.build(seeds, "compact_soak_idx")
    val corpusDir = java.nio.file.Files.createTempDirectory("compact_soak_corpus")
      .toString + "/corpus"
    val bandsT = graft.llm.LshIndex.bandsTable("compact_soak_idx")

    for (b <- 0 until nBatches) {
      val lo = 10000000L + b.toLong * perBatch
      // every 20th doc near-dups a seed (gate work); the rest are fresh
      val batch = spark.range(lo, lo + perBatch)
        .select(col("id").as("doc_id"),
          when(pmod(col("id"), lit(20)) === 3,
            concat(lit("dup "), CurateSoak.docText(
              pmod(xxhash64(col("id")), lit(nSeeds.toLong)) + 555000L)))
            .otherwise(CurateSoak.docText(col("id"))).as("text"),
          current_timestamp().as("event_time"))
      val t0 = System.nanoTime()
      graft.streaming.DocStream.ingestBatch(
        batch, b.toLong, "compact_soak_idx", corpusDir)
      val secs = (System.nanoTime() - t0) / 1e9
      val (nFiles, nRows) = graft.sources.Bucketed.fileStats(spark, bandsT)
      log.println(f"""{"batch":$b,"secs":$secs%.2f,"band_files":$nFiles,""" +
        s""""band_rows":$nRows,"compacted":false}""")
      log.flush()
      if (b + 1 == compactAt) {
        val c0 = System.nanoTime()
        graft.llm.LshIndex.compact(spark, "compact_soak_idx")
        val cSecs = (System.nanoTime() - c0) / 1e9
        val (cFiles, cRows) = graft.sources.Bucketed.fileStats(spark, bandsT)
        log.println(f"""{"batch":$b,"secs":$cSecs%.2f,"band_files":$cFiles,""" +
          s""""band_rows":$cRows,"compacted":true}""")
        log.flush()
      }
    }
    log.close()

    val corpusRows = spark.read.parquet(corpusDir).count()
    println(s"""{"metric":"compact_soak","batches":$nBatches,""" +
      s""""docs_per_batch":$perBatch,"seed_docs":$nSeeds,""" +
      s""""compact_after_batch":${compactAt - 1},"corpus_rows":$corpusRows,""" +
      s""""artifact":"$outPath"}""")
    spark.stop()
  }
}
