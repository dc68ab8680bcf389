package graft

import java.io.{File, PrintWriter}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-stress bench: measures — with per-task times, not prose — what
  * a 100:1 hot join key does to a shuffle join, and that the engine's
  * two mitigations actually bound the tail:
  *
  *   - **AQE skew-join** (`spark.sql.adaptive.skewJoin`): runtime
  *     re-plan splits the oversized partition into chunks and
  *     replicates the matching build side;
  *   - **plan-level salting** ([[graft.ops.Relational.saltedJoin]]):
  *     the hot key is spread over N sub-keys before the shuffle ever
  *     happens — the guarantee AQE can only approximate after the
  *     first wave of the sorted exchange ran.
  *
  * Dataset: lineitem at the given SF, inflated ×`inflate` by an
  * explode (no new data invented — repeated rows, exactly what a skew
  * test needs), with the join key rewritten so every even orderkey
  * collapses onto ONE hot key: ~50% of all rows share it, >100× any
  * other key. The dim side carries one row per surviving key. The
  * aggregate after the join returns identical results in every
  * scenario — checked, not assumed.
  *
  * Scenarios (broadcast disabled throughout — broadcasting the dim is
  * the trivial fix and would hide the shuffle entirely; at 100 TB the
  * dim may not broadcast, which is when this matters):
  *   1. `sortmerge_noaqe` — the failure mode: one straggler task owns
  *      the hot key;
  *   2. `sortmerge_aqe_skewjoin` — AQE on, skew thresholds scaled to
  *      the dataset (defaults are 256 MB — tuned for clusters);
  *   3. `salted_16` — [[Relational.saltedJoin]] with 16 salts, AQE off
  *      (kept as the measured CAUTIONARY row: salting every key
  *      replicates the small side 16× across the board and loses on
  *      elapsed time);
  *   4. `salted_selective_16` — [[Relational.selectiveSaltedJoin]]:
  *      only keys above a frequency threshold salt, so the small side
  *      replicates for the one hot key only.
  *
  * Output: one JSON object per scenario (task count, p50/p95/max task
  * ms over the join stage, elapsed, result checksum) to
  * SKEW_BENCH_OUT (default artifacts/SKEW_STRESS.json).
  *
  * Measured result (sf0.1, inflate 20, 8 threads — see the committed
  * artifact): the hot key's straggler ratio (max/p50 task time)
  * collapses 2.8 → 1.3 under AQE skew-join (the hot partition
  * visibly splits: 16 join tasks, max task 3041 → 466 ms) and
  * → 1.15 under salting. At this toy scale salting pays more
  * wall-clock than it saves (the 16× dim replication and the coarse
  * 8-partition join dominate); its value is the GUARANTEE — the tail
  * is bounded in the plan, before any runtime statistics exist, which
  * is what a 1000-executor job wants when a retry must not straggle
  * either. Two findings this bench surfaced that matter at 100 TB:
  * AQE can only split a skewed partition at MAP-output granularity
  * (a single-row-group input = one map task = unsplittable), and an
  * aggregate between the shuffle stage and the join defeats
  * OptimizeSkewedJoin's pattern — both are encoded below.
  */
object SkewBench {

  /** Collects per-task (duration, shuffle-read bytes) keyed by stage. */
  private final class TaskTimes extends SparkListener {
    val byStage = scala.collection.mutable.Map[Int, Vector[(Long, Long)]]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      if (t.taskInfo != null && t.taskInfo.successful) {
        val read = Option(t.taskMetrics)
          .map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L)
        byStage(t.stageId) = byStage.getOrElse(t.stageId, Vector.empty) :+
          ((t.taskInfo.duration, read))
      }
    }
    def reset(): Unit = synchronized { byStage.clear() }
    /** The join stage: the LAST stage whose shuffle read is within 2x
      * of the biggest reader (the pre-repartition reduce stage reads
      * the same bytes but runs earlier; the final aggregates read
      * kilobytes). */
    def joinStage: (Int, Vector[Long]) = synchronized {
      val maxRead = byStage.values.map(_.map(_._2).sum).max
      val (sid, rows) = byStage.filter(_._2.map(_._2).sum * 2 >= maxRead)
        .maxBy(_._1)
      (sid, rows.map(_._1))
    }
  }

  private def pct(sorted: Vector[Long], p: Double): Long =
    sorted((p * (sorted.size - 1)).round.toInt)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val inflate = sys.env.getOrElse("SKEW_BENCH_INFLATE", "10").toInt
    val outPath = sys.env.getOrElse("SKEW_BENCH_OUT", "artifacts/SKEW_STRESS.json")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // broadcast would dissolve the shuffle under test
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // honest partition sizes: the synthetic repeats compress ~100x,
      // which would put the HOT partition under AQE's byte thresholds
      // (a real 100 TB hot key would not be a compression artifact)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")

      .getOrCreate()
    spark.sparkContext.setLogLevel(
      if (sys.env.contains("SKEW_BENCH_LOG")) "INFO" else "WARN")
    val times = new TaskTimes
    spark.sparkContext.addSparkListener(times)

    // ~50% of rows land on hot key 0: every even orderkey collapses.
    // Inflation repeats each line `inflate` times (rep kept so salting
    // has a deterministic per-row attribute to salt by).
    // The explicit repartition gives the join shuffle a MANY-map-task
    // input: AQE splits a skewed reduce partition at map-output
    // granularity, so a single-row-group parquet scan (one map task)
    // would give it nothing to split at — at 100 TB the map side is
    // thousands of tasks and this is the realistic shape.
    // localCheckpoint: every scenario reads the SAME materialized
    // input (at 100 TB the join input is a table on disk, not a
    // lineage) — without it a scenario that consumes the left side
    // twice (selective salting's frequency pass) would be charged a
    // full re-run of the explode+repartition, measuring lineage
    // recomputation instead of the join under test
    val skewed: DataFrame = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn("rep", explode(sequence(lit(1), lit(inflate))))
      .repartition(cpus * 8)
      .withColumn("k",
        when(pmod(col("l_orderkey"), lit(2)) === 0, lit(0L))
          .otherwise(col("l_orderkey")))
      .localCheckpoint()
    // Aggregate-free dim (unique keys by construction: odd orderkeys
    // pass through, the collapsed even keys are replaced by ONE literal
    // row): AQE's OptimizeSkewedJoin pattern-matches
    // SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — an aggregate
    // between the stage and the join defeats it, which is a real
    // Spark constraint this bench must not trip over.
    def dim: DataFrame = {
      import spark.implicits._
      Tables.orders(spark, sfDir)
        .filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .select(col("o_orderkey").as("k"),
          col("o_orderpriority").as("prio"))
        .unionAll(Seq((0L, "HOT")).toDF("k", "prio"))
    }

    def scenario(name: String, aqe: Boolean, skewJoin: Boolean)
                (join: => DataFrame): Map[String, Any] = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin)
      // scale AQE's cluster-sized skew thresholds to this dataset
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      times.reset()
      val t0 = System.nanoTime()
      // one number that must agree across scenarios
      val agg = join
        .groupBy("prio").agg(sum("cents").as("s"), count(lit(1)).as("n"))
        .agg(expr("bit_xor(xxhash64(prio, s, n))")) // xor: no ANSI overflow
      val sum0 = agg.collect().head.getLong(0)
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      // honest AQE signal: the final adaptive plan marks split
      // partitions with "skew=true" — record whether it actually fired
      val planStr = agg.queryExecution.executedPlan.toString
      if (sys.env.contains("SKEW_BENCH_PLAN")) println(planStr)
      val skewMarks = "(?i)skew".r.findAllIn(planStr).length
      val (stage, raw) = times.joinStage
      val d = raw.sorted
      Map("scenario" -> name, "cpus" -> cpus, "inflate" -> inflate,
        "elapsed_ms" -> elapsedMs,
        "join_stage" -> stage, "n_tasks" -> d.size,
        "task_p50_ms" -> pct(d, 0.50), "task_p95_ms" -> pct(d, 0.95),
        "task_max_ms" -> d.last,
        "straggler_ratio_pm" -> (if (pct(d, 0.50) > 0)
          1000L * d.last / pct(d, 0.50) else -1L),
        "aqe_skew_splits" -> skewMarks,
        "checksum" -> sum0)
    }

    val results = Seq(
      scenario("sortmerge_noaqe", aqe = false, skewJoin = false) {
        skewed.join(dim, "k")
      },
      scenario("sortmerge_aqe_skewjoin", aqe = true, skewJoin = true) {
        skewed.join(dim, "k")
      },
      scenario("salted_16", aqe = false, skewJoin = false) {
        graft.ops.Relational.saltedJoin(
          skewed, dim, "k", col("l_linenumber") * 31 + col("rep"), 16)
      },
      // round-12 revision: salt ONLY the keys above a frequency
      // threshold (here: anything past 100k rows — only the hot key
      // qualifies), everything else joins unsalted — the small side
      // replicates 16× for ONE key instead of all of them. Expected
      // (and measured): beats salted_16 on elapsed while keeping the
      // tail bounded in the plan.
      scenario("salted_selective_16", aqe = false, skewJoin = false) {
        graft.ops.Relational.selectiveSaltedJoin(
          skewed, dim, "k", col("l_linenumber") * 31 + col("rep"), 16,
          hotThreshold = 100000L)
      })

    val checks = results.map(_("checksum")).distinct
    require(checks.size == 1,
      s"scenarios disagree on the join result: $checks")

    Option(new File(outPath).getAbsoluteFile.getParentFile).foreach(_.mkdirs())
    val out = new PrintWriter(new File(outPath))
    def render(m: Map[String, Any]): String = m.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v)         => s""""$k":$v"""
    }.mkString("{", ",", "}")
    out.println("[" + results.map(render).mkString(",\n ") + "]")
    out.close()
    results.foreach(r => println(render(r)))
    spark.stop()
  }
}
