package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.AnnIndex

/** Cell-balance drift under sustained frozen-centroid appends, and what
  * [[graft.llm.AnnIndex.recluster]] buys back — the measurement behind
  * the recluster maintenance op: [[graft.llm.AnnIndex.append]] assigns
  * new vectors against centroids that never move (the invariant that
  * makes append ≡ rebuild exact and appends cheap), so a distribution
  * shift in the ingest piles vectors into a few hot cells. Probe cost
  * is proportional to the probed cell's population, so the relevant
  * figures are the MAX cell share (worst single-probe scan, in
  * permille of the corpus) and the skew ratio (max/mean cell size,
  * [[graft.llm.Similarity.cellStatsFromCells]]'s skew_pm): a perfectly
  * balanced 16-cell index probes ~62 pm of the corpus per 1-probe
  * query; every point of drift multiplies that.
  *
  * Protocol: build on the base slice, run DRIFT_ROUNDS appends drawn
  * from a shifted distribution (|x| — the positive orthant, a
  * deterministic stand-in for "the new corpus source points somewhere
  * else"), snapshot the cell-size distribution each round, then
  * recluster (1 warm-start Lloyd round) and snapshot once more.
  * Output: one JSON line per round in artifacts/ANN_DRIFT.json
  * (`rounds` array) plus the post-recluster snapshot — the
  * drift-then-rebalance curve an operator would alert on.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
  * DRIFT_ROUNDS (default 6), DRIFT_RECLUSTER_ITERS (default 1),
  * DRIFT_OUT (artifacts/ANN_DRIFT.json). */
object AnnDrift {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val rounds = sys.env.getOrElse("DRIFT_ROUNDS", "6").toInt
    val lloydIters = sys.env.getOrElse("DRIFT_RECLUSTER_ITERS", "1").toInt
    val out = sys.env.getOrElse("DRIFT_OUT", "artifacts/ANN_DRIFT.json")
    val wh = java.nio.file.Files.createTempDirectory("ann_drift_wh").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val name = "ann_drift_bench"
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") < 16 || pmod(col("vec_id"), lit(4)) === 0)
      .select("vec_id", "embedding")
    // round i appends the (i mod 3)-th residue slice, remapped to fresh
    // ids, pushed into the positive orthant — the same shifted source
    // arriving batch after batch
    def batch(i: Int) =
      emb.filter(pmod(col("vec_id"), lit(4)) === (i % 3) + 1)
        .select((col("vec_id") + 100000L * i).as("vec_id"),
          transform(col("embedding"), x => abs(x)).as("embedding"))

    def snapshot(round: Int): String = {
      val st = AnnIndex.cellStats(spark, name)
        .agg(max("share_pm").as("max_share_pm"),
          max("skew_pm").as("max_skew_pm"),
          count(lit(1)).as("n_cells"),
          sum("n_vecs").as("rows"),
          max("n_vecs").as("max_cell_rows"))
        .head()
      s"""{"round":$round,"max_share_pm":${st.getLong(0)},""" +
        s""""max_skew_pm":${st.getLong(1)},"n_cells":${st.getLong(2)},""" +
        s""""rows":${st.getLong(3)},"max_cell_rows":${st.getLong(4)}}"""
    }

    AnnIndex.build(base, name)
    val series = scala.collection.mutable.ArrayBuffer(snapshot(0))
    for (i <- 1 to rounds) {
      AnnIndex.append(batch(i), name)
      series += snapshot(i)
    }
    val t0 = System.nanoTime()
    AnnIndex.recluster(spark, name, refineIters = lloydIters)
    val reclusterSec = (System.nanoTime() - t0) / 1e9
    val after = snapshot(rounds + 1)
    val json =
      s"""{"metric":"ann_drift","sf_dir":"$sfDir","rounds":$rounds,""" +
        s""""cpus":$cpus,"drift_series":[${series.mkString(",")}],""" +
        s""""post_recluster":$after,"recluster_lloyd_iters":$lloydIters,""" +
        s""""recluster_sec":${f"$reclusterSec%.2f"},""" +
        s""""note":"drift_series[i] = cell stats after i frozen-centroid appends from the |x| orthant; post_recluster = after $lloydIters warm-start Lloyd round(s) (reassign + staged swap); max_share_pm is the worst 1-probe scan fraction"}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
