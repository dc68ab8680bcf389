package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank invariants: rank conservation (including dangling-mass
  * redistribution on graphs with sink nodes), known closed-form
  * fixpoints, and plan-level determinism under repartitioning. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int) =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** In-memory reference PageRank with the same dangling-mass
    * redistribution semantics the engine implements — the oracle for
    * the dangling-graph cases. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(out.contains).map(rank).sum
      val inflow = edges.groupBy(_._2).view
        .mapValues(es => es.map(e => rank(e._1) / out(e._1)).sum).toMap
      rank = nodes.map(v =>
        v -> ((1 - d) / n + d * (inflow.getOrElse(v, 0.0) + dm / n))).toMap
    }
    rank
  }

  test("directed ring: uniform distribution is the exact fixpoint") {
    val n = 10L
    val ring = (0L until n).map(i => i -> ((i + 1) % n))
    val ranks = ranksOf(ring, 5)
    ranks.values.foreach(r => assert(math.abs(r - 1.0 / n) < 1e-12))
  }

  test("bidirectional star: hub dominates, ranks sum to 1") {
    val star = (1L to 9L).flatMap(i => Seq(0L -> i, i -> 0L))
    val ranks = ranksOf(star, 4)
    val hub = ranks(0L)
    (1L to 9L).foreach(i => assert(hub > 3 * ranks(i)))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    // leaves are symmetric: identical rank
    assert((1L to 9L).map(ranks).distinct.size === 1)
  }

  test("supply graph at sf0.001: conservation + full node coverage") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val edges = Graph.supplyEdges(li)
    val ranks = Graph.pageRank(edges, 3)
    val nNodes = li.select("l_suppkey").distinct().count() +
      li.select("l_partkey").distinct().count()
    assert(ranks.count() === nNodes)
    val total = ranks.agg(sum("rank")).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9,
      s"rank mass not conserved: $total (dangling nodes should not exist)")
  }

  test("dangling sink: mass is redistributed, ranks match the reference") {
    // 0 -> 1 -> 2 where 2 has NO out-edges: without redistribution the
    // rank flowing into 2 leaks every iteration and the total decays
    val chain = Seq(0L -> 1L, 1L -> 2L)
    for (iters <- Seq(1, 3, 7)) {
      val got = ranksOf(chain, iters)
      val want = refPageRank(chain, iters)
      assert(got.keySet === want.keySet)
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-12, s"node $v at $iters iters")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9,
        s"dangling mass leaked at $iters iters: ${got.values.sum}")
    }
  }

  test("dangling hub: a sink with many in-edges conserves total rank") {
    // stars INTO node 99 (dangling), plus a 2-cycle on the side; the
    // sink hoards inflow which must recycle to everyone via DM/N
    val edges = (1L to 5L).map(i => i -> 99L) ++ Seq(6L -> 7L, 7L -> 6L)
    for (iters <- Seq(2, 6)) {
      val got = ranksOf(edges, iters)
      val want = refPageRank(edges, iters)
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-12, s"node $v at $iters iters")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9)
      // the sink outranks its symmetric feeders
      assert(got(99L) > got(1L))
    }
  }

  test("dangling graph: checkpoint cadence never changes the ranks") {
    // DM is computed from the previous ranks inside the lazy span —
    // truncating lineage at different points must be numerically inert
    val edges = Seq(0L -> 1L, 1L -> 2L, 0L -> 2L, 2L -> 3L) // 3 dangles
    def run(every: Int) =
      Graph.pageRank(edges.toDF("src", "dst"), 9, checkpointEvery = every)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(5) === run(1))
  }

  test("tol stops a converged iteration early; tol=0 never changes results") {
    // directed ring: uniform from step 0, so the first convergence
    // check (after one checkpoint span) sees delta == 0 and exits —
    // far below the 100-iteration cap (wall-clock-visible if it didn't)
    val n = 8L
    val ring = (0L until n).map(i => i -> ((i + 1) % n))
    val t0 = System.nanoTime()
    val ranks = Graph.pageRank(ring.toDF("src", "dst"), 100,
        checkpointEvery = 2, tol = 1e-12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    ranks.values.foreach(r => assert(math.abs(r - 1.0 / n) < 1e-12))
    assert(sec < 30, s"convergence exit did not fire (took $sec s)")
    // and the default tol=0 path is exactly the old fixed-count loop
    val fixed = Graph.pageRank(ring.toDF("src", "dst"), 4)
      .collect().map(r => r.getDouble(1))
    fixed.foreach(r => assert(math.abs(r - 1.0 / n) < 1e-12))
  }

  test("lineage truncation (checkpointEvery) never changes the ranks") {
    // 12 iterations cross the checkpoint boundary twice at the default
    // cadence; against checkpointEvery=1 (truncate every step) the
    // arithmetic is identical — checkpointing is a plan-shape decision,
    // never a numeric one
    val star = (1L to 6L).flatMap(i => Seq(0L -> i, i -> 0L))
    def run(every: Int) =
      Graph.pageRank(star.toDF("src", "dst"), 12, checkpointEvery = every)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(5) === run(1))
  }

  private def pprOf(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int) =
    Graph.personalizedPageRank(edges.toDF("src", "dst"),
        seeds.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("PPR with all nodes as seeds == uniform PageRank (no dangling)") {
    val star = (1L to 9L).flatMap(i => Seq(0L -> i, i -> 0L))
    val uniform = ranksOf(star, 4)
    val ppr = pprOf(star, 0L to 9L, 4)
    uniform.foreach { case (v, r) => assert(math.abs(ppr(v) - r) < 1e-12) }
  }

  test("PPR: mass conserves; rank concentrates at the seed side") {
    val star = (1L to 9L).flatMap(i => Seq(0L -> i, i -> 0L))
    val ppr = pprOf(star, Seq(3L), 6)
    assert(math.abs(ppr.values.sum - 1.0) < 1e-9)
    // the seed leaf outranks every other leaf (restart bias), and the
    // non-seed leaves stay symmetric
    (1L to 9L).filter(_ != 3L).foreach(i => assert(ppr(3L) > ppr(i)))
    assert((1L to 9L).filter(_ != 3L).map(ppr).distinct.size === 1)
  }

  test("PPR: rank stays 0 off the seeds' reachable component") {
    // two disjoint 2-cycles; seed in the first
    val edges = Seq(1L -> 2L, 2L -> 1L, 10L -> 11L, 11L -> 10L)
    val ppr = pprOf(edges, Seq(1L), 5)
    assert(ppr(10L) === 0.0 && ppr(11L) === 0.0)
    assert(math.abs(ppr.values.sum - 1.0) < 1e-12)
  }

  test("PPR with a dangling sink: mass restarts at the seeds, conserves") {
    // 1 -> 2 -> 3 (3 is a sink); seed at 1
    val edges = Seq(1L -> 2L, 2L -> 3L)
    val ppr = pprOf(edges, Seq(1L), 6)
    assert(math.abs(ppr.values.sum - 1.0) < 1e-9)
    // hand reference with the same DM-to-seeds semantics
    val nodes = Seq(1L, 2L, 3L)
    val out = Map(1L -> 1, 2L -> 1)
    val sv = Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0)
    var rank = sv
    for (_ <- 1 to 6) {
      val dm = rank(3L)
      val inflow = Map(2L -> rank(1L), 3L -> rank(2L))
      rank = nodes.map(v => v ->
        (0.15 * sv(v) + 0.85 * (inflow.getOrElse(v, 0.0) + dm * sv(v)))).toMap
    }
    nodes.foreach(v => assert(math.abs(ppr(v) - rank(v)) < 1e-12, s"node $v"))
  }

  test("PPR rejects seeds outside the graph, loudly") {
    val edges = Seq(1L -> 2L, 2L -> 1L)
    val e = intercept[IllegalArgumentException] {
      pprOf(edges, Seq(99L), 2)
    }
    assert(e.getMessage.contains("seed"))
  }

  test("BFS on a path graph: level == hop index, early stop at the end") {
    val path = (0L until 6L).map(i => i -> (i + 1))
    val got = Graph.bfsLevels(path.toDF("src", "dst"),
        Seq(Tuple1(0L)).toDF("node"), 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === (0L to 6L).map(i => i -> i.toInt).toMap)
  }

  test("BFS stays inside its component and respects maxHops") {
    // two disjoint 3-cycles; seed in the first one
    val c1 = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L)
    val c2 = Seq(10L -> 11L, 11L -> 12L, 12L -> 10L)
    val all = (c1 ++ c2).toDF("src", "dst")
    val seeds = Seq(Tuple1(0L)).toDF("node")
    val got = Graph.bfsLevels(all, seeds, 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2))
    // hop bound truncates the path: only 2 hops from the seed
    val bounded = Graph.bfsLevels(all, seeds, 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(bounded === Set(0L, 1L))
  }

  test("multi-source BFS takes the min distance over seeds") {
    val path = (0L until 8L).map(i => i -> (i + 1))
    val seeds = Seq(Tuple1(0L), Tuple1(5L)).toDF("node")
    val got = Graph.bfsLevels(path.toDF("src", "dst"), seeds, 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // nodes 5..8 are closer to the second seed
    assert(got(4L) === 4 && got(5L) === 0 && got(6L) === 1 && got(8L) === 3)
  }

  test("rounded ranks are invariant under input repartitioning") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    def rounded(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(Graph.supplyEdges(df), 3)
        .select(col("node"), round(col("rank") * 1e9d).cast("long").as("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rounded(li) === rounded(li.repartition(17)))
  }
}
