package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank invariants: rank conservation (no dangling mass on
  * bidirectional graphs), known closed-form fixpoints, and plan-level
  * determinism under repartitioning. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int) =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

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
