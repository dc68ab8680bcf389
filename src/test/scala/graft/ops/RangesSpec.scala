package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangesSpec extends SparkSpec {
  import spark.implicits._

  test("pointInIntervalJoin matches brute force, half-open bounds") {
    // points 0..99; intervals of assorted lengths, some spanning many
    // buckets, one empty, one zero-length
    val ptRows = (0L until 100L).map(p => (p, s"p$p"))
    val ivRows = Seq(
      (1L, 0L, 8L),    // within one bucket
      (2L, 5L, 23L),   // spans 3 buckets at width 8
      (3L, 7L, 8L),    // single point 7
      (4L, 40L, 40L),  // empty: matches nothing
      (5L, 90L, 300L), // runs past the point domain
      (6L, 15L, 17L)   // straddles the 15|16 bucket boundary
    )
    val pts = ptRows.toDF("p", "ptag")
    val ivs = ivRows.toDF("iv_id", "s", "e")
    val got = Ranges.pointInIntervalJoin(pts, "p", ivs, "s", "e")
      .select("iv_id", "p").as[(Long, Long)].collect().toSet
    val want = (for {
      (p, _) <- ptRows
      (id, s, e) <- ivRows
      if p >= s && p < e
    } yield (id, p)).toSet
    assert(got == want)
    // half-open spot checks: start included, end excluded
    assert(want.contains((1L, 0L)) && !want.contains((1L, 8L)))
    assert(got.count(_._1 == 3L) == 1)
    assert(!got.exists(_._1 == 4L))
  }

  test("bucketWidth is semantics-free") {
    val pts = (0L until 50L).toDF("p")
    val ivs = Seq((1L, 3L, 30L), (2L, 29L, 31L)).toDF("iv_id", "s", "e")
    val at = (w: Int) =>
      Ranges.pointInIntervalJoin(pts, "p", ivs, "s", "e", bucketWidth = w)
        .select("iv_id", "p").as[(Long, Long)].collect().toSet
    assert(at(1) == at(8) && at(8) == at(64))
  }

  test("plan is an equi-join on the bucket, never a nested loop") {
    val pts = (0L until 1000L).toDF("p")
    val ivs = (0L until 100L).map(i => (i, i * 3, i * 3 + 10))
      .toDF("iv_id", "s", "e")
    val df = Ranges.pointInIntervalJoin(pts, "p", ivs, "s", "e")
    df.collect()
    val names = planNodes(df.queryExecution.executedPlan)
      .map(_.getClass.getSimpleName)
    assert(!names.exists(n => n.contains("BroadcastNestedLoopJoin") ||
      n.contains("CartesianProduct")), names.distinct.mkString(", "))
  }

  test("orderShipWindow keeps zero-match orders") {
    // build tiny orders/lineitem shaped frames via the real query on sf0.001
    val df = Ranges.orderShipWindow(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val nOrders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet").count()
    assert(rows.length == nOrders)
    assert(rows.forall(_.getLong(1) >= 0L))
    assert(rows.exists(_.getLong(1) > 0L))
  }
}
