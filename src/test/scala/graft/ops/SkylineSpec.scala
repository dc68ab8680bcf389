package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** 2-objective Pareto frontier: randomized brute-force equivalence,
  * tie semantics, NULL handling, and the multi-range-partition path. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side brute force: keep rows no other row dominates. */
  private def brute(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.toSet

  test("pareto2D equals brute force on randomized small domains") {
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { trial =>
      // small value domains force heavy x-ties and (x, y) twins
      val rows = (0L until 80L).map(i =>
        (i, rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
      val got = Skyline
        .pareto2D(rows.toDF("id", "x", "y"), "x", "y", parts = 5)
        .collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("x"), r.getAs[Long]("y")))
        .toSet
      assert(got == brute(rows), s"trial $trial")
    }
  }

  test("pareto2D: more partitions than distinct x (empty range partitions)") {
    val rows = Seq((1L, 1L, 9L), (2L, 5L, 5L), (3L, 9L, 1L), (4L, 5L, 4L))
    val got = Skyline
      .pareto2D(rows.toDF("id", "x", "y"), "x", "y", parts = 32)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L, 2L, 3L)) // 4 dominated by 2 (same x, lower y)
  }

  test("pareto2D: equal (x, y) twins both survive — neither dominates") {
    val rows = Seq((1L, 3L, 3L), (2L, 3L, 3L), (3L, 1L, 1L))
    val got = Skyline
      .pareto2D(rows.toDF("id", "x", "y"), "x", "y", parts = 3)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L, 2L))
  }

  test("pareto2D: NULL objectives are excluded, not frontier-eligible") {
    val rows = Seq((1L, Some(2L), Some(2L)), (2L, None, Some(9L)),
      (3L, Some(9L), None))
    val got = Skyline
      .pareto2D(rows.toDF("id", "x", "y"), "x", "y", parts = 3)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L))
  }

  test("paretoDocs/paretoOrders run against driver testdata") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val dir = "/root/testdata/sf0.001"
    val docsF = Skyline.paretoDocs(graft.Tables.documents(spark, dir)).collect()
    assert(docsF.nonEmpty)
    // frontier members are mutually non-dominating
    val pts = docsF.map(r =>
      (r.getAs[Long]("word_count"), r.getAs[Long]("quality")))
    pts.foreach { case (x, y) =>
      assert(!pts.exists { case (bx, by) =>
        bx >= x && by >= y && (bx > x || by > y) })
    }
    val ordersF = Skyline.paretoOrders(spark, dir)
    assert(ordersF.count() > 0)
  }
}
