package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV sketch laws: exactness below k, multiplicity-blindness,
  * partition/merge-tree invariance (exact array equality), column
  * union ≡ direct sketch, and bounded error in true estimation mode.
  * Everything here is deterministic — xxhash64 is seedless-stable, so
  * a bound that passes once passes forever. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val K = 1024

  private def sketchOf(ds: Dataset[Long], k: Int = K,
                       parts: Int = 4): Array[Long] =
    ds.repartition(parts).toDF("v")
      .select(xxhash64(col("v")).as("h")).as[Long]
      .select(new Kmv.KmvAgg(k).toColumn)
      .collect().head

  test("exact below k: estimate and intersection are the value counts") {
    val a = spark.range(0L, 500L).as[Long]
    val b = spark.range(300L, 900L).as[Long]
    val ska = sketchOf(a); val skb = sketchOf(b)
    assert(ska.length == 500 && skb.length == 600)
    val r = Seq((ska, skb)).toDF("a", "b")
      .select(Kmv.estimate(col("a"), K).as("ea"),
        Kmv.estimate(col("b"), K).as("eb"),
        Kmv.intersectEstimate(col("a"), col("b"), K).as("ei"))
      .collect().head
    assert(r.getLong(0) == 500L && r.getLong(1) == 600L)
    assert(r.getLong(2) == 200L) // exact |[300,500)| while both exact
  }

  test("multiplicity-blind: 5x duplicated input yields the identical array") {
    val once = spark.range(0L, 2000L).as[Long]
    val five = spark.range(0L, 10000L).map(_ % 2000L)
    assert(sketchOf(once, k = 256).sameElements(sketchOf(five, k = 256)))
  }

  test("partitioning/merge-tree invariant: exact array equality") {
    val ds = spark.range(0L, 50000L).as[Long]
    val s1 = sketchOf(ds, parts = 1)
    val s13 = sketchOf(ds, parts = 13)
    assert(s1.sameElements(s13))
    assert(s1.length == K)
  }

  test("unionSketch column == direct sketch of the union") {
    val a = spark.range(0L, 30000L).as[Long]
    val b = spark.range(20000L, 60000L).as[Long]
    val u = spark.range(0L, 60000L).as[Long]
    val got = Seq((sketchOf(a), sketchOf(b))).toDF("a", "b")
      .select(Kmv.unionSketch(col("a"), col("b"), K)).as[Array[Long]]
      .collect().head
    assert(got.sameElements(sketchOf(u)))
  }

  test("estimation mode: count and intersection within expected error") {
    val a = spark.range(0L, 20000L).as[Long]
    val b = spark.range(10000L, 30000L).as[Long]
    val ska = sketchOf(a); val skb = sketchOf(b)
    assert(ska.length == K) // genuinely estimating, not exact
    val r = Seq((ska, skb)).toDF("a", "b")
      .select(Kmv.estimate(col("a"), K).as("ea"),
        Kmv.intersectEstimate(col("a"), col("b"), K).as("ei"))
      .collect().head
    // RSE ~ 1/sqrt(k-1) ~ 3.1% for the count; the intersection keeps
    // W ~ k*|∩|/|∪| ~ 341 samples => ~5.4% RSE. 5x margins.
    assert(math.abs(r.getLong(0) - 20000L) <= 3000L, s"count est ${r.getLong(0)}")
    assert(math.abs(r.getLong(1) - 10000L) <= 2700L, s"inter est ${r.getLong(1)}")
  }

  test("userTypeOverlap: all invariants hold on synthetic partial overlap") {
    // users 0..599 click, 300..899 view, 600..1199 error: overlaps
    // click∩view=300, click∩error=0(absent), view∩error=300
    def ev(t: String, lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("user_id"), lit(t).as("event_type"),
        expr("cast(1704067200 + id % 86400 as timestamp)").as("ts"))
    val events = ev("click", 0, 600).union(ev("view", 300, 900))
      .union(ev("error", 600, 1200))
    val got = graft.ops.Windows.userTypeOverlap(events, k = 1024).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("exact_overlap"), r.getAs[Long]("est_ok"),
          r.getAs[Long]("merge_invariant"))).toMap
    // zero-overlap pairs are absent by construction (exact side is an
    // inner join); both present pairs carry green flags
    assert(got.keySet == Set(("click", "view"), ("error", "view")))
    assert(got(("click", "view")) == (300L, 1L, 1L))
    assert(got(("error", "view")) == (300L, 1L, 1L))
  }
}
