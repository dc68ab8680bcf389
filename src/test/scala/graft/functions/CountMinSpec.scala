package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch contracts: one-sided error (never undercounts),
  * EXACT merge invariance (integer counters — any split of the input
  * merges to the identical array), column-estimator/scalar agreement,
  * and the ε·N average-error bound on a skewed corpus. */
class CountMinSpec extends SparkSpec {

  import CountMin._

  // skewed corpus: key k appears ~N/k times (Zipf-ish), 200 distinct keys
  private lazy val keys: Seq[Long] =
    (1L to 200L).flatMap(k => Seq.fill((2000 / k).toInt)(k))

  private def sketchOf(ks: Seq[Long]): Array[Long] = {
    val agg = new CmsAgg
    ks.foldLeft(agg.zero)((b, k) => agg.reduce(b, k))
  }

  private def estOf(sk: Array[Long], k: Long): Long =
    (0 until D).map(i => sk(i * W + bucket(i, k))).min

  test("never undercounts; average overcount within eps*N") {
    val sk = sketchOf(keys)
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val overs = exact.map { case (k, cnt) =>
      val e = estOf(sk, k)
      assert(e >= cnt, s"undercount for $k: $e < $cnt")
      e - cnt
    }
    val epsN = math.E / W * keys.size
    assert(overs.sum.toDouble / overs.size <= epsN,
      s"mean overcount ${overs.sum.toDouble / overs.size} > eps*N $epsN")
  }

  test("merge invariance is exact for any split of the input") {
    val agg = new CmsAgg
    val whole = sketchOf(keys)
    for (splitAt <- Seq(1, 37, 500, keys.size - 1)) {
      val (l, r) = keys.splitAt(splitAt)
      val merged = agg.merge(sketchOf(l), sketchOf(r))
      assert(java.util.Arrays.equals(merged, whole),
        s"merge at $splitAt diverged from the one-shot sketch")
    }
    // empty buffers are identity elements
    assert(java.util.Arrays.equals(agg.merge(agg.zero, whole), whole))
    assert(java.util.Arrays.equals(agg.merge(whole.clone(), agg.zero), whole))
  }

  test("column estimator equals the scalar path; distributed == local") {
    import spark.implicits._
    val sk = sketchOf(keys)
    val df = keys.toDF("k")
    val sketched = df.as[Long]
      .groupByKey(_ => 0).mapValues(identity)
      .agg(new CmsAgg().toColumn.name("sk"))
      .toDF("g", "sk")
    val got = sketched.crossJoin(df.distinct())
      .select(col("k"), estimate(col("sk"), col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the distributed aggregation (arbitrary partition merge tree)
    // lands on the same array, so every estimate matches the local one
    got.foreach { case (k, e) => assert(e === estOf(sk, k)) }
  }

  test("full-Long key domain: overflow-free hash matches BigInt ground truth") {
    // the pre-r13 hash `a*k` wrapped Long for |k| >= ~2^39; the
    // mod-first form must agree with exact BigInt arithmetic for ANY
    // key — extremes, ±2^39 boundary straddlers, and negatives
    def bigBucket(i: Int, k: Long): Int = {
      val p = BigInt(P)
      val kr = (BigInt(k) % p + p) % p // floor-mod
      ((BigInt(A(i)) * kr + B(i)) % p % W).toInt
    }
    val hard = Seq(Long.MaxValue, Long.MinValue, -1L, 0L,
      (1L << 39) - 1, 1L << 39, (1L << 39) + 123L, -(1L << 45),
      Long.MaxValue - P, 987654321987654321L)
    for (k <- hard; i <- 0 until D) {
      val b = bucket(i, k)
      assert(b === bigBucket(i, k), s"hash $i wrong for key $k")
      assert(b >= 0 && b < W)
    }
    // and mod-first is congruent with the old small-key behavior:
    // keys below P (every TPC-H key) keep their exact buckets
    for (k <- Seq(1L, 42L, 199999L, P - 1); i <- 0 until D)
      assert(bucket(i, k) === ((A(i) * k + B(i)) % P % W).toInt)
    // a sketch over huge keys still never undercounts, and the Column
    // estimator agrees with the scalar path out to the extremes
    import spark.implicits._
    val hugeKeys = hard.flatMap(k => Seq.fill(3)(k))
    val sk = sketchOf(hugeKeys)
    val skDf = spark.range(1).select(lit(sk).as("sk"))
    hard.foreach { k =>
      val e = skDf.select(estimate(col("sk"), lit(k)).as("e"))
        .collect()(0).getLong(0)
      assert(e === estOf(sk, k), s"column/scalar split for key $k")
      assert(e >= 3L, s"undercount for huge key $k")
    }
  }

  test("absent keys estimate >= 0 and zero sketch estimates 0") {
    val skDf = spark.range(1).select(zeroCol.as("sk"))
    val e = skDf.select(estimate(col("sk"), lit(999983L)).as("e"))
      .collect()(0).getLong(0)
    assert(e === 0L)
    val sk = sketchOf(keys)
    assert(estOf(sk, 987654321L) >= 0L)
  }
}
