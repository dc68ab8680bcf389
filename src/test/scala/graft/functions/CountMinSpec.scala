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

  test("absent keys estimate >= 0 and zero sketch estimates 0") {
    val skDf = spark.range(1).select(zeroCol.as("sk"))
    val e = skDf.select(estimate(col("sk"), lit(999983L)).as("e"))
      .collect()(0).getLong(0)
    assert(e === 0L)
    val sk = sketchOf(keys)
    assert(estOf(sk, 987654321L) >= 0L)
  }
}
