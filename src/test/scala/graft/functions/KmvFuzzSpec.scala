package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential fuzz for the KMV buffer: over random multisets (dup
  * ratios, value ranges, sizes straddling k) and random partition
  * counts, the aggregator's retained array must equal the reference
  * computed in plain Scala — the k smallest DISTINCT hashes in
  * unsigned order, from the same `xxhash64` column. This is the
  * property every KMV estimator rests on; the hand-written spec
  * samples it, the fuzz sweeps it. */
class KmvFuzzSpec extends graft.SparkSpec {
  import spark.implicits._

  private val K = 64

  private val multiset: Gen[List[Long]] = for {
    n <- Gen.choose(0, 400)
    range <- Gen.oneOf(10L, 50L, 1000L, Long.MaxValue)
    vals <- Gen.listOfN(n, Gen.choose(-range, range))
  } yield vals

  private val caseGen: Gen[(List[Long], Int)] = for {
    vs <- multiset
    parts <- Gen.choose(1, 9)
  } yield (vs, parts)

  test("retained set == k smallest distinct hashes, any input, any partitioning") {
    val seed = Seed(20260814L)
    val cases = Iterator.iterate(caseGen.apply(Gen.Parameters.default, seed) ->
      seed) { case (_, s) =>
      val s2 = s.next
      caseGen.apply(Gen.Parameters.default, s2) -> s2
    }.map(_._1).take(25).toList
    cases.zipWithIndex.foreach { case (c, i) =>
      val (vals, parts) = c.getOrElse((Nil, 1))
      val df = vals.toDF("v").repartition(parts)
      // hashes via the same column function the operators use
      val hashes = df.select(xxhash64(col("v"))).as[Long].collect()
      val expected = hashes.map(_ ^ Long.MinValue).distinct.sorted.take(K)
      val got = df.select(xxhash64(col("v")).as("h")).as[Long]
        .select(new Kmv.KmvAgg(K).toColumn)
        .collect().head
      assert(got.sameElements(expected),
        s"case $i (n=${vals.length}, parts=$parts): " +
          s"got ${got.length} retained, expected ${expected.length}")
    }
  }
}
