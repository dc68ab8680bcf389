package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(docs: org.apache.spark.sql.DataFrame, div: Int) = {
    val tok = docs.select(explode(TextFns.tokens(col("text"))).as("token"))
    val n = tok.count()
    tok.groupBy("token").count()
      .filter(col("count") * div > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("heavyHitters equals exact GROUP BY + HAVING on a skewed corpus") {
    // one token is ~50% of occurrences, a few mid, long uniform tail
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"),
      concat_ws(" ", lit("hot hot mid"),
        concat(lit("tail"), pmod(col("id"), lit(500)))).as("text"))
    val got = HeavyHitters.heavyHitters(docs, capacity = 64, thresholdDiv = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact(docs, 32))
    assert(got.contains("hot") && got.contains("mid"))
    assert(!got.keys.exists(_.startsWith("tail")))
  }

  test("heavyHitters is invariant to partitioning (merge order)") {
    val docs = spark.range(0, 3000).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha beta"),
        concat(lit("t"), pmod(col("id"), lit(700)))).as("text"))
    val expected = exact(docs, 32)
    Seq(1, 7, 32).foreach { p =>
      val got = HeavyHitters.heavyHitters(docs.repartition(p))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"partitions=$p diverged")
    }
  }

  test("MG sketch guarantee: candidates cover every token above N/(c+1)") {
    // tight capacity (8) against 20 distinct tokens: the sketch must
    // still retain the 3 tokens above the 1/9 frequency bar
    val rows = (Seq.fill(40)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      (0 until 17).flatMap(i => Seq.fill(2)(s"z$i")))
    val docs = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = HeavyHitters.heavyHitters(docs, capacity = 8, thresholdDiv = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N = 124; bar = N/8 = 15.5 → {a:40, b:30, c:20}
    assert(got == Map("a" -> 40L, "b" -> 30L, "c" -> 20L))
  }
}
