package graft.plans

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom per-key top-k operator: row_number-exact results with a
  * heap-per-key plan — one hash exchange, NO SortExec, the custom exec
  * visible in explain(). */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def rev = Seq(
    ("a", 1L, 100L), ("a", 2L, 300L), ("a", 3L, 300L), ("a", 4L, 50L),
    ("b", 5L, 10L), ("b", 6L, 20L),
    ("c", 7L, 7L)).toDF("key", "id", "v")

  test("equals the row_number window form, ties broken by the tiebreak") {
    graft.functions.GraftExtensions.register(spark)
    val got = TopKPerKey.topK(rev, Seq("key"), "v", "id", 2)
      .select("key", "id", "v", "rank")
      .as[(String, Long, Long, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val want = rev.withColumn("rank", row_number().over(
        Window.partitionBy("key").orderBy(col("v").desc, col("id"))).cast("long"))
      .filter(col("rank") <= 2)
      .select("key", "id", "v", "rank")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // the v=300 tie within key 'a' resolves to the lower id at rank 1
    assert(got.contains(("a", 2L, 300L, 1L)) && got.contains(("a", 3L, 300L, 2L)))
  }

  test("plan: custom exec, one exchange, zero sorts") {
    graft.functions.GraftExtensions.register(spark)
    val df = TopKPerKey.topK(rev, Seq("key"), "v", "id", 2)
    df.collect() // force final adaptive plan
    val plan = planNodes(df.queryExecution.executedPlan)
    assert(plan.exists(_.isInstanceOf[TopKPerKeyExec]),
      "custom operator missing from the physical plan")
    assert(!plan.exists(_.isInstanceOf[SortExec]),
      "top-k must not sort")
    assert(plan.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      "exactly one clustering exchange expected")
  }

  test("generalized ordering: doubles and NULLs match row_number exactly") {
    // round-12 claims: (a) non-long primaries work (double scores),
    // (b) NULL ordering matches the window form's defaults — DESC
    // NULLS LAST on the primary, ASC NULLS FIRST on the tiebreak —
    // where the old getLong path silently read NULL as 0
    val df = Seq[(String, java.lang.Long, java.lang.Double)](
      ("a", 1L, 0.9), ("a", 2L, null), ("a", 3L, 0.7), ("a", 4L, -0.5),
      ("b", 5L, 0.0), ("b", 6L, -0.0), // -0.0 == 0.0: tiebreak decides
      ("b", 7L, null), ("b", 8L, 2.5))
      .toDF("key", "id", "score")
    val got = TopKPerKey.topK(df, Seq("key"), "score", "id", 3)
      .select("key", "id", "rank")
      .as[(String, Long, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val want = df.withColumn("rank", row_number().over(
        Window.partitionBy("key").orderBy(col("score").desc, col("id"))).cast("long"))
      .filter(col("rank") <= 3)
      .select("key", "id", "rank")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want && got.size == 6)
    // NULL score sorts LAST under DESC: id=2 must be outside key a's
    // top-3 of real scores... a has 3 non-null scores, so the null row
    // is cut; b has 3 non-null, null id=7 cut, and -0.0 vs 0.0 resolve
    // by id (5 before 6)
    assert(!got.exists(_._2 == 2L) && !got.exists(_._2 == 7L))
    assert(got.contains(("b", 5L, 2L)) && got.contains(("b", 6L, 3L)))
  }

  test("string ordering columns work (orderable non-numeric types)") {
    val df = Seq(("x", 10L, "beta"), ("x", 11L, "alpha"), ("x", 12L, "gamma"),
      ("y", 20L, "delta")).toDF("key", "id", "name")
    // primary DESC on a STRING: gamma > beta > alpha
    val got = TopKPerKey.topK(df, Seq("key"), "name", "id", 2)
      .select("id", "rank").as[(Long, Long)].collect().toSet
    assert(got == Set((12L, 1L), (10L, 2L), (20L, 1L)))
  }

  test("non-orderable ordering column fails fast at plan build") {
    val df = Seq((1L, Map("a" -> 1L))).toDF("id", "m")
    val e = intercept[IllegalArgumentException] {
      TopKPerKey.topK(df, Seq("id"), "m", "id", 1)
    }
    assert(e.getMessage.contains("not orderable"))
  }

  test("hot-key stress: 200k rows on one key, bounded retention, exact result") {
    graft.functions.GraftExtensions.register(spark)
    val big = spark.range(200000L)
      .select(lit("hot").as("key"), col("id"),
        pmod(col("id") * 2654435761L, lit(1000000L)).as("v"))
      .unionAll(spark.range(50L).select(lit("cold").as("key"),
        col("id") + 1000000L, col("id") * 2L))
    val got = TopKPerKey.topK(big, Seq("key"), "v", "id", 5)
      .select("key", "id", "v", "rank")
      .as[(String, Long, Long, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val want = big.withColumn("rank", row_number().over(
        Window.partitionBy("key").orderBy(col("v").desc, col("id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select("key", "id", "v", "rank")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want && got.size == 10)
  }
}
