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
