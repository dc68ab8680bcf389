package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-design evidence: bucketed tables co-locate their join — the
  * plan must contain a SortMergeJoin with NO shuffle Exchange on either
  * side (bucket layout satisfies the join distribution). This is the
  * 100 TB recipe for repeated fact-fact joins: pay the partitioning once
  * at write time, never per query. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two bucketed tables plans no shuffle Exchange") {
    spark.sql("DROP TABLE IF EXISTS bspec_orders")
    spark.sql("DROP TABLE IF EXISTS bspec_lines")
    (1L to 1000L).map(i => (i, s"o$i")).toDF("k", "o")
      .write.bucketBy(4, "k").sortBy("k").saveAsTable("bspec_orders")
    (1L to 3000L).map(i => (i % 1000 + 1, i.toDouble)).toDF("k", "v")
      .write.bucketBy(4, "k").sortBy("k").saveAsTable("bspec_lines")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bspec_orders")
        .join(spark.table("bspec_lines"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 3000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bspec_orders")
      spark.sql("DROP TABLE IF EXISTS bspec_lines")
    }
  }

  test("aggregation on the bucket key also avoids the shuffle") {
    spark.sql("DROP TABLE IF EXISTS bspec_agg")
    (1L to 1000L).map(i => (i % 50, i.toDouble)).toDF("k", "v")
      .write.bucketBy(4, "k").saveAsTable("bspec_agg")
    try {
      val agg = spark.table("bspec_agg").groupBy("k").agg(sum("v"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(agg.count() == 50L)
    } finally spark.sql("DROP TABLE IF EXISTS bspec_agg")
  }
}
