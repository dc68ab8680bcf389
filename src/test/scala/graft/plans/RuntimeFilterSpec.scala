package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime bloom-filter join pruning: Spark injects a bloom filter
  * built from the SELECTIVE side of a shuffle join into the big
  * side's scan, so probe rows that cannot match die before the
  * exchange — the engine-native form of the semi-join reduction our
  * decontamination gate hand-rolls. Size thresholds keep it off at
  * test scale, so this spec lowers them and proves the q10-shaped
  * join (filtered orders into lineitem) actually plans the filter —
  * the evidence the optimization fires on exactly this engine's
  * plans at 100 TB, where the thresholds are met for real. */
class RuntimeFilterSpec extends SparkSpec {

  test("q10-shaped join injects a bloom filter under realistic sizes") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata not present")
    val conf = spark.conf
    val enabledKey = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val threshKey =
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
    val appKey =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val before = (conf.get(enabledKey), conf.get(threshKey), conf.get(appKey),
      conf.get(bcastKey))
    try {
      conf.set(enabledKey, "true")
      conf.set(threshKey, "10MB") // creation side must sit BELOW this (it does)
      conf.set(appKey, "1KB")     // probe side must sit ABOVE this: the 10GB
                                  // default is a production-scan bar our
                                  // sf0.001 file obviously misses — lowering
                                  // it stands in for the 100 TB scan
      conf.set(bcastKey, "-1")    // a broadcastable creation side suppresses
                                  // injection (the broadcast join's own hash
                                  // table already prunes); at 100 TB the dim
                                  // side of a big-big join isn't broadcastable
      val dir = "/root/testdata/sf0.001"
      val li = graft.Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice")
      val ord = graft.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      // no broadcast hint: force the shuffle-join shape the filter
      // targets (a broadcast join already prunes via its hash table)
      val joined = li.join(ord.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"no bloom runtime filter in optimized plan:\n$plan")
      // and it still answers correctly with the filter in place
      assert(joined.count() > 0L)
    } finally {
      conf.set(enabledKey, before._1)
      conf.set(threshKey, before._2)
      conf.set(appKey, before._3)
      conf.set(bcastKey, before._4)
    }
  }
}
