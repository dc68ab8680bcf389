package graft.sources

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed layout: same-bucketed tables join and aggregate with ZERO
  * exchanges, and the result matches the shuffled plan exactly. */
class BucketedJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def available = new java.io.File(sfDir).isDirectory

  private def nodes(p: SparkPlan): Seq[SparkPlan] = planNodes(p)

  /** Run `body` with broadcast joins off (forcing the join to confront
    * its distribution requirement) and restore the conf after. */
  private def noBroadcast[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  test("same-bucketed tables join with zero exchanges, same result as shuffled") {
    assume(available, "driver testdata not present")
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    try {
      Bucketed.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
      Bucketed.writeBucketed(ord, "ord_bucketed", "l_orderkey", 8)
      noBroadcast {
        val joined = Bucketed.colocatedJoin(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
        val plan = nodes(joined.queryExecution.executedPlan)
        val ex = plan.collect { case e: Exchange => e }
        assert(ex.isEmpty,
          s"bucketed join plans ${ex.length} exchange(s) — co-location lost")
        // correctness: identical count to the plain (shuffling) join
        val plain = li.join(ord, "l_orderkey")
        assert(joined.count() == plain.count())
        val plainEx = nodes(plain.queryExecution.executedPlan)
          .collect { case e: Exchange => e }
        assert(plainEx.nonEmpty, "control: the unbucketed join should shuffle")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("partitionBy layout prunes partitions at the scan") {
    assume(available, "driver testdata not present")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("part").toString + "/docs"
    Bucketed.writePartitioned(docs, out, "lang")
    val read = spark.read.parquet(out).filter(col("lang") === "en")
    val scan = nodes(read.queryExecution.executedPlan)
      .collectFirst { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .getOrElse(fail("no parquet scan in plan"))
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"filter did not become a partition filter: ${scan.partitionFilters}")
    val nLangs = docs.select("lang").distinct().count()
    assert(nLangs > 1, "fixture needs multiple languages")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 of $nLangs lang partitions selected, " +
        s"got ${scan.selectedPartitions.partitionCount}")
    assert(read.count() == docs.filter(col("lang") === "en").count())
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    assume(available, "driver testdata not present")
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    try {
      Bucketed.writeBucketed(li, "li_bucketed_agg", "l_orderkey", 8)
      val agg = spark.table("li_bucketed_agg")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      val ex = nodes(agg.queryExecution.executedPlan)
        .collect { case e: Exchange => e }
      assert(ex.isEmpty,
        s"bucket-key aggregation plans ${ex.length} exchange(s)")
      val expect = li.groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      assert(agg.count() == expect.count())
    } finally spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")
  }

  test("dynamic partition pruning: a joined dim's filter prunes fact partitions at runtime") {
    assume(available, "driver testdata not present")
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("dpp").toString + "/docs"
    Bucketed.writePartitioned(docs, out, "lang")
    val fact = spark.read.parquet(out)
    // the partition filter is NOT known at planning time here: it comes
    // from the dim's selective predicate, so only DPP can prune the scan
    val langs = docs.select("lang").distinct().as[String].collect().sorted
    assume(langs.length > 1, "fixture needs multiple languages")
    // the dim must be a real source (a LocalRelation would eagerly
    // fold the filter away, leaving no selective predicate for the
    // pruning rule to find)
    val dimPath = java.nio.file.Files.createTempDirectory("dpp").toString + "/dim"
    langs.toSeq.toDF("lang")
      .withColumn("keep", when(col("lang") === langs.head, 1L).otherwise(0L))
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.filter(col("keep") === 1L), "lang")
    val scan = nodes(joined.queryExecution.executedPlan)
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.output.exists(_.name == "doc_id") => s
      }
      .getOrElse(fail("no fact parquet scan in plan"))
    assert(scan.partitionFilters.exists(e => e.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
      s"fact scan has no dynamic pruning filter: ${scan.partitionFilters}")
    assert(joined.count() ==
      docs.filter(col("lang") === langs.head).count())
  }

  test("TRAP pinned: union of co-bucketed tables plans aggregates with no exchange; readUnbucketed restores correctness") {
    assume(available, "driver testdata not present")
    import spark.implicits._
    // two tables bucketed identically on k, holding byte-identical rows
    val rows = (0L until 200L).map(i => (i, s"payload_$i")).toDF("k", "v")
    Bucketed.writeBucketed(rows, "buntrap_a", "k", 4)
    Bucketed.writeBucketed(rows, "buntrap_b", "k", 4)
    val union = spark.table("buntrap_a").unionByName(spark.table("buntrap_b"))
    // the trap, pinned so a Spark upgrade that FIXES it fails here and
    // lets us drop the workaround: the union's dedup aggregate plans
    // with NO exchange (each child scan reports HashPartitioning(k, 4)
    // and the planner takes the clustering as satisfied, but UnionExec
    // CONCATENATES the children's bucket partitions), so equal rows
    // from the two tables never meet and a full-row distinct keeps
    // every cross-table duplicate
    val trapped = union.dropDuplicates()
    val exchanges = planNodes(trapped.queryExecution.executedPlan)
      .collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      "Spark now plans an exchange here - the concatenated-partitions " +
        "union trap is fixed upstream; readUnbucketed and its call " +
        "sites (LshIndex.mergeStage) can drop the workaround")
    assert(trapped.count() == 400L,
      "cross-table duplicates survived-the-dedup count changed: " +
        "re-examine the union partitioning behavior")
    // the documented workaround: read one side without bucket metadata
    // (UnknownPartitioning) and the planner inserts the real exchange
    val fixed = spark.table("buntrap_a")
      .unionByName(Bucketed.readUnbucketed(spark, "buntrap_b"))
      .dropDuplicates()
    assert(fixed.count() == 200L)
  }
}
