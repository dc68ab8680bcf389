package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Pins every [[SqlSurface.sqlTexts]] entry to its registered
  * DataFrame twin ROW-FOR-ROW (multiset equality via exceptAll both
  * ways) — the §3.3 analyst-parity guarantee: SQL typed at a view and
  * the library API can never answer differently. */
class SqlSurfaceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def available = new java.io.File(sfDir).isDirectory

  test("every SQL text equals its DataFrame twin (multiset, schema names)") {
    assume(available, "driver testdata not present")
    graft.functions.GraftExtensions.register(spark)
    SqlSurface.registerViews(spark, sfDir)
    SqlSurface.sqlTexts.keys.toSeq.sorted.foreach { name =>
      val sqlDf = SqlSurface.run(spark, name)
      val apiDf = SparkEntry.queries(name)(spark, sfDir)
      assert(sqlDf.columns.toSeq == apiDf.columns.toSeq,
        s"$name: column names diverge " +
          s"(sql=${sqlDf.columns.mkString(",")} api=${apiDf.columns.mkString(",")})")
      // multiset equality, column order normalized by name
      val cols = apiDf.columns.sorted.map(org.apache.spark.sql.functions.col)
      val extra = sqlDf.select(cols: _*).exceptAll(apiDf.select(cols: _*)).count()
      val missing = apiDf.select(cols: _*).exceptAll(sqlDf.select(cols: _*)).count()
      assert(extra == 0 && missing == 0,
        s"$name: sql text diverges from DataFrame form " +
          s"(+$extra rows / -$missing rows)")
      assert(apiDf.count() > 0, s"$name: empty result proves nothing")
    }
  }

  test("SQL text gets the same scan pushdown as the DataFrame twin (q1)") {
    assume(available, "driver testdata not present")
    // the SqlSurface claim that both forms lower to the same Catalyst
    // plans, checked at the physical level: the parsed TEXT must push
    // its date filter into the parquet scan and prune to the 7 needed
    // columns, exactly like PlanAuditSpec asserts for the API form
    SqlSurface.registerViews(spark, sfDir)
    val scans = planNodes(
      SqlSurface.run(spark, "q1_agg").queryExecution.executedPlan)
      .collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    assert(scans.nonEmpty, "no parquet scan under the SQL text plan")
    val scan = scans.head
    assert(scan.metadata.getOrElse("PushedFilters", "")
      .contains("LessThanOrEqual(l_shipdate"),
      s"text form lost the scan pushdown: ${scan.metadata.get("PushedFilters")}")
    assert(scan.requiredSchema.length <= 7,
      s"text form reads ${scan.requiredSchema.length} columns of 16")
  }

  test("the full-SQL trend pipeline plans the NATIVE expressions, no UDFs") {
    assume(available, "driver testdata not present")
    // the round-13 pure-SQL trend_rows text must parse to the same
    // codegen'd native expressions the DataFrame pipeline plans —
    // graft_sentiment / graft_clean_tweet / graft_extract_hashtags /
    // graft_country resolving through the session extension, never a
    // ScalaUDF fallback
    graft.functions.GraftExtensions.register(spark)
    SqlSurface.registerViews(spark, sfDir)
    val plan = SqlSurface.run(spark, "trend_rows")
      .queryExecution.optimizedPlan
    val exprs = scala.collection.mutable.Set[String]()
    plan.foreach(_.expressions.foreach(_.foreach(e =>
      exprs += e.getClass.getSimpleName)))
    Seq("SentimentScoreExpression", "CleanTweetTextExpression",
      "ExtractHashtagsExpression", "CountryExpression").foreach { n =>
      assert(exprs.contains(n), s"native $n missing from the SQL-text plan")
    }
    assert(!exprs.contains("ScalaUDF"), "SQL text fell back to a UDF")
  }

  test("the text surface covers the dashboard set and the TPC-H core") {
    val names = SqlSurface.sqlTexts.keySet
    Seq("topn_trends", "hashtag_timeseries", "sentiment_distribution",
      "counts_by_country", "q1_agg", "q3_join", "q6_forecast")
      .foreach(n => assert(names.contains(n), s"$n missing from SQL surface"))
    assert(names.size >= 15, s"analyst surface shrank to ${names.size} texts")
    // every text names a registered query — the twin must exist
    names.foreach(n => assert(SparkEntry.queries.contains(n),
      s"$n has no DataFrame twin in the registry"))
  }
}
