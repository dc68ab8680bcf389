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
