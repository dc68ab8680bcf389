package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

import scala.jdk.CollectionConverters._

class RetrievalSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      rows.map { case (id, t) => Row(id, t) }.asJava,
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))))

  private def ranks(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).toSeq

  test("higher tf ranks higher at equal length") {
    val docs = docsDf(Seq(
      (1L, "spark pad pad pad pad pad pad pad"),
      (2L, "spark spark pad pad pad pad pad pad"),
      (3L, "spark spark spark pad pad pad pad pad"),
      (4L, "none of these words pad pad pad pad")))
    assert(ranks(Retrieval.bm25TopK(docs, Seq("spark"), 10)) == Seq(3L, 2L, 1L))
  }

  test("length normalization: same tf, longer doc scores lower") {
    val docs = docsDf(Seq(
      (1L, "spark spark short doc"),
      (2L, "spark spark " + Seq.fill(40)("pad").mkString(" ")),
      (3L, "unrelated filler text here okay")))
    assert(ranks(Retrieval.bm25TopK(docs, Seq("spark"), 10)) == Seq(1L, 2L))
  }

  test("idf: a rare term outweighs a common term at equal tf and dl") {
    // 'rare' in 1 doc, 'common' in all 4; probe docs have identical dl
    val docs = docsDf(Seq(
      (1L, "rare pad pad pad"),
      (2L, "common pad pad pad"),
      (3L, "common filler pad pad"),
      (4L, "common words pad pad")))
    val out = Retrieval.bm25TopK(docs, Seq("rare", "common"), 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_pm")).toMap
    assert(out(1L) > out(2L),
      s"rare-term doc should outscore common-term doc: $out")
  }

  test("multi-term: matching more query terms accumulates score; ties break on doc_id") {
    val docs = docsDf(Seq(
      (5L, "spark stream pad pad"),
      (2L, "spark pad pad pad"),
      (9L, "spark pad pad pad"), // exact tie with doc 2
      (7L, "other words here pad")))
    val out = Retrieval.bm25TopK(docs, Seq("spark", "stream"), 10)
    val rows = out.collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(5L, 2L, 9L))
    assert(rows.head.getAs[Long]("n_terms") == 2L)
    assert(rows(1).getAs[Long]("score_pm") == rows(2).getAs[Long]("score_pm"))
  }

  test("k bounds the result and ranks are 1..k") {
    val docs = docsDf((1L to 20L).map(i =>
      i -> ("spark " + Seq.fill(i.toInt)("pad").mkString(" "))))
    val out = Retrieval.bm25TopK(docs, Seq("spark"), 5).collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 5L))
    // shortest docs win at equal tf
    assert(ranks(Retrieval.bm25TopK(docs, Seq("spark"), 5)) ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("plan: distributed top-k (TakeOrderedAndProject), no global sort before it") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists,
      "driver testdata not present")
    val docs = graft.Tables.documents(spark, sfDir)
    val plan = Retrieval.bm25TopK(docs).queryExecution.executedPlan
    val nodes = planNodes(plan)
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      s"expected TakeOrderedAndProject in:\n$plan")
  }
}
