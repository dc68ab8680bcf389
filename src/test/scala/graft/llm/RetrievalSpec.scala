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

  test("semanticTopK: a doc made of exactly the query tokens scores cosine 1 at rank 1") {
    val docs = docsDf(Seq(
      (1L, "spark vector stream"),
      (2L, "spark vector stream unrelated padding words everywhere"),
      (3L, "entirely different content here")))
    val got = Retrieval.semanticTopK(docs).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(got.head.getAs[Long]("doc_id") == 1L)
    assert(math.abs(got.head.getAs[Double]("score") - 1.0) < 1e-9)
    // partial token overlap still scores above disjoint content
    assert(got(1).getAs[Long]("doc_id") == 2L)
  }

  test("hybridTopK: RRF puts the doc present in both pools first, micro-score exact") {
    // doc 1 is strong in BOTH pools (exact query text); doc 2 is
    // lexically present but semantically diluted; doc 3 in neither
    val docs = docsDf(Seq(
      (1L, "spark vector stream"),
      (2L, "spark spark spark spark pad pad"),
      (3L, "nothing relevant at all here")))
    val got = Retrieval.hybridTopK(docs).collect().sortBy(_.getAs[Long]("rank"))
    assert(got.head.getAs[Long]("doc_id") == 1L)
    // RRF micro-score must equal the hand formula from the two ranks
    got.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
      val sem = Option(r.getAs[java.lang.Long]("sem_rank")).map(_.toLong)
      val expect = lex.map(x => 1000000L / (60L + x)).getOrElse(0L) +
        sem.map(x => 1000000L / (60L + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_micro") == expect)
    }
  }

  test("hybridTopK: pool-only docs carry a null rank on the missing side") {
    val docs = docsDf(Seq(
      (1L, "spark vector stream"),
      // lexically strong (all three terms, high tf) — also semantically
      // related; and one doc that shares NO query token: absent from the
      // lexical pool entirely, semantic rank only
      (2L, "spark spark vector vector stream stream"),
      (3L, "alpha beta gamma delta")))
    val rows = Retrieval.hybridTopK(docs).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId.contains(3L), "semantic-only doc should still fuse in")
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("lex_rank")))
    assert(!byId(3L).isNullAt(byId(3L).fieldIndex("sem_rank")))
  }

  test("phraseSearch: exact sequence only, counted per occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c x a b c"),  // two full matches
      (2L, "a b x c"),        // tokens present, sequence broken
      (3L, "c b a"),          // reversed
      (4L, "x a b c"))        // one match mid-doc
      .toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "a b c").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_matches")).toMap
    assert(got == Map(1L -> 2L, 4L -> 1L))
  }

  test("phraseSearch: repeated phrase token needs BOTH offsets matched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a"),   // anchors 0 and 1 complete "a a"
      (2L, "a b a"))   // no adjacent pair
      .toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "a a").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_matches")).toMap
    assert(got == Map(1L -> 2L))
  }
}
